package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval operators: BM25 scoring/top-k over the document
  * table. The retrieval shape a training-data pipeline needs for
  * targeted corpus search (find documents about X), contamination
  * audits (retrieve the training docs closest to an eval prompt), and
  * quality-biased selection.
  *
  * Scale shape: term statistics (df, total length) are one
  * map-side-combinable aggregation; only occurrences of the QUERY
  * terms (a few rows per document) survive past the first filter, so
  * the scoring join is query-sized, never corpus-sized, and the top-k
  * is a distributed TakeOrdered — no global sort, no corpus shuffle.
  *
  * Determinism: every input to the floating-point math (tf, df, N,
  * Σdl) is an exact integer; the per-term double expression is written
  * with one fixed evaluation order mirrored in the DuckDB oracle, and
  * per-document summation over terms routes through DECIMAL(38,12) so
  * aggregation order cannot flip a bit (see BASELINE.md decimal-sum
  * note). Identical documents therefore produce bit-identical scores,
  * and the (score desc, doc_id asc) tie-break is stable across
  * engines.
  */
object Retrieval {

  /** Okapi/Lucene BM25 parameters (standard defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Query bag for the driver gate — shared with the oracle SQL
    * generator. "dup" is rare in the synthetic corpus, so the idf
    * spread is non-trivial.
    */
  val GateQuery: Seq[String] = Seq("hash", "merge", "scan", "dup")

  private def toks(textCol: String): Column = Dedup.tokens(textCol)

  /** BM25 top-k: score every document against a bag of query terms,
    * return the `k` best by (score desc, doc_id asc).
    *
    * idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene BM25)
    * tfNorm  = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/Σdl))
    * score d = Σ_{t ∈ q} idf(t) · tfNorm(t, d)
    *
    * `dl·N/Σdl` replaces `dl/avgdl` so the ratio is (int·int)/int in
    * one fixed order. Documents matching no query term never enter the
    * candidate frame (retrieval semantics: unranked, not score-0).
    */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int,
               textCol: String = "text"): DataFrame = {
    // one corpus scan: per-doc length + per-(doc, query-term) tf
    val perDoc = docs.select(col("doc_id"), toks(textCol).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        filter(col("t"), x => x.isin(query: _*)).as("qtoks"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = perDoc.where(size(col("qtoks")) > 0)
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("tok"))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    // df per query term from the same candidate frame (a term absent
    // from every doc simply contributes no rows)
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + lit(K1) * (lit(1.0 - B) +
        lit(B) * col("dl").cast("double") * col("n_docs") / col("sum_dl")))
    val contrib = (idf * tfNorm).cast("decimal(38,12)")
    tf.join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(contrib).as("score_exact"),
        count(lit(1)).as("n_query_terms"))
      .orderBy(col("score_exact").desc, col("doc_id").asc)
      .limit(k)
      // 6dp via decimal rescale: exact HALF_UP in both engines (scores
      // are positive), no double-rounding ambiguity
      .select(col("doc_id"), col("n_query_terms"),
        col("score_exact").cast("decimal(38,6)").cast("double").as("score"))
  }

  /** Per-document top-k keywords by smoothed TF-IDF
    * (idf = ln((1+N)/(1+df)) + 1, the sklearn smoothing — never
    * negative, never divides by zero), the standard keyword-extraction
    * / doc-representation primitive.
    *
    * Scale shape: two doc-sized shuffles — tf on (doc_id, tok), then
    * the per-doc top-k window on doc_id — plus a vocabulary-sized df
    * table that is BROADCAST (never a corpus-side shuffle). At 100 TB
    * prune the df table to df ≥ 2 first (hapax tokens are noise and
    * dominate the vocabulary).
    *
    * Determinism: idf inputs are exact integers in one shared
    * parenthesization; the score is 6dp scale-rounded BEFORE ranking
    * so a half-ULP idf difference can never flip a rank between
    * engines; ties break on tok asc.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 5,
                textCol: String = "text"): DataFrame = {
    val sr6 = TextAnalysis.r6 _ // the one shared scaled-round sequence
    // tf feeds both the df aggregation and the scoring join — without
    // truncation the corpus explosion runs per branch (AQE exchange
    // reuse observed not collapsing identical agg subplans); lazily
    // localCheckpoint it, the pipeline_curate2 pattern (measured 3.1×
    // there for the same multi-branch shape)
    val tf = docs.select(col("doc_id"), explode(toks(textCol)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) +
      lit(1.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(broadcast(dfc), Seq("tok"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf"),
        sr6(col("tf") * idf).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"),
        col("score"))
  }

  /** Hybrid retrieval via reciprocal rank fusion: fuse the lexical
    * BM25 top-`n` with the semantic cosine top-`n` (embedding of
    * `probeVecId` as the query vector) by
    * `rrf(d) = Σ_lists 1/(kRrf + rank_d)` — the standard
    * score-calibration-free fusion (Cormack et al., SIGIR'09), the
    * retrieval shape a contamination audit or targeted corpus search
    * actually runs (exact-term match AND paraphrase match in one
    * ranked list).
    *
    * Scale shape: both candidate generators are the distributed part
    * (BM25's query-sized scoring join; the cosine scan — swap in
    * `Similarity.ivfSearch` at 100 TB, the fusion is rank-only so the
    * generator is pluggable). The fusion itself joins two k-sized
    * lists — driver-free but trivially small by construction, so the
    * single-partition rank windows here are on ≤n rows, never
    * corpus-sized.
    *
    * Determinism: fusion consumes only integer RANKS (each already
    * 6dp-tie-broken by doc_id inside its generator); 1/(k+r) is one
    * IEEE division per list and the sum is two terms in fixed order,
    * scale-rounded at the edge; final ties break on doc_id.
    */
  def hybridRrf(docs: DataFrame, embeds: DataFrame, query: Seq[String],
                probeVecId: Long, n: Int = 50, k: Int = 10,
                kRrf: Int = 60): DataFrame =
    hybridRrfWith(docs, query,
      Similarity.bruteForceTopK(
          embeds, embeds.where(col("vec_id") === probeVecId), n)
        .select(col("vec_id").as("doc_id"), col("rank").as("sem_rank")),
      n, k, kRrf)

  /** [[hybridRrf]] with a caller-supplied semantic candidate list
    * (`doc_id`, `sem_rank`) — the fusion is rank-only, so ANY
    * generator plugs in: brute force for exactness, [[Similarity
    * .ivfSearch]] for the 100 TB path, a persisted index for serving.
    */
  def hybridRrfWith(docs: DataFrame, query: Seq[String], sem: DataFrame,
                    n: Int = 50, k: Int = 10,
                    kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, query, n)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).as("lex_rank"))
    val contrib = (r: Column) =>
      when(r.isNotNull, lit(1.0) / (lit(kRrf) + r)).otherwise(lit(0.0))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).as("sem_rank"),
        TextAnalysis.r6(contrib(col("lex_rank")) + contrib(col("sem_rank")))
          .as("rrf"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .where(col("rank") <= k)
  }

  /** Inverted index: (token, df, postings) — sorted distinct doc-id
    * posting lists for every token with minDf ≤ df ≤ maxDf. The
    * retrieval-side artifact a corpus-search service builds once and
    * serves from.
    *
    * Scale shape: one (doc_id, token)-distinct aggregation, then one
    * token-keyed shuffle where the per-token payload is the posting
    * list itself. The df band is load-bearing at 100 TB: maxDf caps
    * the stop-word rows whose postings would otherwise be corpus-sized
    * single-key values (the classic inverted-index hot key) — serve
    * those from a separate df-only table if needed; minDf drops the
    * hapax tail that dominates the vocabulary. Within the band a
    * posting list is ≤ maxDf ids ≈ bounded, so no key can straggle.
    *
    * Postings are serialized `,`-joined (sorted ascending) — the
    * cross-engine array contract (BASELINE.md: never hash raw arrays).
    */
  def invertedIndex(docs: DataFrame, minDf: Long = 2L, maxDf: Long = 1000L,
                    textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), explode(toks(textCol)).as("token"))
      .groupBy("token")
      // collect_set = the posting set AND the df in ONE shuffle with
      // map-side partial aggregation (within-doc repeats never leave
      // their partition) — vs distinct-then-group, which ships every
      // (doc, token) pair through two exchanges
      .agg(sort_array(collect_set(col("doc_id"))).as("p"))
      .select(col("token"), size(col("p")).cast("long").as("df"), col("p"))
      .where(col("df").between(minDf, maxDf))
      .select(col("token"), col("df"),
        concat_ws(",", transform(col("p"), _.cast("string"))).as("postings"))
}
