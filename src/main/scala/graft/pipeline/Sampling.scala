package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Hashing._

/** Corpus sampling / mixing / packing operators for training-data
  * pipelines. All are DETERMINISTIC: membership derives from a
  * document-id hash, never from `rand()` — so runs are reproducible,
  * resumable jobs select identical subsets, and the DuckDB oracle can
  * gate every operator (same md5-derived uniform on both engines).
  * All are single-pass, shuffle-free scans except packing (one window
  * per packing stream).
  */
object Sampling {

  /** Uniform-in-[0,1) from the 60-bit md5 of the id: engine-portable
    * (exact integer → IEEE double division, bit-identical anywhere).
    * A `salt` decorrelates independent sampling decisions over the
    * same corpus (sampling vs splitting vs sharding).
    */
  def hashUniform(id: Column, salt: String = ""): Column =
    md5Hash60(concat(id.cast("string"), lit(salt))) /
      lit(1152921504606846976.0) // 2^60

  /** Per-stratum deterministic Bernoulli sampling — corpus mixing by
    * source/language weight (the "sample the web crawl at 10%, books
    * at 100%" step). `rates` maps stratum value → keep probability;
    * strata absent from the map use `defaultRate`. One codegen'd
    * filter, no shuffle, no state; at 100 TB this is a scan that
    * prunes to the output columns.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       defaultRate: Double,
                       stratumCol: String = "lang",
                       idCol: String = "doc_id",
                       salt: String = "strat"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.where(hashUniform(col(idCol), salt) < rate)
  }

  /** Deterministic train/validation/test assignment by hash range:
    * `splits` is (name, cumulative upper bound) ascending, e.g.
    * [("train", .9), ("val", .95), ("test", 1.0)]. Documents never
    * migrate between splits when the corpus grows — membership depends
    * only on the id hash, the property that keeps eval sets
    * uncontaminated across dataset versions.
    */
  def hashSplit(docs: DataFrame, splits: Seq[(String, Double)],
                idCol: String = "doc_id",
                salt: String = "split"): DataFrame = {
    val u = hashUniform(col(idCol), salt)
    val assigned = splits.init.foldRight(lit(splits.last._1): Column) {
      case ((name, hi), acc) => when(u < hi, lit(name)).otherwise(acc)
    }
    docs.withColumn("split", assigned)
  }

  /** Leakage-safe split: a plain hash split can put two NEAR-DUPLICATE
    * documents on opposite sides of the train/eval boundary — the eval
    * set then scores memorization. Here every near-dup cluster (from
    * the LSH pair graph, [[Dedup.connectedComponents]]) hashes on its
    * canonical representative, so the whole cluster lands in one split
    * atomically; documents absent from the pair graph hash on their own
    * id exactly like [[hashSplit]]. The component frame is pair-graph-
    * sized (tiny next to the corpus) and broadcasts.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       idCol: String = "doc_id",
                       salt: String = "split"): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("comp"))
    val keyed = docs.join(broadcast(comp), Seq(idCol), "left")
      .withColumn("_split_key", coalesce(col("comp"), col(idCol)))
    hashSplit(keyed, splits, "_split_key", salt)
      .drop("_split_key", "comp")
  }

  /** Exact-count-per-stratum sampling: the `n` documents with the
    * smallest id-hash per stratum — "exactly 10k docs per language",
    * deterministic and stable (a doc enters/leaves the sample only if
    * corpus membership near the hash threshold changes). One window
    * per stratum; for strata too large for one task, pre-filter with
    * [[stratifiedSample]] at a rate that overshoots `n` slightly, then
    * rank the survivors.
    */
  def topNPerStratum(docs: DataFrame, n: Int,
                     stratumCol: String = "lang",
                     idCol: String = "doc_id",
                     salt: String = "topn"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashUniform(col(idCol), salt), col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n).drop("_rn")
  }

  /** Temperature-weighted mixture sampling (τ = 0.5): per-stratum
    * quotas proportional to √n_s — the Pile/ROOTS-style "flatten the
    * source distribution" mix that up-weights small sources without
    * letting the biggest source dominate. Engine-deterministic by
    * construction: weight_s = floor(sqrt(n_s)) (IEEE sqrt is
    * correctly rounded, floor of it is exact on any engine — this is
    * why τ is 0.5 and not an arbitrary libm `pow` exponent),
    * quota_s = halfUp(nTarget·w_s / Σw) in exact integer arithmetic
    * (capped at the stratum size — the sample undershoots nTarget
    * rather than silently re-weighting), and membership is the same
    * deterministic id-hash rank as [[topNPerStratum]] — no rand()
    * anywhere.
    *
    * The per-stratum rank window serializes each stratum at selection
    * time; for corpus-scale strata use the packGreedy sharding trick
    * (rank within deterministic shards, quota split across shards) —
    * the quota math is unchanged.
    */
  def temperatureMix(docs: DataFrame, nTarget: Long,
                     stratumCol: String = "lang",
                     idCol: String = "doc_id",
                     salt: String = "mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weights = docs.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
    val tot = weights.agg(sum(col("w")).as("tot"))
    // halfUp(a / b) for non-negative integers, in DECIMAL: the
    // (a − pmod) difference is an exact multiple of b, and decimal
    // arithmetic keeps the quotient exact at ANY magnitude — a long
    // `/` promotes to double and silently loses ulps past 2^53
    // (same rule as Decimation.reAggregateExact's intDiv)
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val a = dec38(lit(nTarget) * col("w") * 2 + col("tot"))
    val b = dec38(col("tot") * 2)
    // a quota larger than the stratum is capped at the stratum size:
    // the sample then undershoots nTarget rather than silently
    // re-weighting (redistribution would need a second pass over the
    // quota table; callers that need exact totals can rerun with the
    // undershoot added to nTarget)
    val quotas = weights.crossJoin(broadcast(tot))
      .withColumn("quota",
        least(((a - pmod(a, b)) / b).cast("long"), col("n_docs")))
      .select(col(stratumCol), col("quota"))
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashUniform(col(idCol), salt), col(idCol))
    docs.select(col(idCol), col(stratumCol))
      .withColumn("_rn", row_number().over(w))
      .join(broadcast(quotas), Seq(stratumCol))
      .where(col("_rn") <= col("quota"))
      .select(col(idCol), col(stratumCol))
  }

  /** Greedy sequence packing: concatenate each stream's documents in
    * id order and cut into fixed token-budget bins — the
    * "pack short documents into full training sequences" step. A
    * document goes to bin floor(exclusive-cumulative-tokens / budget)
    * of its stream (streaming concat-then-chunk semantics: a document
    * may straddle its bin boundary; the trainer's loader splits it).
    *
    * Packing is inherently sequential per stream, so the stream is the
    * parallelism unit: `numShards` deterministic shards per stratum
    * keep every window partition bounded at corpus scale (the same
    * skew treatment as decimation's chunked path — never one window
    * over a whole language).
    */
  def packGreedy(docs: DataFrame, budgetTokens: Long, numShards: Int = 4,
                 stratumCol: String = "lang", idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTokens = size(Dedup.tokens(textCol)).cast("long")
    val shard = pmod(md5Hash60(col(idCol).cast("string")), lit(numShards))
      .cast("int")
    val w = Window.partitionBy(stratumCol, "shard").orderBy(idCol)
    docs
      .select(col(idCol), col(stratumCol), shard.as("shard"),
        nTokens.as("n_tokens"))
      .withColumn("cum_excl",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", (col("cum_excl") / budgetTokens).cast("long"))
      .drop("cum_excl")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much its unigram distribution looks like a small
    * target corpus. Per-token log-ratio with add-one smoothing over
    * the joint vocabulary V:
    *
    *   w(tok)  = ln((c_t(tok)+1)/(C_t+|V|)) − ln((c_r(tok)+1)/(C_r+|V|))
    *   logw(d) = Σ_{occurrences tok ∈ d} w(tok)
    *
    * Scale shape: both count tables are vocabulary-sized (Heaps' law,
    * ≪ corpus), built in one map-side-combinable pass each; the
    * per-token log-ratio is computed ONCE per vocab entry, and the
    * corpus-side join is occurrences⋈vocab (broadcast-or-hash, AQE's
    * choice) followed by one per-doc regroup — the same plan family as
    * [[TextAnalysis.unigramScore]].
    *
    * Determinism: every ln() input is a ratio of exact integers
    * (identical doubles on any engine), the per-token terms route
    * through DECIMAL(38,12) before the per-doc sum, so aggregation
    * order cannot flip a bit.
    *
    * Returns one row per raw doc: (doc_id, n_tokens, logw_exact
    * DECIMAL — for downstream selection, exact ordering — and logw
    * rounded for reporting).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame,
                  textCol: String = "text"): DataFrame = {
    val occ = (d: DataFrame) =>
      d.select(col("doc_id"), explode(Dedup.tokens(textCol)).as("tok"))
    val rawOcc = occ(raw)
    val cr = rawOcc.groupBy("tok").agg(count(lit(1)).as("c_r"))
    val ct = occ(target).groupBy("tok").agg(count(lit(1)).as("c_t"))
    // joint vocabulary with smoothing totals: full outer over the two
    // vocab-sized tables, then corpus-level scalars via one tiny agg
    val vocab = cr.join(ct, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("c_r"), lit(0L)).as("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
    val totals = vocab.agg(sum(col("c_r")).as("tot_r"),
      sum(col("c_t")).as("tot_t"), count(lit(1)).as("v"))
    val w = log((col("c_t") + lit(1.0)) / (col("tot_t") + col("v"))) -
      log((col("c_r") + lit(1.0)) / (col("tot_r") + col("v")))
    val scored = vocab.crossJoin(broadcast(totals))
      .select(col("tok"), w.cast("decimal(38,12)").as("w"))
    // broadcast the VOCAB-sized score table explicitly: left to its
    // own estimates the planner was observed broadcasting the corpus
    // occurrence side at small SF — a shape that cannot survive scale
    rawOcc.join(broadcast(scored), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("logw_exact"))
      .withColumn("logw",
        col("logw_exact").cast("decimal(38,6)").cast("double"))
  }

  /** DSIR selection via Gumbel-top-k (Vieira 2014): taking the `n`
    * largest `logw + Gumbel(0,1)` keys IS sampling n documents without
    * replacement with probability ∝ exp(logw) — the exact resampling
    * step of DSIR, derandomized: the Gumbel noise comes from the
    * engine-portable md5 uniform (`hashUniform`), so the "random"
    * sample is a pure function of (corpus, target, salt) and two runs
    * — or two engines — select identical documents. One corpus-sized
    * TakeOrdered on top of [[dsirWeights]]; no shuffle beyond it.
    */
  def dsirResample(raw: DataFrame, target: DataFrame, n: Int,
                   textCol: String = "text",
                   salt: String = "dsir"): DataFrame = {
    // clamping u away from 0/1 keeps -ln(-ln(u)) finite (u is a 60-bit
    // grid point in [0,1), so only u=0 is actually reachable)
    val u = greatest(hashUniform(col("doc_id"), salt), lit(1e-18))
    val gumbel = -log(-log(u))
    // the addition narrows to DECIMAL(30,12): a width-38 + width-38
    // add would widen past DuckDB's 38-digit ceiling (where it silently
    // degrades to DOUBLE and parity dies); |logw| ≪ 10^18 by construction
    dsirWeights(raw, target, textCol)
      .withColumn("key_exact",
        col("logw_exact").cast("decimal(30,12)") +
          gumbel.cast("decimal(30,12)"))
      .orderBy(col("key_exact").desc, col("doc_id").asc)
      .limit(n)
      .select(col("doc_id"), col("n_tokens"), col("logw"),
        col("key_exact").cast("decimal(38,6)").cast("double").as("key"))
  }

  /** Perplexity-bucketed sampling — the CCNet (Wenzek et al. 2020,
    * arXiv:1911.00359) head/middle/tail recipe: score every document
    * with a corpus language model, cut the score distribution into
    * `rates.length` quantile buckets, and keep each bucket at its own
    * rate (typically favoring the fluent head). The LM proxy is
    * [[TextAnalysis.unigramScore]]'s `avg_token_count` (higher = more
    * fluent/common tokens ≈ lower perplexity; exact-integer ratio, so
    * engine-deterministic — no libm log whose last bit differs across
    * engines).
    *
    * Scale shape: NO global sort/ntile — bucket boundaries are B−1
    * percentile thresholds (one tiny agg row, cross-joined broadcast),
    * bucketing is a codegen'd comparison chain, and the keep decision
    * is the salted-hash Bernoulli used by every sampler here (pure
    * function of doc_id — reproducible across runs, engines, and
    * cluster sizes). At 100 TB swap the exact `percentile` for
    * `percentile_approx` exactly as [[TextAnalysis.corpusStats]] does;
    * the gate keeps the exact form.
    *
    * `rates(i)` is the keep probability of bucket i+1 (buckets ordered
    * by ascending score: bucket 1 = rarest-token tail ... bucket B =
    * most-fluent head).
    *
    * Output: kept documents as (doc_id, n_tokens, avg_token_count,
    * bucket).
    */
  def qualityBucketSample(docs: DataFrame, rates: Seq[Double],
                          vocabSize: Int = 1000,
                          textCol: String = "text",
                          salt: String = "qb"): DataFrame = {
    require(rates.nonEmpty, "need at least one bucket rate")
    val nB = rates.length
    val scored = TextAnalysis.unigramScore(docs, vocabSize, textCol)
    val thr = scored.agg(
      TextAnalysis.r6(expr(
        s"percentile(avg_token_count, ${1.0 / nB})")).as("thr1"),
      ((2 until nB).map(i => TextAnalysis.r6(expr(
        s"percentile(avg_token_count, ${i.toDouble / nB})"))
        .as(s"thr$i"))): _*)
    val bucket = (1 until nB).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col("avg_token_count") > col(s"thr$i"), 1).otherwise(0)
    }
    val rate = rates.zipWithIndex.foldLeft(lit(rates.head)) {
      case (acc, (r, i)) => when(col("bucket") === i + 1, lit(r)).otherwise(acc)
    }
    scored.crossJoin(broadcast(thr))
      .withColumn("bucket", bucket)
      .where(hashUniform(col("doc_id"), salt) < rate)
      .select(col("doc_id"), col("n_tokens"), col("avg_token_count"),
        col("bucket"))
  }

  /** Deterministic source interleaving: assign every document a global
    * training-order index that round-robins across sources — the data-
    * ordering step between mixing and sharding (consecutive training
    * batches see every source instead of one source's contiguous run).
    *
    * Within a source, documents are ordered by the salted id-hash
    * (a reproducible shuffle — same property as every sampler here);
    * across sources, position = rank_in_source · n_sources +
    * source_idx (sources indexed by name order). Sources of unequal
    * size simply exhaust: the global order stays strictly increasing
    * and gap-tolerant, which is all a downstream `ORDER BY train_ord`
    * shard writer needs.
    *
    * Scale shape: one source-keyed shuffle for the within-source
    * row_number; source count is metadata-sized (collected once).
    * At 100 TB the per-source window is the cost of one sort of that
    * source's ids — the same bound as any shard-writing sort — and no
    * global single-partition order is ever materialized.
    */
  def interleave(docs: DataFrame, sourceCol: String = "source",
                 idCol: String = "doc_id",
                 salt: String = "ilv",
                 extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // source universe: metadata-sized (sources, not documents), ranked
    // by name with a window over the DISTINCT frame — the
    // single-partition sort touches |sources| rows, never the corpus,
    // and the whole operator stays lazy (no driver collect)
    val srcIdx = docs.select(col(sourceCol)).distinct()
      .select(col(sourceCol),
        (row_number().over(Window.orderBy(col(sourceCol))) - 1)
          .cast("long").as("src_idx"),
        count(lit(1)).over(Window.partitionBy()).as("n_sources"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(hashUniform(col(idCol), salt), col(idCol))
    docs.select((col(idCol) +: col(sourceCol) +: extraCols.map(col)): _*)
      .join(broadcast(srcIdx), Seq(sourceCol))
      .withColumn("rank_in_source",
        (row_number().over(w) - 1).cast("long"))
      .withColumn("train_ord",
        col("rank_in_source") * col("n_sources") + col("src_idx"))
      .select((col(idCol) +: col(sourceCol) +: col("rank_in_source") +:
        col("train_ord") +: extraCols.map(col)): _*)
  }

  /** Curriculum ordering: a GLOBAL 1-based training position over the
    * whole corpus by (quality_score desc, doc_id asc) — easy-to-hard
    * data ordering — computed WITHOUT ever materializing a
    * single-partition sort (the `row_number() OVER (ORDER BY …)`
    * anti-pattern that serializes the corpus through one task).
    *
    * The scale-safe global-ordinal recipe: range-repartition on the
    * full (strict) sort key so partitions are disjoint key ranges in
    * the total order, rank within each partition with a
    * partition-local window, then add the cumulative count of the
    * preceding partitions. The offsets are one metadata-sized driver
    * collect (≤ `parts` rows); position values are a pure function of
    * the total order, independent of where the sampled range
    * boundaries happen to fall.
    *
    * Scale shape at 100 TB: one range shuffle + one partition-local
    * sort — the same cost bound as writing sorted shards — plus a
    * count job over the checkpointed shuffle output. Skewed score
    * distributions are handled by the range partitioner's sampling
    * (doc_id in the key makes every key unique, so no single key can
    * straggle a partition).
    */
  /** Sequential shard packing: walk the corpus in [[interleave]]'s
    * deterministic training order and assign shard
    * `⌊tokens-before-this-doc / budget⌋` — each shard holds
    * consecutive training docs totalling ~`budgetTokens` (overflow
    * bounded by one document per boundary; a doc belongs to the shard
    * where it STARTS). This is the prefix-sum formulation of shard
    * filling — the strict greedy reset-per-shard variant is
    * inherently sequential state, while the prefix-sum form
    * distributes, and the two differ only when a single document
    * spans a boundary.
    *
    * The global running sum is the one scan shape Catalyst has no
    * operator for (a global window = single-partition sort), so this
    * uses the [[globalOrdinal]] recipe generalized to sums: range-
    * partition by train_ord, collect per-partition token SUBTOTALS
    * (metadata-sized), then one `mapPartitions` pass that seeds each
    * partition's running sum with its predecessors' total — the
    * documented per-partition-imperative last resort, justified here
    * because the scan is genuinely stateful. Cost at 100 TB: one
    * range shuffle + one in-partition pass, same bound as writing
    * the shards themselves.
    */
  def packSequential(docs: DataFrame, budgetTokens: Long,
                     parts: Int = 0, textCol: String = "text",
                     sourceCol: String = "source",
                     idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withTok = docs.withColumn("n_tokens",
      size(Dedup.tokens(textCol)).cast("long"))
    packByOrder(interleave(withTok, sourceCol, idCol,
        extraCols = Seq("n_tokens")),
        "train_ord", "n_tokens", budgetTokens, p)
      .select(col(idCol), col(sourceCol), col("train_ord"),
        col("n_tokens"), col("shard"))
  }

  /** Fixed-length TRAINING-SEQUENCE packing — the op that turns a
    * curated corpus into the `seqLen`-token rows a trainer consumes
    * (GPT-style "concat everything, split every L tokens"): documents
    * are laid out in ascending `doc_id` order, each doc's token ids
    * ([[TextAnalysis.encodeIds]] over a size-`vocabSize` vocabulary,
    * OOV = −1) followed by ONE end-of-document sentinel (−2), and the
    * resulting global token stream is cut into consecutive sequences
    * of exactly `seqLen` ids (the final partial sequence is kept
    * short). Output per sequence: `seq_id`, `n_tokens` (= seqLen
    * except the last), `n_docs` (distinct documents contributing —
    * the boundary-crossing diagnostic), and the `,`-joined ids (the
    * cross-engine array contract).
    *
    * Scale shape: the doc-level global offset is [[packByOrder]]'s
    * distributed prefix sum (metadata-sized per-partition subtotals,
    * one seeded in-partition pass); token rows then get their global
    * position with pure arithmetic (offset + pos — no token-level
    * window), and the only token-level shuffle is the final
    * groupBy(seq_id), whose groups are bounded at `seqLen` rows by
    * construction — no skew possible. The assembled sequence is
    * sort_array over ≤ seqLen in-group elements, not a global sort.
    */
  def packSequences(docs: DataFrame, vocabSize: Int, seqLen: Long,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(seqLen >= 1, "packSequences needs seqLen >= 1")
    val ids = TextAnalysis.encodeIds(docs,
      TextAnalysis.vocabulary(docs, vocabSize, textCol), textCol)
    val counts = docs.select(col(idCol).as("doc_id"),
      (size(Dedup.tokens(textCol)).cast("long") + 1L).as("n_eff"))
    val off = packByOrder(counts, "doc_id", "n_eff", budgetTokens = seqLen)
      .select(col("doc_id"), col("n_eff"), col("cum_before"))
    val toksG = ids.join(off, Seq("doc_id"))
      .select(col("doc_id"), (col("cum_before") + col("pos")).as("gpos"),
        col("token_id"))
    val eos = off.select(col("doc_id"),
      (col("cum_before") + col("n_eff") - 1L).as("gpos"),
      lit(-2).cast("int").as("token_id"))
    toksG.unionByName(eos)
      .select(col("doc_id"), expr(s"gpos div ${seqLen}L").as("seq_id"),
        pmod(col("gpos"), lit(seqLen)).as("seq_pos"), col("token_id"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"),
        array_join(transform(
          array_sort(collect_list(struct(col("seq_pos"), col("token_id")))),
          x => x.getField("token_id").cast("string")), ",").as("ids"))
  }

  /** The distributed prefix-sum packing kernel: given ANY frame with
    * a strict global order column and a token-count column, assign
    * `shard = tokens-before div budget` — see [[packSequential]] for
    * the recipe and its cost bound. Returns the input columns plus
    * `cum_before` and `shard`.
    */
  def packByOrder(ordered: DataFrame, ordCol: String, tokCol: String,
                  budgetTokens: Long, parts: Int = 0): DataFrame = {
    val spark = ordered.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = ordered
      .repartitionByRange(p, col(ordCol).asc)
      .sortWithinPartitions(col(ordCol).asc)
      .localCheckpoint(false)
    val subtotals = ranged
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(col(tokCol)).as("toks")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((a, i) =>
      a + subtotals.getOrElse(i, 0L))
    val bcOff = spark.sparkContext.broadcast(offsets)
    val tokIdx = ranged.schema.fieldIndex(tokCol)
    val outSchema = ranged.schema
      .add(org.apache.spark.sql.types.StructField("cum_before",
        org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var run = bcOff.value(pid)
        it.map { r =>
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
          run += r.getLong(tokIdx)
          out
        }
      }, outSchema)
      .withColumn("shard", expr(s"cum_before div ${budgetTokens}L"))
  }

  def curriculumOrder(docs: DataFrame, parts: Int = 0): DataFrame =
    globalOrdinal(TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score")), parts)

  /** The scale-safe global-ordinal kernel over a (doc_id,
    * quality_score) frame — see [[curriculumOrder]]. Public so scale
    * probes (and callers with their own score) can drive it directly.
    */
  def globalOrdinal(scored: DataFrame, parts: Int = 0): DataFrame = {
    val spark = scored.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // One range shuffle + one in-partition sort, then
    // monotonically_increasing_id stamps (partition id << 33 |
    // in-partition ordinal) — the in-partition rank is ALREADY in the
    // id, so no second shuffle and no window pass is needed (a
    // Window.partitionBy(pid) here would re-shuffle the whole corpus
    // on pid: measured as an extra Exchange in the plan). The
    // checkpoint pins partitioning + order so the count job and the
    // output projection see identical ids.
    val ranged = scored
      .repartitionByRange(p, col("quality_score").desc, col("doc_id").asc)
      .sortWithinPartitions(col("quality_score").desc, col("doc_id").asc)
      .withColumn("mid", monotonically_increasing_id())
      .localCheckpoint(false)
    val pidCol = shiftright(col("mid"), 33)
    val idxCol = col("mid").bitwiseAND(lit((1L << 33) - 1))
    // per-partition sizes: metadata-sized (≤ parts rows collected)
    val counts = ranged.groupBy(pidCol.as("pid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((a, i) =>
      a + counts.getOrElse(i.toLong, 0L))
    import spark.implicits._
    val offs = (0 until p).map(i => (i.toLong, offsets(i)))
      .toDF("pid", "offset")
    // range partitions are disjoint key ranges in ascending partition-
    // index order, so offset(pid) + in-partition ordinal IS the global
    // rank — one broadcast join + projection, zero further shuffles.
    // Any extra input columns ride along (compositions would otherwise
    // pay a corpus-sized re-join to get them back)
    val original = scored.columns.toSeq
    ranged.select(original.map(col) :+ pidCol.as("pid") :+
        idxCol.as("idx"): _*)
      .join(broadcast(offs), Seq("pid"))
      .select(original.map(col) :+
        (col("offset") + col("idx") + lit(1L)).as("position"): _*)
  }
}
