package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Hashing._

/** Text-analysis operators for corpus curation: stopword-based
  * language ID, quality scoring, token statistics, and document
  * fingerprinting. Everything is per-row (embarrassingly parallel,
  * no shuffle) and built from codegen'd expressions — the shape that
  * survives a 100 TB scan.
  */
object TextAnalysis {

  /** Small, fixed stopword lists (top function words per language).
    * Shared with the oracle SQL generator — keep in sync by
    * construction.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is", "that", "for",
      "it", "on", "with", "as", "are", "this", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "den", "von", "mit", "auf", "für", "im", "sich"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "por", "con",
      "para", "no", "se", "del", "al", "como", "más"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "que", "pour",
      "dans", "qui", "sur", "pas", "au", "ce", "il", "du"))

  private def toks(textCol: String): Column = Dedup.tokens(textCol)

  /** 6dp rounding via multiply → scale-0 round → divide: the identical
    * IEEE operation sequence on Spark and DuckDB. `round(x, 6)` is NOT
    * engine-deterministic at 6dp ties (Spark goes through BigDecimal,
    * DuckDB through scaled doubles); this sequence is.
    */
  private[pipeline] def r6(c: Column): Column =
    round(c * lit(1e6)).cast("long").cast("double") / lit(1e6)

  private def hits(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isin(words.map(lit): _*)))

  /** Language ID: count stopword hits per language; winner = highest
    * count (ties broken by list order), 'und' (undetermined) when no
    * stopword matched — CJK and too-short texts land there.
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(textCol)
    val withHits = docs.select(
      col("doc_id") +: col("lang").as("lang_actual") +:
        Stopwords.map { case (l, ws) => hits(t, ws).as(s"hits_$l") }: _*)
    val best = Stopwords.map(_._1)
      .foldRight(lit("und")) { (l, acc) =>
        // foldRight so earlier languages win ties (>= later ones)
        when(col(s"hits_$l") > 0 &&
          Stopwords.map(_._1).filter(_ != l)
            .map(o => col(s"hits_$l") >= col(s"hits_$o")).reduce(_ && _),
          lit(l)).otherwise(acc)
      }
    withHits.withColumn("lang_detected", best)
      .withColumn("is_match", (col("lang_detected") === col("lang_actual")).cast("int"))
  }

  /** Language-ID confusion matrix — the measured-quality report for
    * [[languageId]]: per (actual, detected) pair the document count
    * and the 6dp share of the actual language's documents. The table
    * every pipeline should publish before trusting a heuristic
    * classifier to route a corpus; one partial-merge aggregate + a
    * tiny per-actual window over languages² rows.
    */
  def langIdConfusion(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    languageId(docs, textCol)
      .groupBy("lang_actual", "lang_detected")
      .agg(count(lit(1)).as("n"))
      .withColumn("share", r6(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("lang_actual"))
          .cast("double")))
  }

  /** Quality signals: length, token counts, average token length,
    * stopword ratio, digit/punctuation ratios, and a composite score.
    */
  /** The [[quality]] composite score as a reusable per-row Column —
    * ONE definition shared by the quality report and pipeline
    * compositions that only filter on the score: a consumer that
    * joins the full [[quality]] frame back onto the corpus pays a
    * corpus self-join for what is a pure projection of the row it
    * already holds.
    */
  def qualityScore(textCol: String = "text"): Column = {
    val t = toks(textCol)
    val nTok = size(t).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val nDigit = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[0-9]", ""))
    val nTok0 = greatest(nTok, lit(1.0))
    val nChars0 = greatest(nChars, lit(1.0))
    val stopHits = hits(t, Stopwords.toMap.apply("en")).cast("double")
    val stopRatio = stopHits / nTok0
    round(
      least(lit(1.0), stopRatio * 3) * 0.5 +
        when(nTok.between(20, 80), 0.3).otherwise(0.0) +
        when(nDigit / nChars0 < 0.2, 0.2).otherwise(0.0),
      6)
  }

  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(textCol)
    val nTok = size(t).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val nNonSpace = length(regexp_replace(col(textCol), "\\s+", "")).cast("double")
    val nDigit = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[0-9]", ""))
    val nPunct = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[.,;:!?'\"()\\[\\]{}-]", ""))
    // greatest(_, 1) guards the empty/whitespace-only document: under
    // Spark 4's default ANSI mode a 0/0 double division THROWS and one
    // empty doc would kill the whole scan; with the guard every ratio
    // is 0 for empty docs (and unchanged otherwise)
    val nTok0 = greatest(nTok, lit(1.0))
    val stopHits = hits(t, Stopwords.toMap.apply("en")).cast("double")
    val stopRatio = stopHits / nTok0
    docs.select(col("doc_id"),
      nChars.cast("long").as("n_chars"),
      size(t).as("n_tokens"),
      round(nNonSpace / nTok0, 6).as("avg_token_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      nDigit.cast("long").as("n_digits"),
      nPunct.cast("long").as("n_punct"),
      qualityScore(textCol).as("quality_score"))
  }

  /** Gopher quality rules (Rae et al. 2021, appendix A1.1) — the
    * named doc-level rule battery production corpora actually ship
    * with, as one shuffle-free codegen'd projection. Per document:
    * word count in [50, 100000], mean word length in [3, 10],
    * ≥ 80% of words contain an alphabetic character, ≥ 2 distinct
    * stopwords present, symbol-to-word ratio ('#'/ellipsis) ≤ 0.1;
    * `keep` = all rules pass.
    *
    * Determinism: every rule evaluates as an EXACT integer comparison
    * (3n ≤ Σlen ≤ 10n, 5·n_alpha ≥ 4n, 10·n_sym ≤ n) — no double
    * ratio ever decides a boolean, so engines cannot disagree at a
    * threshold tie; the reported ratios are 6dp scale-rounded at the
    * edge only. Scale shape: a pure per-row projection — no shuffle,
    * no state, embarrassingly parallel at 100 TB.
    */
  def gopherRules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(textCol)
    val n = size(t).cast("long")
    val sumLen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    val nAlpha = size(filter(t, x => x.rlike("[a-z]"))).cast("long")
    val nStop = size(filter(
      array(GopherStops.map(lit): _*), w => array_contains(t, w)))
      .cast("long")
    val nSym = ((length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))) +
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3)
      .cast("long")
    val n0 = greatest(n, lit(1L)).cast("double")
    docs.select(col("doc_id"),
      n.as("n_tokens"),
      r6(sumLen.cast("double") / n0).as("mean_token_len"),
      r6(nAlpha.cast("double") / n0).as("frac_alpha"),
      nStop.as("n_stop_distinct"),
      nSym.as("n_symbols"),
      (n >= 50L && n <= 100000L).cast("int").as("ok_words"),
      (sumLen >= n * 3L && sumLen <= n * 10L).cast("int").as("ok_mean_len"),
      (nAlpha * 5L >= n * 4L).cast("int").as("ok_alpha"),
      (nStop >= 2L).cast("int").as("ok_stop"),
      (nSym * 10L <= n).cast("int").as("ok_symbol"),
      (n >= 50L && n <= 100000L && sumLen >= n * 3L && sumLen <= n * 10L &&
        nAlpha * 5L >= n * 4L && nStop >= 2L && nSym * 10L <= n)
        .cast("int").as("keep"))
  }

  /** The Gopher stopword battery (rule: ≥2 distinct present). Shared
    * with the oracle generator — keep in sync by construction.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The C4 cleaning battery (Raffel et al. 2020 §2.2) next to
    * [[gopherRules]] — the OTHER named filter set every curation
    * pipeline cites. Per document: line statistics (a "line" is a
    * `\n` segment; a line is RETAINED when it ends in terminal
    * punctuation — . ! ? or a closing quote — and holds ≥ 5 words),
    * sentence count (terminal-punctuation occurrences), the lorem-
    * ipsum and curly-brace page flags, and the composite `keep` (≥ 3
    * sentences, no brace, no lorem ipsum, ≥ 1 retained line). Every
    * rule is an exact integer/boolean comparison — engines cannot
    * disagree at ties; one shuffle-free codegen'd projection.
    */
  def c4Rules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      l.rlike("""[.!?]["']?\s*$""") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= 5)
    val lower = org.apache.spark.sql.functions.lower(col(textCol))
    val nSent = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[.!?]", ""))).cast("long")
    val hasBrace = col(textCol).contains("{")
    val hasLorem = lower.contains("lorem ipsum")
    docs.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      nSent.as("n_sentences"),
      hasBrace.cast("int").as("has_brace"),
      hasLorem.cast("int").as("has_lorem"),
      (nSent >= 3L && !hasBrace && !hasLorem && size(kept) >= 1)
        .cast("int").as("keep"))
  }

  /** Tokenizer fertility report per (lang, source) — the
    * budget-planning table a training run reads before fixing its
    * token counts: docs, whitespace words, BPE-ish subword tokens
    * ([[tokenStats]]'s regex segmentation), characters; fertility =
    * subwords per word (the standard tokenizer-efficiency metric) and
    * chars per subword. Integer sums are exact (order-free), the two
    * ratios are single double divisions 6dp scale-rounded at the edge.
    * One shuffle on the tiny (lang, source) key space.
    */
  def fertility(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val stats = tokenStats(docs, textCol)
    docs.select(col("doc_id"), col("lang"), col("source"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(stats, Seq("doc_id"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens").cast("long")).as("n_words"),
        sum(col("n_bpe_tokens").cast("long")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_words"), col("n_subwords"), col("n_chars"),
        r6(col("n_subwords").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"))
          .as("fertility"),
        r6(col("n_chars").cast("double") /
          greatest(col("n_subwords"), lit(1L)).cast("double"))
          .as("chars_per_subword"))
  }

  /** Canonical text normalization — the first step of any corpus
    * cleaning pipeline: trim, collapse whitespace runs, Unicode NFC
    * (via the codegen'd [[graft.functions.NfcNormalize]] expression —
    * Spark has no built-in), then lowercase. One shuffle-free
    * codegen'd scan; the NFC fast path returns already-normalized
    * (≈ all-ASCII) rows untouched.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val collapsed = regexp_replace(trim(col(textCol)), "\\s+", " ")
    val norm = lower(graft.functions.StringExpressions
      .nfc_normalize(collapsed))
    docs.select(col("doc_id"),
      length(col(textCol)).cast("long").as("n_chars_raw"),
      norm.as("text_norm"))
      .withColumn("n_chars_norm", length(col("text_norm")).cast("long"))
  }

  /** Per-language exact length quantiles (p25/p50/p75 of `n_chars`)
    * plus the count of documents at or above the language median — the
    * distribution profile a per-language length/quality threshold
    * policy is derived from (CCNet-style per-language cutoffs, not one
    * global number that over-prunes low-resource languages).
    *
    * Exact `percentile` (linear interpolation at p·(n−1)) is
    * deliberate: its state is a value→count map, so memory is
    * O(distinct n_chars per language) — bounded for a length metric at
    * any corpus size. For unbounded-cardinality metrics at 100 TB,
    * swap in `approx_percentile` (KLL-sketch, fixed memory) — the
    * plan shape is identical.
    *
    * Determinism: p ∈ {.25, .5, .75} are dyadic, n_chars is integer,
    * so the interpolation `a + frac·(b−a)` is bit-exact in IEEE
    * doubles on both engines; the ≥-median comparison therefore
    * can't flip. Quantiles are 6dp-rounded at the output edge only.
    */
  def lengthQuantiles(docs: DataFrame,
                      lenCol: String = "n_chars"): DataFrame = {
    // the per-language frame feeds BOTH the threshold join and the
    // final output; it's |langs| rows, so checkpoint it once instead
    // of re-running the corpus aggregation per branch (identical agg
    // subplans don't reliably get exchange reuse — tfidfTopK note)
    val q = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      percentile(col(lenCol), lit(0.25)).as("p25"),
      percentile(col(lenCol), lit(0.5)).as("p50"),
      percentile(col(lenCol), lit(0.75)).as("p75"))
      .localCheckpoint(false)
    val above = docs
      .join(broadcast(q.select(col("lang"), col("p50"))), Seq("lang"))
      .where(col(lenCol).cast("double") >= col("p50"))
      .groupBy("lang").agg(count(lit(1)).as("n_above_median"))
    q.join(above, Seq("lang"))
      .select(col("lang"), col("n_docs"),
        round(col("p25"), 6).as("p25"),
        round(col("p50"), 6).as("p50"),
        round(col("p75"), 6).as("p75"),
        col("n_above_median"))
  }

  /** Token statistics: whitespace tokens, BPE-ish subword pieces
    * (letter runs / digit runs / single other chars — the classic
    * pre-tokenizer regex), and distinct-token count.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(textCol)
    val bpe = regexp_extract_all(lower(col(textCol)),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    docs.select(col("doc_id"),
      size(t).as("n_ws_tokens"),
      size(bpe).as("n_bpe_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"))
  }

  /** Repetition signals — the Gopher-style "repetitious document"
    * filters a training pipeline drops on: duplicate-token fraction,
    * most-frequent-token fraction, and duplicate-bigram fraction. All
    * ratios of exact integer counts (identical IEEE division in any
    * engine). One explode + aggregation per granularity, map-side
    * combinable; no all-pairs anything.
    */
  def repetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = toks(textCol)
    val bi = zip_with(t, slice(t, lit(2), size(t)),
      (a, b) => concat(a, lit(" "), b))
    val tokStats = docs.select(col("doc_id"), explode(t).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
    val biStats = docs.select(col("doc_id"), explode(bi).as("bg"))
      .where(col("bg").isNotNull)
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_bi"),
        count(lit(1)).as("n_bi_distinct"))
    tokStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_tok").as("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_tok").cast("double"), 6).as("dup_token_frac"),
        round(col("top_c").cast("double") /
          col("n_tok").cast("double"), 6).as("top_token_frac"),
        round(lit(1.0) - col("n_bi_distinct").cast("double") /
          col("n_bi").cast("double"), 6).as("dup_bigram_frac"))
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash of
    * the token-hash sequence in the M31 field (same hash both
    * engines). Content-defined, whitespace-normalized.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val hashes = transform(toks(textCol), t => md5HashM31(t))
    docs.select(col("doc_id"),
      aggregate(hashes, lit(0L), (acc, x) => (acc * 31 + x) % lit(M31))
        .as("fingerprint"))
  }

  /** Corpus statistics — the per-stratum "data card" numbers a released
    * dataset publishes: document counts, token totals, and token-count
    * percentiles per language. One map-side-combinable pass for the
    * sums. Exact percentiles (`approx = false`, the oracle-gated form)
    * buffer each stratum's values — fine while strata fit an executor;
    * at 100 TB strata are billions of documents, so `approx = true`
    * switches to `percentile_approx` (KLL-style mergeable sketch,
    * constant memory, rank error ≤ n/`accuracy` — at the default
    * 10⁴ that is ±0.01% of the distribution, far below any data-card
    * reporting threshold).
    */
  def corpusStats(docs: DataFrame, textCol: String = "text",
                  stratumCol: String = "lang",
                  approx: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    val nTokens = size(Dedup.tokens(textCol)).cast("long")
    val pct = (q: Double) =>
      if (approx)
        expr(s"percentile_approx(n_tokens, $q, $accuracy)").cast("double")
      else expr(s"percentile(n_tokens, $q)")
    docs.select(col(stratumCol), nTokens.as("n_tokens"))
      .groupBy(stratumCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        // explicit Σ/n of exact integers + scaled round, not round(avg, 6):
        // avg() accumulation order and round-at-6dp-ties both diverge
        // across engines (see r6)
        r6(sum(col("n_tokens")).cast("double") / count(lit(1)))
          .as("mean_tokens"),
        r6(pct(0.5)).as("p50_tokens"),
        r6(pct(0.9)).as("p90_tokens"),
        r6(pct(0.99)).as("p99_tokens"))
  }

  /** Unigram corpus-frequency scoring — the LM-filter plumbing
    * (CCNet-style) with the corpus itself as the language model: build
    * corpus-wide token counts and a top-`vocabSize` vocabulary
    * (count desc, token asc tiebreak), then score each document by
    *   - `avg_token_count`: mean corpus count of its tokens (junk /
    *     OCR-garbage documents are rare-token-heavy and score low),
    *   - `oov_frac`: fraction of its tokens outside the vocabulary.
    * Every quantity is a ratio of exact integers, so the score is
    * engine-deterministic (no log/exp, whose libm implementations
    * differ across engines).
    *
    * Plan shape at 100 TB: token counts are one map-side-combinable
    * aggregation; the count table is vocabulary-sized (≪ corpus —
    * Heaps' law), so the score join is a broadcast-or-hash join on
    * token that AQE sizes, never a corpus self-join; the per-doc
    * regroup shuffles one row per token occurrence.
    */
  def unigramScore(docs: DataFrame, vocabSize: Int = 1000,
                   textCol: String = "text"): DataFrame = {
    val occ = docs.select(col("doc_id"), explode(toks(textCol)).as("tok"))
    val counts = occ.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // deterministic top-V: (cnt desc, tok asc) through orderBy+limit —
    // Spark plans TakeOrderedAndProject (distributed partial top-k per
    // partition, k-merge on the driver), never a one-task global sort
    // of the count table
    val vocab = counts.orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    // fold the vocab flag into the (vocabulary-sized) count table first:
    // one corpus-scale join instead of two passes over every occurrence
    val countsFlagged = counts.join(vocab, Seq("tok"), "left")
    occ.join(countsFlagged, Seq("tok"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        // explicit Σcnt / n (both exact integers) rather than avg():
        // engines may implement integer AVG with incremental double
        // accumulation, which is summation-order-dependent
        r6(sum(col("cnt")).cast("double") / count(lit(1)))
          .as("avg_token_count"),
        r6(sum(when(col("in_vocab").isNull, 1).otherwise(0))
          .cast("double") / count(lit(1))).as("oov_frac"))
  }

  /** Fused per-document filter metrics — [[repetition]]'s
    * `dup_token_frac` and [[unigramScore]]'s `oov_frac` from ONE
    * tokenize + ONE (doc_id, tok) aggregation, for pipelines that
    * filter on both (the curation flagship): running the two operators
    * separately explodes and shuffles every token occurrence twice
    * (plus repetition's bigram pass, unused by the filter) and then
    * pays two corpus joins to re-attach the columns. Here the
    * (doc_id, tok, c) frame feeds both the corpus count table (a
    * second, map-side-combinable aggregation over the already-reduced
    * frame) and the per-doc regroup, and both metrics come back in one
    * row per document.
    *
    * Bit-equivalence with the standalone operators (PipelineSpec):
    * dup_token_frac = round(1 − n_distinct/n_tok, 6) over the same
    * exact integers; oov_frac counts occurrences of out-of-vocab
    * tokens as Σ c·[oov] — the same integer [[unigramScore]] reaches
    * by counting exploded occurrences — over the same (count desc,
    * tok asc) top-`vocabSize` vocabulary.
    */
  def docFilterMetrics(docs: DataFrame, vocabSize: Int = 1000,
                       textCol: String = "text"): DataFrame =
    withDocFilterMetrics(docs, docs, vocabSize, textCol)
      .select(col("doc_id"), col("dup_token_frac"), col("oov_frac"))

  /** [[docFilterMetrics]] as APPENDED columns (r12): the vocabulary —
    * top `vocabSize` tokens by (count desc, tok asc) over `corpus` —
    * is ONE map-side-combinable token count + distributed TakeOrdered
    * folded into a single broadcast row; the per-document metrics are
    * then pure per-row array math over `frame`'s own tokens
    * (`n_tok = size`, `n_distinct = size(array_distinct)`,
    * `n_oov = size(filter(not in vocab))` — the same exact integers
    * the old (doc_id, tok) aggregation reached). The old shape paid
    * three exchanges (doc-token regroup, corpus count, per-doc
    * regroup) plus a corpus-wide join to re-attach two columns the
    * row's own text determines; this shape pays one token-count
    * exchange and zero joins, and a caller can compute the metrics
    * in place on any (possibly filtered) frame without a join.
    * Membership is a vocabSize-linear scan per token — the right
    * trade for filter-sized vocabularies (the curation flagship's
    * 20; even the 1000 default is sub-µs CPU against a shuffled
    * join's network bytes).
    *
    * Token-less rows are dropped — the exact semantics the old fused
    * frame's inner join gave its consumers.
    */
  def withDocFilterMetrics(corpus: DataFrame, frame: DataFrame,
                           vocabSize: Int = 1000,
                           textCol: String = "text"): DataFrame = {
    val vocabRow = corpus.select(explode(toks(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabSize)
      .agg(collect_list(col("tok")).as("_vocab"))
    frame.crossJoin(broadcast(vocabRow))
      .withColumn("_t", toks(textCol))
      .where(size(col("_t")) > 0)
      .withColumn("dup_token_frac",
        round(lit(1.0) - size(array_distinct(col("_t"))).cast("double") /
          size(col("_t")).cast("double"), 6))
      .withColumn("oov_frac",
        r6(size(filter(col("_t"), t =>
            !array_contains(col("_vocab"), t))).cast("double") /
          size(col("_t")).cast("double")))
      .drop("_t", "_vocab")
  }

  /** BPE pair statistics — the inner loop of tokenizer training: count
    * adjacent character pairs inside each token occurrence across the
    * corpus and return the top `topK` by (count desc, pair asc). One
    * map-side-combinable aggregation over a tiny key space
    * (|charset|²) plus a distributed TakeOrdered — the corpus is read
    * once, nothing corpus-sized ever shuffles, which is what makes
    * iterated merges affordable at 100 TB (each round is another
    * linear scan, not a join).
    */
  def bpePairCounts(docs: DataFrame, topK: Int = 30,
                    textCol: String = "text"): DataFrame =
    docs.select(explode(toks(textCol)).as("tok"))
      .where(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(topK)

  /** One BPE training round, applied: take the corpus's top adjacent
    * pair (from [[bpePairCounts]], (count desc, pair asc) tiebreak) and
    * merge every occurrence in every token, reporting per-document
    * symbol counts before/after. Words are modeled as space-joined
    * character sequences; a literal (non-regex) `replace` of "x y" with
    * "xy" performs exactly BPE's leftmost non-overlapping merge pass,
    * and each application removes one separator, so
    * `n_merges = len(before) − len(after)` in characters / 1 per
    * merge. Everything is expression-level (the top pair rides a
    * 1-row broadcast cross join) — one corpus scan per merge round,
    * which is why iterated BPE training is affordable at scale.
    */
  def bpeApplyTopMerge(docs: DataFrame,
                       textCol: String = "text"): DataFrame = {
    // a corpus with no length-2 token has no pairs — an EMPTY top frame
    // would annihilate the cross join and silently drop every document,
    // so a never-matching sentinel pattern (NUL cannot appear in a
    // token) guarantees exactly one merge row; orderBy(_prio) prefers
    // the real pair when one exists
    val sentinel = docs.sparkSession.range(1)
      .select(lit("\u0000 \u0000").as("_pat"),
        lit("\u0000\u0000").as("_rep"), lit(1).as("_prio"))
    val top = bpePairCounts(docs, topK = 1, textCol)
      .select(concat(substring(col("pair"), 1, 1), lit(" "),
          substring(col("pair"), 2, 1)).as("_pat"),
        col("pair").as("_rep"), lit(0).as("_prio"))
      .unionByName(sentinel)
      .orderBy(col("_prio")).limit(1)
      .drop("_prio")
    // spaced: "abc" → "a b c"; each literal merge of "x y" → "xy"
    // removes exactly one character, so merges = len(spaced) − len(merged)
    val spaced = "concat_ws(' ', transform(sequence(1, length(tok)), " +
      "i -> substring(tok, i, 1)))"
    docs.select(col("doc_id"), explode(toks(textCol)).as("tok"))
      .crossJoin(broadcast(top))
      .select(col("doc_id"),
        length(col("tok")).cast("long").as("units_before"),
        (length(expr(spaced)) - length(expr(s"replace($spaced, _pat, _rep)")))
          .cast("long").as("merges"))
      .groupBy("doc_id")
      .agg(sum(col("units_before")).as("n_units_before"),
        (sum(col("units_before")) - sum(col("merges"))).as("n_units_after"),
        sum(col("merges")).as("n_merges_applied"))
  }

  /** PII patterns shared with the oracle SQL (simple RE2 ∩ Java-regex
    * subset: char classes, bounded repeats, word boundaries — identical
    * semantics in both engines). Deliberately precision-leaning: a
    * curation pass prefers missing an exotic format to mangling prose.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** PII scrubbing — the redaction pass a released training corpus
    * runs: emails, IPv4 addresses, and phone-shaped numbers replaced by
    * typed placeholders, with per-document match counts (counted on the
    * ORIGINAL text; replacements apply email → ip → phone so an
    * earlier placeholder can never feed a later pattern). Pure per-row
    * codegen'd regex work: no shuffle, no state, linear at any scale.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumn("email_count", regexp_count(t, lit(EmailRe)))
      .withColumn("ip_count", regexp_count(t, lit(Ipv4Re)))
      .withColumn("phone_count", regexp_count(t, lit(PhoneRe)))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          PhoneRe, "[PHONE]"))
  }

  /** Multi-round BPE vocabulary training: `rounds` iterations of
    * count-top-pair → merge-everywhere, over symbol sequences that
    * start as characters and grow into multi-character subwords — the
    * actual tokenizer-training loop, not just its first step
    * ([[bpeApplyTopMerge]]). Returns the learned merge table
    * (round, left, right, pair, n_occurrences), stopping early when no
    * adjacent pair remains.
    *
    * Merge application is EXACT leftmost non-overlapping greedy BPE:
    * symbols are joined with TWO spaces and padded with one
    * (`" a  b  c "`), and the pattern `" a  b "` → `" ab "` leaves the
    * neighbouring separator space intact, so a run `a a a a` merges to
    * `aa aa` in one pass — a literal single-space join would consume
    * the separator and under-merge runs. `replace` is a literal
    * left-to-right scan with identical semantics in Spark
    * (UTF8String) and DuckDB, which is what makes the whole training
    * trace oracle-checkable.
    *
    * Scale shape: each round is one linear corpus scan (pair explode +
    * map-side-combinable count over a |symbols|²-bounded key space)
    * plus a distributed top-1 and a ONE-ROW driver collect (the merge
    * decision is inherently sequential — this is BPE's algorithmic
    * structure, not a Spark limitation). The evolving corpus
    * representation is cached per round and the previous round
    * unpersisted, so round i never replays rounds 0..i−1.
    */
  /** Merge rounds for the driver gate — shared with the oracle SQL
    * generator (the oracle unrolls one WITH stage per round).
    */
  val GateBpeRounds = 8

  def bpeTrain(docs: DataFrame, rounds: Int,
               textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // " a  b  c " — char-spaced with double separators (see above)
    var rep = docs
      .select(explode(toks(textCol)).as("tok"))
      .select(concat(lit(" "), expr(
        "concat_ws('  ', transform(sequence(1, length(tok)), " +
          "i -> substring(tok, i, 1)))"), lit(" ")).as("sp"))
      .cache()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var prev: Option[org.apache.spark.sql.Dataset[_]] = None
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      // zip_with over two slices stays in codegen; the
      // transform(sequence, i -> element_at) formulation is interpreted
      // per element and measured ~20× slower (round-1 note)
      val top = rep
        .select(filter(split(col("sp"), " "), x => x =!= "").as("s"))
        .where(size(col("s")) >= 2)
        .select(explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
            "(x, y) -> concat(x, ' ', y))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .as[(String, Long)].collect()
      // the pair scan just materialized `rep`'s cache, so its parent's
      // blocks are no longer reachable — dropping them here (not after
      // an extra count()) keeps the loop at ONE action per round
      prev.foreach(_.unpersist())
      prev = Some(rep)
      if (top.isEmpty) done = true
      else {
        val (pair, n) = top.head
        val Array(l, r) = pair.split(" ", 2)
        merges += ((round, l, r, l + r, n))
        rep = rep
          .select(replace(col("sp"), lit(s" $l  $r "), lit(s" $l$r "))
            .as("sp"))
          .cache()
        round += 1
      }
    }
    rep.unpersist()
    prev.foreach(_.unpersist())
    merges.result().toDF("round", "lhs", "rhs", "pair", "n_occurrences")
  }

  /** Bigram language-model scoring with stupid backoff (Brants et al.
    * 2007, "Large Language Models in Machine Translation" — the
    * backoff that made web-scale LMs tractable: no discounting, just
    * α·unigram when the bigram is unseen). Documents in `docs` are
    * scored against counts from a REFERENCE corpus `ref` — the CCNet
    * LM-filter shape, one model corpus, another being filtered:
    *
    *   score(w | u) = c2(u,w)/c1(u)            if c2 > 0
    *                = α·(c1(w)+1)/(T+V)        otherwise (add-one so
    *                                            OOV tokens stay finite)
    *   avg_logprob(d) = Σ ln score / n_scored   over positions 2..n
    *
    * Scale shape: both count tables are vocabulary-bounded and
    * broadcast EXPLICITLY (the corpus-side frame must never be the
    * build side); the corpus pays one scan for pair explosion and one
    * per-doc regroup. At web scale prune the bigram table to top-M by
    * count first — stupid backoff is designed to tolerate exactly that.
    *
    * Determinism: ln inputs are integer ratios in one shared
    * parenthesization, per-pair logs are computed once in the
    * vocab-sized tables, and the per-doc sum rides DECIMAL(38,12).
    */
  def bigramScore(docs: DataFrame, ref: DataFrame, alpha: Double = 0.4,
                  textCol: String = "text"): DataFrame = {
    val pairsOf = (d: DataFrame) =>
      d.select(col("doc_id"), toks(textCol).as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(toks, 1, size(toks) - 1), " +
            "slice(toks, 2, size(toks) - 1), " +
            "(x, y) -> named_struct('u', x, 'w', y))")).as("bg"))
        .select(col("doc_id"), col("bg.u").as("u"), col("bg.w").as("w"))
    val uni = ref.select(explode(toks(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).as("t"), count(lit(1)).as("v"))
    val bi = pairsOf(ref).groupBy("u", "w").agg(count(lit(1)).as("c2"))
    val biScored = bi.join(uni.withColumnRenamed("tok", "u"), Seq("u"))
      .select(col("u"), col("w"),
        log(col("c2").cast("double") / col("c1"))
          .cast("decimal(38,12)").as("w_bi"))
    val backoff = uni.crossJoin(broadcast(tot))
      .select(col("tok").as("w"),
        log(lit(alpha) * (col("c1") + lit(1L)) / (col("t") + col("v")))
          .cast("decimal(38,12)").as("w_back"))
    val oovBack = // c1 = 0 for tokens the reference never saw
      log(lit(alpha) * lit(1.0) / (col("t") + col("v")))
        .cast("decimal(38,12)")
    pairsOf(docs)
      .join(broadcast(biScored), Seq("u", "w"), "left")
      .join(broadcast(backoff), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_scored"),
        sum(coalesce(col("w_bi"), col("w_back"), oovBack)).as("s"))
      .select(col("doc_id"), col("n_scored"),
        (round(col("s").cast("double") / col("n_scored") * lit(1e6))
          .cast("long").cast("double") / lit(1e6)).as("avg_logprob"))
  }

  /** Apply a learned merge list ([[bpeTrain]] output, collected to the
    * driver — it is vocabulary-sized) to the corpus: every token is
    * char-spaced and the merges replay IN TRAINING ORDER as chained
    * literal replaces — one codegen'd projection, ONE corpus scan no
    * matter how many merges (this is why BPE apply is cheap at 100 TB
    * even when training took K scans). Returns per-doc subword stats:
    * tokenization length before/after and the compression ratio.
    */
  def bpeTokenize(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text"): DataFrame = {
    val spaced = concat(lit(" "), expr(
      "concat_ws('  ', transform(sequence(1, length(tok)), " +
        "i -> substring(tok, i, 1)))"), lit(" "))
    val merged = merges.foldLeft(spaced) { case (c, (l, r)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    // symbols = (spaces in the padded form − 1) / 2 + ... simpler and
    // exact: count non-empty split cells, same as training's pair base
    val nSyms = (c: Column) => size(filter(split(c, " "), x => x =!= ""))
    docs.select(col("doc_id"), explode(toks(textCol)).as("tok"))
      .select(col("doc_id"),
        length(col("tok")).cast("long").as("chars"),
        nSyms(merged).cast("long").as("subwords"))
      .groupBy("doc_id")
      .agg(sum(col("chars")).as("n_chars"),
        sum(col("subwords")).as("n_subwords"),
        count(lit(1)).as("n_tokens"))
      // exact-integer ratio; scaled-round sequence = DuckDB round(x,6)
      // even on systematic ties (see unigramScore)
      .withColumn("compression",
        (round(col("n_chars").cast("double") / col("n_subwords") * lit(1e6))
          .cast("long").cast("double") / lit(1e6)))
  }

  /** Hashed-feature linear text classifier — the fastText shape
    * (Joulin et al. 2016, arXiv:1607.01759): every token-bigram hashes
    * into a fixed-size weight table and the document score is the mean
    * table weight of its features. This is how production quality
    * classifiers (e.g. CCNet/LLaMA-style "is this page wiki-like?")
    * run over a 100 TB crawl: no vocabulary join at all when the
    * weight is a pure expression of the hash, or a broadcast join
    * against a table-sized (2^B) weight frame when trained weights are
    * supplied — either way one codegen'd corpus scan, a per-doc
    * map-side-combinable aggregate, and nothing corpus-sized shuffles.
    *
    * With `weights = None` the stand-in weight for feature-hash h is
    * the zero-mean integer `(h mod 2001) − 1000` — deterministic in
    * every engine, so the whole score is an exact-integer ratio until
    * the output-edge scaled round. A trained model swaps in a
    * `(feature_hash, weight)` frame without touching the plan shape.
    *
    * Output: (doc_id, n_features, score, positive); documents with
    * fewer than two tokens surface with n_features = 0 and null score.
    */
  /** Train the hashed weight table for [[hashedLinearScore]] from
    * labeled documents in ONE map-side-combinable aggregation:
    * w[h] = Σ label(doc) over every occurrence of feature h — the
    * count-based one-epoch linear fit (the centroid-of-labels
    * estimate a fastText-style model converges toward for hashed
    * bag-of-bigrams). `labelCol` is any per-doc numeric expression
    * (±1 class labels, a quality score, …). The label rides the
    * feature-extraction scan, so nothing corpus-sized joins or
    * shuffles: the output is the 2^B-bounded (feature_hash, weight)
    * table the scorer broadcasts.
    */
  def trainHashedWeights(docs: DataFrame, labelCol: Column,
                         textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), labelCol.cast("double").as("label"),
        toks(textCol).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("label"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i-1], ' ', toks[i]))")).as("bigram"))
      .select(graft.pipeline.Hashing.md5HashM31(col("bigram"))
        .as("feature_hash"), col("label"))
      .groupBy("feature_hash")
      .agg(sum(col("label")).as("weight"))

  /** `carry` appends extra per-doc input columns to the output
    * through the existing restore join — callers previously paid a
    * corpus-sized join to re-attach them (r12).
    */
  def hashedLinearScore(docs: DataFrame,
                        weights: Option[DataFrame] = None,
                        textCol: String = "text",
                        carry: Seq[String] = Nil): DataFrame = {
    val feats = docs
      .select(col("doc_id"), toks(textCol).as("toks"))
      // sequence(1, 0) DESCENDS in Spark — a sub-2-token doc would
      // index out of bounds under ANSI; filter, the left join below
      // restores those docs with n_features = 0
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(toks[i-1], ' ', toks[i]))")).as("bigram"))
      .select(col("doc_id"),
        graft.pipeline.Hashing.md5HashM31(col("bigram")).as("h"))
    val weighted = weights match {
      case Some(w) =>
        // collapse duplicate feature_hash rows first — a left join
        // against a non-unique weight table would duplicate feature
        // rows, silently inflating n_features and the score; summing
        // duplicates is the linear-model semantics of repeated entries
        val wu = w.groupBy("feature_hash")
          .agg(sum(col("weight")).as("weight"))
        feats.join(broadcast(wu), feats("h") === wu("feature_hash"), "left")
          .select(col("doc_id"),
            coalesce(col("weight"), lit(0.0)).as("w"))
      case None =>
        feats.select(col("doc_id"),
          (pmod(col("h"), lit(2001L)) - lit(1000L)).as("w"))
    }
    val scored = weighted.groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"),
        sum(col("w")).as("sw"))
      .select(col("doc_id"), col("n_features"),
        r6(col("sw").cast("double") / col("n_features")).as("score"),
        (col("sw") > 0).as("positive"))
    docs.select(col("doc_id") +: carry.map(col): _*)
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        coalesce(col("n_features"), lit(0L)).as("n_features") +:
        col("score") +: col("positive") +: carry.map(col): _*)
  }

  // ---- Count-min sketch heavy hitters -------------------------------

  /** Sketch geometry for the gated queries. Width is deliberately
    * small vs the corpus vocabulary so the gate exercises real
    * collisions (est_count > exact count) — at 100 TB you size width
    * ≈ e/ε for the tolerable overcount ε·N.
    */
  val CmsDepth = 4
  val CmsWidth = 512

  private def cmsBucket(tok: Column, row: Int, width: Int): Column =
    pmod(Hashing.perm(Hashing.md5HashM31(tok), row), lit(width.toLong))

  /** Count-min sketch over the corpus' token stream: depth×width
    * bounded counters, one per (row, bucket). ONE corpus scan; the
    * depth-way explosion happens on the already-exploded token rows
    * and the aggregation is map-side combinable over ≤ depth·width
    * distinct keys — the shuffle is sketch-sized (KB), never
    * corpus-sized. The output frame IS the mergeable summary: sketches
    * of corpus slices merge by (row, bucket) count addition
    * ([[cmsMerge]]), which is how a 100 TB corpus builds one sketch
    * per partition-group in parallel and folds them on the driver or
    * in a tree.
    */
  def countMinSketch(docs: DataFrame, textCol: String = "text",
                     depth: Int = CmsDepth,
                     width: Int = CmsWidth): DataFrame = {
    val tokens = docs.select(explode(toks(textCol)).as("tok"))
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"), cmsBucket(col("tok"), i, width).as("bucket")))
    tokens
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches of the same geometry: counter-wise addition.
    * Associative + commutative — the distributive fold at scale.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** [[countMinSketch]] as a STREAMING aggregation — the
    * continuous-ingest form of sketch maintenance: each micro-batch's
    * token stream folds into the ≤ depth·width counters (Complete
    * mode: the counter table is tiny by construction, so re-emitting
    * it per batch is KBs — this is the rare case where Complete is
    * the scale answer, because the state IS the sketch). Counter
    * addition is the [[cmsMerge]] law, so the drained streaming
    * sketch is bit-identical to the batch sketch of the same corpus
    * ([[cmsHeavyHitters]] point queries serve the same answers —
    * hash-gated by `stream_heavy_hitters` against the whole-corpus
    * batch oracle).
    */
  def countMinSketchStream(stream: DataFrame, textCol: String = "text",
                           depth: Int = CmsDepth,
                           width: Int = CmsWidth): DataFrame = {
    val tokens = stream.select(explode(toks(textCol)).as("tok"))
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"), cmsBucket(col("tok"), i, width).as("bucket")))
    tokens
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimate token frequencies from a sketch and return the top-k
    * heavy hitters: est(tok) = min over rows of the token's bucket
    * counter (the classic CMS point query — an overestimate, never
    * under). `candidates` is the token set to query; the gate passes
    * the corpus' distinct tokens, a 100 TB deployment passes a
    * bounded candidate list (per-partition top-m survivors, a prior
    * vocabulary, or trending terms) — the sketch answers in O(depth)
    * per candidate from a broadcast-sized table either way.
    */
  def cmsHeavyHitters(candidates: DataFrame, sketch: DataFrame,
                      topK: Int = 25, depth: Int = CmsDepth,
                      width: Int = CmsWidth): DataFrame = {
    // the depth row-slices are depth independent broadcast branches of
    // the same un-materialized sketch plan — without truncation each
    // would re-run the corpus-wide sketch aggregation (AQE exchange
    // reuse observed not collapsing such branches; the collocations/
    // tfidf pattern). The sketch is ≤ depth·width rows: checkpoint it.
    val sk0 = sketch.localCheckpoint(false)
    var est = candidates.select(col("tok"))
    for (i <- 0 until depth) {
      val sk = sk0.where(col("row") === i)
        .select(col("bucket").as(s"b$i"), col("cnt").as(s"c$i"))
      // left join: a candidate the corpus never saw has no bucket row
      // only when that bucket is globally empty — either way the CMS
      // answer is the counter value, 0 when absent (never under)
      est = est.withColumn(s"b$i", cmsBucket(col("tok"), i, width))
        .join(broadcast(sk), Seq(s"b$i"), "left")
    }
    est
      .select(col("tok"),
        least((0 until depth).map(i =>
          coalesce(col(s"c$i"), lit(0L))): _*).as("est_count"))
      .orderBy(col("est_count").desc, col("tok").asc)
      .limit(topK)
  }

  /** Per-doc density of a given stopword list — the composition
    * target for [[cmsHeavyHitters]]: DISCOVER the corpus' function
    * words from the sketch (no hand-curated list, works for any
    * language mix), collect the k-sized list to the driver, and score
    * every document in one shuffle-free codegen'd scan (`hits` over
    * the token array, the same shape as [[quality]]). Sub-`minTokens`
    * docs get a NULL fraction rather than a noisy one.
    */
  def stopwordDensity(docs: DataFrame, stopwords: Seq[String],
                      textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), toks(textCol).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        hits(col("toks"), stopwords).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_tokens"), col("n_stop"),
        when(col("n_tokens") > 0,
          r6(col("n_stop").cast("double") / col("n_tokens")))
          .as("stop_frac"))

  // ---- PMI collocations ---------------------------------------------

  /** Collocation mining: adjacent-token pairs ranked by pointwise
    * mutual information,
    *
    *   pmi(u,w) = ln( (c2/Nb) / ((c1(u)/Nu)·(c1(w)/Nu)) )
    *            = ln( c2·Nu·Nu / (Nb·c1(u)·c1(w)) )
    *
    * over pairs with c2 ≥ minCount (the standard guard — PMI explodes
    * on hapax pairs). Three count tables (bigram, unigram, totals),
    * all vocabulary-bounded; the corpus pays one scan for pair
    * explosion. The unigram table is broadcast into the bigram join —
    * nothing corpus-sized shuffles twice. Determinism: the ln input is
    * a single integer-ratio expression in one shared parenthesization
    * and the result is 6dp-truncated per pair (the [[r6]] scaled-round
    * sequence), the same cross-engine contract as [[bigramScore]].
    */
  def collocations(docs: DataFrame, minCount: Long = 5L, topK: Int = 30,
                   textCol: String = "text"): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), toks(textCol).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "zip_with(slice(toks, 1, size(toks) - 1), " +
          "slice(toks, 2, size(toks) - 1), " +
          "(x, y) -> named_struct('u', x, 'w', y))")).as("bg"))
      .select(col("bg.u").as("u"), col("bg.w").as("w"))
    // uni feeds three consumers (cu join, cw join, Nu total) and bi0
    // two (Nb total, the filtered table) — self-join branches don't
    // CSE and AQE's exchange reuse was observed NOT collapsing them,
    // so the corpus would pay the token/pair explosion per branch.
    // Both frames are vocabulary-bounded: lazily localCheckpoint them
    // (the semanticDedup pattern — first materialization is reused;
    // snapshot semantics documented there apply here too)
    val uni = docs.select(explode(toks(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false)
    val bi0 = pairs.groupBy("u", "w").agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    val totals = bi0.agg(sum(col("c2")).as("nb")).crossJoin(
      uni.agg(sum(col("c1")).as("nu")))
    val bi = bi0.where(col("c2") >= minCount)
    bi
      .join(broadcast(uni.select(col("tok").as("u"), col("c1").as("cu"))),
        Seq("u"))
      .join(broadcast(uni.select(col("tok").as("w"), col("c1").as("cw"))),
        Seq("w"))
      .crossJoin(broadcast(totals))
      .select(col("u"), col("w"), col("c2").as("n_pair"),
        // denominator through DOUBLE from the first multiply: the
        // integer product Nb·c1(u)·c1(w) exceeds 2^63 on large
        // corpora (silent Long wrap here, a BIGINT overflow error in
        // DuckDB); both engines share the ((nb·cu)·cw) double order
        r6(log(col("c2").cast("double") * col("nu") * col("nu")
          / (col("nb").cast("double") * col("cu") * col("cw")))).as("pmi"))
      .orderBy(col("pmi").desc, col("u").asc, col("w").asc)
      .limit(topK)
  }

  // ---- Chunking (training-window preparation) -----------------------

  /** Split every document into fixed-length token chunks with a
    * configurable stride — the context-window preparation step of a
    * training pipeline (stride < chunkTokens gives the standard
    * overlapping windows; stride == chunkTokens tiles exactly).
    *
    * Scale shape: per-row explode of chunk START positions (⌈n/stride⌉
    * rows per doc, bounded by doc length), `slice` on the already-built
    * token array per start — no shuffle at all; chunking is a pure map
    * and the output is written partition-local. The final chunk keeps
    * its natural short length (no padding) so token accounting stays
    * exact; empty documents produce zero chunks.
    *
    * Output: (doc_id, chunk_id, n_tokens, chunk_text) with chunk_id =
    * start/stride (0-based, dense per doc).
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
                textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(stride > 0, s"stride must be positive: $stride")
    docs
      .select(col("doc_id"), toks(textCol).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(chunkTokens)).as("c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("c")).as("chunk_text"))
  }

  // ---- Vocabulary construction + id encoding ------------------------

  /** Frequency-ranked vocabulary: the `vocabSize` most frequent tokens,
    * ids assigned contiguously from 0 by (count desc, token asc) — the
    * deterministic token→id table a tokenizer-for-training emits.
    *
    * Scale shape: one map-side-combinable count aggregation over the
    * corpus (vocabulary-sized shuffle, like [[unigramScore]]); the
    * TOTAL order exists only over the top-`vocabSize` survivors, which
    * Catalyst plans as a distributed TakeOrdered — the corpus never
    * sees a single-partition sort. The final row_number over V rows is
    * a bounded-size single partition by construction (V ≪ corpus).
    */
  def vocabulary(docs: DataFrame, vocabSize: Int,
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs.select(explode(toks(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(vocabSize)
    // V rows: the global row_number is over the already-limited frame
    val w = Window.orderBy(col("n_occ").desc, col("token").asc)
    top.select(col("token"),
      (row_number().over(w) - 1).cast("int").as("token_id"), col("n_occ"))
  }

  /** Encode documents as token-id sequences against a [[vocabulary]]
    * frame: (doc_id, pos, token_id), OOV tokens = −1. The vocabulary
    * is broadcast (V rows) so encoding is one corpus scan with a
    * map-side hash join — the shape that turns 100 TB of text into
    * training ids without a shuffle.
    */
  def encodeIds(docs: DataFrame, vocab: DataFrame,
                textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), posexplode(toks(textCol)).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1)).as("token_id"))

  // ---- Mergeable distinct-count sketches (HLL) -----------------------

  /** Per-group vocabulary sketch: one Datasketches HLL per `lang`,
    * built with Spark's native `hll_sketch_agg` (codegen'd, mergeable).
    * The 100 TB story mirrors [[countMinSketch]]: each shard/partition
    * aggregates its own fixed-size sketch (lgK=12 → ≤ 4 KB dense), so
    * distinct-counting the corpus vocabulary ships kilobytes per group
    * instead of shuffling the token universe. Merge shard sketches
    * with [[vocabSketchMerge]]; read estimates with [[vocabEstimate]].
    * The estimate is exact while a sketch is still in its
    * coupon-collecting regime and within ±1.6% (lgK=12) beyond it —
    * measured against the exact distinct in VocabSketchSpec and the
    * HLL100X BASELINE probe rather than asserted.
    */
  def vocabSketch(docs: DataFrame, lgK: Int = 12,
                  textCol: String = "text"): DataFrame =
    docs.select(col("lang"), explode(toks(textCol)).as("token"))
      .groupBy("lang")
      .agg(hll_sketch_agg(col("token"), lit(lgK)).as("sketch"))

  /** Merge per-shard [[vocabSketch]] frames: union-all → one
    * `hll_union_agg` per group. Input sketches may disagree on lgK
    * (allowDifferentLgConfigK = true) — the union downgrades to the
    * smaller K, which is the standard mergeability contract.
    */
  def vocabSketchMerge(shards: DataFrame*): DataFrame =
    shards.reduce(_ unionByName _)
      .groupBy("lang")
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))

  /** Read a sketch frame: (lang, est_distinct). */
  def vocabEstimate(sketches: DataFrame): DataFrame =
    sketches.select(col("lang"),
      hll_sketch_estimate(col("sketch")).as("est_distinct"))

  /** Per-source unigram KL divergence from the corpus distribution —
    * the mixture-design QA panel: "how far does each source's token
    * distribution sit from the corpus average", the quantity DSIR
    * weighting and temperature mixing act on (a source at KL ≈ 0 is
    * interchangeable with the average; a high-KL source is the one a
    * mixture must up/down-weight deliberately).
    *
    * KL(p_s‖p_c) = Σ_t (c_st/N_s)·ln(c_st·N_c / (N_s·c_ct)), summed
    * over the source's own support (c_st > 0 ⇒ c_ct > 0 — no
    * smoothing needed; KL against the corpus a source is PART of is
    * always finite).
    *
    * Scale shape: one corpus scan → (source, token) counts; corpus
    * token counts derive from THAT table (vocabulary-sized, not a
    * second corpus pass); source totals and the corpus total are
    * broadcast. Cross-engine contract: each ln evaluates on the same
    * fixed-order double ratio and quantizes to a 12dp Long grid
    * before the exact DECIMAL sum ([[bigramScore]]'s precedent);
    * output rounds at the 6dp edge.
    */
  def sourceKl(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = (c: Column) => c.cast("decimal(19,0)")
    val st = docs.select(col("source"), explode(toks(textCol)).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c_st"))
    val ct = st.groupBy("tok").agg(sum(col("c_st")).as("c_ct"))
    val ns = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val nc = ns.agg(sum(col("n_s")).as("n_c"))
    // ln of the exact ratio, fixed operand order, 12dp Long grid
    val lnq = round(log(
        (col("c_st").cast("double") * col("n_c").cast("double")) /
          (col("n_s").cast("double") * col("c_ct").cast("double")))
        * lit(1e12)).cast("long")
    st.join(ct, Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nc))
      .select(col("source"), col("n_s"),
        (d(col("c_st")) * d(lnq)).as("term"))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        sum(col("term")).as("s"))
      .select(col("source"), col("n_tokens"),
        (round(col("s").cast("double") / col("n_tokens").cast("double") /
            lit(1e12) * lit(1e6)).cast("long").cast("double") / lit(1e6))
          .as("kl"))
  }
}
