package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Hashing._

/** Document deduplication operators for large-scale corpus curation:
  * exact (hash-group), MinHash+LSH, SimHash block-LSH, and n-gram
  * Jaccard. All are shuffle-on-key plans that scale horizontally —
  * no driver-side loops, no O(n²) stages (candidate generation always
  * goes through an LSH/bucket equi-join).
  */
object Dedup {

  /** Default exact-Jaccard verification threshold — ONE definition for
    * [[nearDupPairs]], [[ngramJaccard]], the gates that hand-compose
    * verification (`dedup_clusters_incremental`), and the DuckDB
    * oracle mirrors: a default drifting in one place must not silently
    * diverge from the others. */
  val DefaultMinJaccard = 0.15

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * One map-side-combinable aggregation; at 100 TB use
    * [[Hashing.fastHash64]] + a 128-bit md5 only on collisions.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Per-source duplication report — the curation dashboard's first
    * panel: for each source, total documents, documents that are
    * copies of ANY corpus document (cross-source duplicates included
    * — boilerplate syndication shows up here), documents that would
    * be REMOVED by [[exact]]'s keep-smallest-id rule, and the 6dp
    * removal rate. Two map-side-combinable aggregations joined on the
    * content hash; output is one row per source.
    */
  def rateBySource(docs: DataFrame, textCol: String = "text",
                   sourceCol: String = "source"): DataFrame = {
    // ONE corpus scan + one md5 pass: the per-hash group stats ride a
    // window over text_hash (the same shuffle [[exact]]'s groupBy
    // would pay), instead of scanning + hashing twice and joining
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text_hash")
    docs.select(col(sourceCol).as("source"), col("doc_id"),
        md5(col(textCol)).as("text_hash"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1L, lit(1L)).otherwise(lit(0L)))
          .as("n_duplicated"),
        sum(when(col("doc_id") =!= col("keeper_id"), lit(1L))
          .otherwise(lit(0L))).as("n_removed"))
      .select(col("source"), col("n_docs"), col("n_duplicated"),
        col("n_removed"),
        (round(col("n_removed").cast("double") /
            col("n_docs").cast("double") * lit(1e6))
          .cast("long").cast("double") / lit(1e6)).as("removal_rate"))
  }

  /** Production-tier exact dedup: `xxhash64` is codegen'd and an
    * order of magnitude cheaper than md5 at corpus scale. (64-bit,
    * length) keys make accidental collisions ~n²/2⁶⁴·P(len match);
    * for forensic-grade certainty, md5-confirm only inside collided
    * groups — a second pass over the tiny collided subset, not the
    * corpus. Spec-gated (DuckDB has no Spark-seeded xxhash64, so the
    * md5 [[exact]] remains the oracle query).
    */
  def exactFast(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"),
        length(col(textCol)).as("text_len"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Incremental exact dedup of a new batch against a historical
    * corpus via a Bloom filter — the 100 TB shape of "which of these
    * documents have we already ingested?". An anti-join of every
    * batch against the corpus re-shuffles corpus-scale data per
    * batch; this path never shuffles the history at all:
    *
    *  1. build a Bloom filter over the history's content hashes
    *     (`stat.bloomFilter` — a mergeable tree-aggregated sketch;
    *     ~1.2 GB per 10⁹ docs at 1% fpp, and per-batch filters
    *     `mergeInPlace` so steady state maintains the sketch
    *     incrementally instead of rescanning);
    *  2. membership-test the batch with the codegen'd
    *     `BloomFilterMightContain` expression (the same native
    *     predicate Spark's runtime row-level filtering injects) —
    *     misses are DEFINITIVELY new (no false negatives), no join;
    *  3. exact-confirm only the hits: a broadcast hash semi-join
    *     prunes the history to rows whose hash collides with a
    *     candidate (candidate-bounded, tiny), then an anti-join on
    *     the actual text removes true duplicates AND the Bloom
    *     false positives.
    *
    * Result is exactly the `batch ANTI JOIN history ON text`
    * semantics; the fpp knob trades sketch memory against confirm-join
    * traffic, never correctness. `expectedItems` sizes the filter —
    * pass the corpus cardinality from ingest metadata at scale (the
    * default falls back to one `count()` scan).
    */
  def bloomNewDocs(history: DataFrame, batch: DataFrame,
                   textCol: String = "text", fpp: Double = 0.01,
                   expectedItems: Long = 0L): DataFrame =
    bloomNewDocsWith(bloomBuild(history, textCol, fpp, expectedItems),
      history, batch, textCol)

  /** Build the serialized Bloom sketch over a corpus slice's content
    * hashes. One tree-aggregated scan; the result is the PERSISTED
    * dedup state — steady-state ingest builds a sketch per new batch
    * ([[bloomMerge]]-ing it into the corpus sketch after the batch
    * commits) and never rescans the history.
    */
  def bloomBuild(corpus: DataFrame, textCol: String = "text",
                 fpp: Double = 0.01, expectedItems: Long = 0L): Array[Byte] = {
    val expected =
      if (expectedItems > 0L) expectedItems
      else math.max(corpus.count(), 64L)
    val bf = corpus.stat.bloomFilter(xxhash64(col(textCol)), expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Union two serialized sketches (same expectedItems/fpp geometry —
    * `mergeInPlace` throws on incompatible filters). */
  def bloomMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(a))
    val fb = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val bos = new java.io.ByteArrayOutputStream()
    fa.writeTo(bos)
    bos.toByteArray
  }

  /** [[bloomNewDocs]] against a PRE-BUILT sketch — the steady-state
    * ingest path. A batch with zero sketch hits returns after
    * batch-local work only (the short-circuit `isEmpty` probe means
    * the history is not even SCANNED, let alone shuffled) — note
    * that at fpp f a batch of n docs expects n·f false positives, so
    * the zero-hit fast path fires for small batches / low fpp; a
    * large batch should expect ONE column-pruned history scan per
    * call, still never a history shuffle. Honest local-bench caveat
    * (BASELINE.md BLOOM probe): in a single JVM a plain anti-join
    * beats this path — "shuffling" 2M in-memory rows is a memcpy.
    * The bloom path's win is topological (no corpus shuffle: at
    * cluster scale the anti-join re-partitions the corpus over the
    * network per batch) plus build amortization via the persisted
    * mergeable sketch.
    */
  def bloomNewDocsWith(bloom: Array[Byte], history: DataFrame,
                       batch: DataFrame,
                       textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    val hash = xxhash64(col(textCol))
    val might = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), ColumnBridge.expression(hash)))

    val flagged = batch.withColumn("_bloom_hit", might)
    val misses = flagged.where(!col("_bloom_hit")).drop("_bloom_hit")
    val candidates = flagged.where(col("_bloom_hit"))
    if (candidates.isEmpty) return batch

    // Confirm pass: the history side is pruned by hash BEFORE any
    // text ships — candHashes is 8 bytes per distinct candidate, so
    // the semi-join broadcasts at any batch size that fits a batch,
    // and the history is scanned (never shuffled) exactly once.
    // The final anti-join is left to AQE (both sides are
    // candidate-bounded; it broadcasts the survivor set when small).
    val candHashes = candidates.select(hash.as("_h")).distinct()
    val survivors = history
      .join(broadcast(candHashes), hash === col("_h"), "left_semi")
      .select(col(textCol)).distinct()
    val confirmedNew = candidates
      .join(survivors, Seq(textCol), "left_anti")
      .drop("_bloom_hit")
    misses.unionByName(confirmedNew)
  }

  /** Whitespace tokens, lowercased — THE corpus tokenizer (quality,
    * shingles, packing budgets, and data-card stats all count with this
    * one expression). `split` keeps leading/trailing empty strings
    * ("\u0020a b " → ["", "a", "b", ""]), which would inflate every
    * token statistic and corrupt repetition fractions; `array_remove`
    * drops them, and an empty/whitespace-only document tokenizes to []
    * rather than [""].
    */
  def tokens(textCol: String): Column =
    array_remove(split(lower(col(textCol)), "\\s+"), "")

  /** Distinct k-token shingles per document: (doc_id, shingle).
    * The shingle array is built positionally (`transform` over an index
    * `sequence`) so it stays inside whole-stage codegen; `explode` +
    * `distinct` turns it into the set representation the Jaccard /
    * MinHash math needs.
    */
  def shingles(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    rawShingles(docs, k, textCol).distinct()

  /** [[shingles]] WITHOUT the distinct — shuffle-free. For consumers
    * that aggregate anyway (e.g. [[decontaminate]]'s countDistinct on
    * the post-join subset), deduplicating the full corpus first is a
    * corpus-wide shuffle bought for nothing.
    */
  def rawShingles(docs: DataFrame, k: Int,
                  textCol: String = "text"): DataFrame = {
    // zip_with + slice instead of transform(sequence, i -> element_at):
    // ~20× faster (element_at-by-index inside a higher-order lambda is
    // interpreted per element; zip_with streams both arrays). The
    // zipped tail is shorter, so positions past n-k+1 see a null
    // neighbour, concat null-propagates, and the trailing (and
    // too-short-doc) entries drop out with one isNotNull filter.
    val toks = tokens(textCol)
    val sh = (1 until k).foldLeft(toks: Column) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    docs.select(col("doc_id"), explode(sh).as("shingle"))
      .where(col("shingle").isNotNull)
  }

  /** MinHash signatures: one row per doc with columns s0..s{n-1}.
    * Signature component i = min over shingles of perm_i(h(shingle)).
    * Plain partial-merge min aggregates — the 16 mins ride one shuffle.
    */
  def minHashSignatures(docs: DataFrame, k: Int = 3): DataFrame =
    minHashSignaturesFromShingles(shingles(docs, k))

  /** [[minHashSignatures]] over an existing (doc_id, shingle) frame —
    * lets a pipeline share one cached shingle computation between
    * signature generation and exact verification.
    */
  def minHashSignaturesFromShingles(sh: DataFrame): DataFrame =
    sh.withColumn("h", md5HashM31(col("shingle")))
      .groupBy("doc_id")
      .agg(min(perm(col("h"), 0)).as("s0"),
        (1 until NumMinHashes).map(i => min(perm(col("h"), i)).as(s"s$i")): _*)

  /** The per-document MinHash signature as ONE array column — no
    * shuffle. [[minHashSignatures]] computes the 16 component minima
    * with a groupBy over exploded shingles (the right shape when a
    * pipeline shares the cached shingle frame with exact
    * verification); this form runs entirely inside the row's own
    * projection, which is the only shape a STREAM can use before its
    * stateful operator (a pre-state groupBy would itself become a
    * streaming aggregation) — and when nothing else needs the
    * shingles it is also the cheaper batch plan at 100 TB: the
    * corpus-wide explode + shuffle disappears. Component-for-component
    * bit-exact with [[minHashSignatures]] (pinned in PipelineSpec):
    * same tokens, same k-shingles, same md5→M31 hash, same
    * permutations — each shingle's md5 is computed ONCE and folded
    * through a 16-wide running-min accumulator (`aggregate` +
    * `zip_with`), never 16×. Documents with fewer than k tokens (no
    * shingle) get null, the analog of having no signature row.
    */
  def signatureArray(textCol: String = "text", k: Int = 3): Column = {
    val toks = tokens(textCol)
    val sh = (1 until k).foldLeft(toks: Column) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    val hs = transform(filter(sh, s => s.isNotNull), s => md5HashM31(s))
    // Running 16-wide min: init of M31 dominates every perm value
    // (perms are mod M31, so <= M31-1) and is replaced by the first
    // shingle of any non-empty document.
    val init = array(Seq.fill(NumMinHashes)(lit(M31)): _*)
    val folded = aggregate(hs, init, (acc, h) =>
      zip_with(acc,
        array((0 until NumMinHashes).map(i => perm(h, i)): _*),
        (m, p) => least(m, p)))
    when(size(toks) >= k, folded)
  }

  /** LSH banding: (doc_id, band, key) — docs sharing any band key are
    * near-dup candidates. The band key concatenates the band's
    * signature rows.
    */
  def minHashBands(sigs: DataFrame): DataFrame = {
    val bands = array((0 until NumBands).map { b =>
      val ks = (0 until RowsPerBand).map(r => col(s"s${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("_", ks: _*).as("key"))
    }: _*)
    sigs.select(col("doc_id"), explode(bands).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** MinHash+LSH near-dup candidates with estimated Jaccard
    * (fraction of matching signature components). The candidate join
    * is an equi-join on (band, key) — at scale this is the only
    * correct shape: no all-pairs comparison ever materializes, and
    * skewed buckets (boilerplate docs) are handled by AQE skew
    * splitting. The full signature rides the band rows as one array
    * column, so the estimate computes inside the band join itself —
    * measured 2.5× faster than re-joining the signature table twice
    * (two shuffles saved for 16 extra ints per exploded row).
    */
  def minHashCandidates(docs: DataFrame, k: Int = 3,
                        maxBandSize: Option[Int] = None): DataFrame =
    minHashCandidatesFromSignatures(minHashSignatures(docs, k), maxBandSize)

  /** The (doc_id, sig, band, key) banding frame computed WITHOUT a
    * shuffle: per-row signatures ([[signatureArray]]) + the banding
    * explode, a pure projection pipeline producing the same columns
    * and the same bytes as `sigBands(minHashSignatures(docs))`. This
    * is the STREAMING banding stage ([[graft.streaming.StreamingDedup]]
    * — a pre-state groupBy would itself become a stateful
    * aggregation), NOT the batch default: measured at sf0.1, the
    * groupBy form wins ~1.5× warm because its min aggregate is
    * codegen'd with map-side partial aggregation (shuffle volume is
    * 16 longs PER DOC, not per shingle — the exchange is never the
    * bottleneck) while the per-row `aggregate`/`zip_with` fold is
    * interpreted per shingle, and the batch self-join reuses the
    * groupBy exchange across both sides where the projection form
    * recomputes. Batch callers keep [[minHashSignatures]].
    */
  def minHashBandsPerRow(docs: DataFrame, k: Int = 3,
                         textCol: String = "text",
                         carry: Seq[String] = Nil): DataFrame = {
    val extra = carry.map(col)
    docs.withColumn("sig", signatureArray(textCol, k))
      .where(col("sig").isNotNull)
      .select(col("doc_id") +: col("sig") +: extra :+
        explode(array((0 until NumBands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until RowsPerBand).map(r =>
              element_at(col("sig"), b * RowsPerBand + r + 1)): _*).as("key"))
        }: _*)).as("bk"): _*)
      .select(col("doc_id") +: col("sig") +:
        col("bk.band").as("band") +: col("bk.key").as("key") +: extra: _*)
  }

  /** (doc_id, sig, band, key): the banding frame both the in-corpus
    * candidate join and the persisted index build on — one definition
    * of the band-key format. `carry` forwards extra per-doc columns
    * (e.g. the shingle count `n_sh`) through the banding explode. */
  private def sigBands(sigs: DataFrame,
                       carry: Seq[String] = Nil): DataFrame = {
    val sigArr = array((0 until NumMinHashes).map(i => col(s"s$i")): _*)
    val extra = carry.map(col)
    sigs.select(col("doc_id") +: sigArr.as("sig") +:
      explode(array((0 until NumBands).map { b =>
        val ks = (0 until RowsPerBand).map(r => col(s"s${b * RowsPerBand + r}"))
        struct(lit(b).as("band"), concat_ws("_", ks: _*).as("key"))
      }: _*)).as("bk") +: extra: _*)
      .select(col("doc_id") +: col("sig") +:
        col("bk.band").as("band") +: col("bk.key").as("key") +: extra: _*)
  }

  /** The banding join's quadratic-explosion guard, the band-level
    * analog of [[capDocFreq]]: a (band, key) bucket of n docs emits
    * n·(n−1)/2 candidate pairs, so ONE pathological key (boilerplate
    * shared by 10% of a corpus) turns the equi-join quadratic no
    * matter how well AQE splits the skewed partition. Buckets above
    * `maxBandSize` are dropped whole via a broadcast anti-join — the
    * hot keys are few by construction (they are the skew), and a
    * same-signature boilerplate family is the capDocFreq story, not a
    * near-dup discovery the cap could lose: any pair this filter
    * hides shares ALL other bands too unless the docs differ, in
    * which case a less-common band still pairs them.
    */
  def capBandSize(bands: DataFrame, maxBandSize: Option[Int]): DataFrame =
    maxBandSize match {
      case None => bands
      case Some(cap) =>
        val hot = bands.groupBy("band", "key")
          .agg(count(lit(1)).as("n"))
          .where(col("n") > cap).select("band", "key")
        bands.join(broadcast(hot), Seq("band", "key"), "left_anti")
    }

  private def minHashCandidatesFromSignatures(
      sigs: DataFrame, maxBandSize: Option[Int] = None): DataFrame =
    candidatePairs(sigBands(sigs), maxBandSize)

  /** The LSH candidate equi-join over a (doc_id, sig, band, key)
    * banding frame — shared by the shuffle-free per-row path and the
    * shared-shingle groupBy path. `carryN = true` additionally expects
    * an `n_sh` column (per-doc distinct-shingle count) on the banding
    * frame and forwards it as (n_a, n_b) — [[nearDupPairs]]'s fast
    * verification consumes those instead of re-aggregating the corpus
    * shingle frame. */
  private def candidatePairs(
      bandsRaw: DataFrame, maxBandSize: Option[Int] = None,
      carryN: Boolean = false): DataFrame = {
    val bands = capBandSize(bandsRaw, maxBandSize)
    val matches =
      expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))")
    val base = Seq(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
      (matches.cast("double") / NumMinHashes).as("est_jaccard"))
    val cols =
      if (carryN) base ++ Seq(col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      else base
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(cols: _*)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Width of the SimHash in bits. 48 keeps the value positive in a
    * signed 64-bit long while being wide enough that unrelated
    * documents rarely collide within small Hamming distances (32 bits
    * measurably floods the candidate join on small-vocabulary
    * corpora).
    */
  val SimHashBits = 48
  /** 4 LSH blocks of 12 bits (pigeonhole: any pair within Hamming
    * distance 3 shares a block). */
  val SimHashBlockBits: Int = SimHashBits / 4

  /** SimHash over (non-distinct) tokens: bit b of the hash is the
    * majority vote of bit b across all token hashes. The bit sums ride
    * a single aggregation.
    */
  def simHash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(textCol)).as("t"))
      .withColumn("h", md5Hash60(col("t")))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(shiftright(col("h"), b) % 2 * 2 - 1).as(s"b$b")
    }
    val assembled = (0 until SimHashBits).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** SimHash near-dup candidates: docs sharing any of the four 12-bit
    * blocks are candidates (any pair within Hamming distance 3 must
    * share a block — pigeonhole); the exact Hamming distance filters
    * them. Block join keeps this linear-ish, never all-pairs.
    */
  def simHashCandidates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs).cache()
    val blocks = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"),
          (shiftright(col("simhash"), b * SimHashBlockBits) %
            (1 << SimHashBlockBits)).as("v"))): _*))
        .as("bv"))
      .select(col("doc_id"), col("simhash"), col("bv.blk").as("blk"), col("bv.v").as("v"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** The production dedup composition at corpus scale: exact Jaccard
    * computed ONLY for given candidate pairs (from MinHash/SimHash
    * LSH), never all co-shingled pairs. The shingle join is keyed by
    * the candidate pair itself, so work is linear in candidates ×
    * shingles-per-doc.
    */
  def verifyCandidates(docs: DataFrame, pairs: DataFrame,
                       k: Int = 3): DataFrame = {
    // shingle only documents that actually appear in a candidate pair:
    // exact verification is candidate-bounded by definition, so
    // tokenizing the rest of the corpus (and caching its shingles) is
    // work the join below would discard anyway — at daily-ingest scale
    // the candidate set is ≪ the corpus (guide §2.3: project/filter
    // before the heavy pass). The pair-id branch reuses the candidate
    // frame's exchange.
    val p = pairs.select(col("doc_a"), col("doc_b")).cache()
    val ids = p
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    verifyCandidatesFromShingles(
      shingles(docs.join(ids, Seq("doc_id"), "left_semi"), k).cache(), p)
  }

  /** [[verifyCandidates]] over an existing (cached) shingle frame. */
  def verifyCandidatesFromShingles(sh: DataFrame,
                                   pairs: DataFrame): DataFrame = {
    // materialize the (candidate-bounded) pair list once: it feeds
    // FOUR plan branches below (id set, intersection probe, and the
    // left-join spine) and an unmaterialized candidate chain — an LSH
    // banding join — would be recomputed per branch (column pruning
    // makes the exchanges non-identical, so ReuseExchange cannot
    // collapse them)
    val p = pairs.select(col("doc_a"), col("doc_b")).cache()
    // per-doc counts only for docs in a pair: the counts are consumed
    // exclusively through the doc_a/doc_b joins below, so aggregating
    // non-candidate documents' shingles is a wasted corpus shuffle
    // when the caller hands a full-corpus shingle frame
    val pairIds = p
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val counts = sh.join(pairIds, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = p
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id") &&
        col("a.shingle") === col("b.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    // LEFT joins: a candidate doc too short to have any k-shingle (a
    // SimHash pair can involve a 1-token doc) must surface as
    // jaccard 0, not silently vanish from the verification output
    p
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"), "left")
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"), "left")
      .select(col("doc_a"), col("doc_b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          greatest(coalesce(col("ca.n"), lit(0L)) +
            coalesce(col("cb.n"), lit(0L)) -
            coalesce(col("inter"), lit(0L)), lit(1L)))
          .as("jaccard"))
  }

  /** Exact n-gram Jaccard over candidate pairs that share at least one
    * shingle. intersection via shingle equi-join, union by inclusion-
    * exclusion. `minJaccard` bounds the output, not the work; the work
    * is bounded by the shingle join (skew: cap document frequency of
    * shingles upstream if a corpus has heavy boilerplate).
    */
  /** Optional skew guard for the shingle joins: drop shingles present
    * in more than `maxDocFreq` documents. Boilerplate shingles (page
    * headers, license blurbs) otherwise create quadratic hot keys in
    * the candidate join at corpus scale; dropping them loses no
    * near-dup signal (a shingle shared by thousands of docs carries no
    * pair information). Off (None) in the oracle-gated queries.
    */
  /** Library default for [[ngramJaccard]]'s doc-frequency cap. A
    * shingle shared by 1000+ documents is boilerplate, not near-dup
    * signal, and each such shingle contributes O(df²) join rows — the
    * cap is what keeps the co-shingle join linear-ish on real corpora.
    * Opt out with `maxDocFreq = None` (exhaustive, oracle-exact on
    * boilerplate-free data — the capped and uncapped results agree
    * whenever no shingle exceeds the cap).
    */
  val DefaultMaxDocFreq = 1000

  /** The verified near-dup pair pipeline with ONE shingle computation:
    * the cached shingle frame feeds both signature generation (LSH
    * candidates) and the exact-Jaccard verification — the composition
    * [[verifyCandidates]]∘[[minHashCandidates]] would shingle the
    * corpus twice. This is the call production pipelines (and the
    * clustering / curation queries) should make.
    */
  def nearDupPairs(docs: DataFrame, k: Int = 3,
                   minJaccard: Double = DefaultMinJaccard,
                   maxBandSize: Option[Int] = None): DataFrame = {
    if (minJaccard <= 0.0) {
      // a zero threshold must keep zero-intersection candidates, which
      // only the left-join verification preserves
      val sh = shingles(docs, k).cache()
      val cands = minHashCandidatesFromSignatures(
        minHashSignaturesFromShingles(sh), maxBandSize)
      return verifyCandidatesFromShingles(sh, cands)
        .where(col("jaccard") >= minJaccard)
    }
    // Fast verification (r12): the signature groupBy ALREADY aggregates
    // once per document, so the per-doc distinct-shingle count rides it
    // as one extra column (n_sh) through banding into the candidate
    // pairs — the corpus-wide counts re-aggregation and the two
    // per-side left joins of [[verifyCandidatesFromShingles]] drop out
    // of the plan (guide §2.3/2.4: aggregate once, fewer shuffles).
    // The intersection join turns inner: a candidate pair sharing no
    // shingle has jaccard 0 < minJaccard and is filtered either way,
    // and with inter ≥ 1 the union n_a + n_b − inter ≥ 1 needs no
    // greatest() guard. Pair set and jaccard values are bit-identical
    // to the left-join path for any minJaccard > 0.
    val sh = shingles(docs, k).cache()
    val sigsN = sh.withColumn("h", md5HashM31(col("shingle")))
      .groupBy("doc_id")
      .agg(min(perm(col("h"), 0)).as("s0"),
        (1 until NumMinHashes).map(i => min(perm(col("h"), i)).as(s"s$i")) :+
          count(lit(1)).as("n_sh"): _*)
    val cands = candidatePairs(sigBands(sigsN, carry = Seq("n_sh")),
      maxBandSize, carryN = true)
    cands.select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id") &&
        col("a.shingle") === col("b.shingle"))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  def capDocFreq(sh: DataFrame, maxDocFreq: Option[Int]): DataFrame =
    maxDocFreq match {
      case None => sh
      case Some(cap) =>
        val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("shingle")
        sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    }

  /** Streaming exact dedup for continuous ingestion: content-hash
    * dedup with bounded state — duplicates arriving within the
    * watermark of their first copy are dropped, and state for hashes
    * older than the watermark is evicted (Spark's
    * `dropDuplicatesWithinWatermark`), so state size tracks the ingest
    * window, not corpus history. The batch [[exactFast]] pass dedups
    * across windows during compaction; this stage keeps the hot path
    * append-only.
    *
    * Keyed on (md5, length) — the 128-bit batch [[exact]] key plus the
    * length belt: a collision dropping a genuinely distinct document
    * would need two same-length texts sharing an md5, which is
    * practically impossible (vs the ~n²/2^65 odds the earlier 64-bit
    * xxhash64 key carried), so "exact" means exact here the same way
    * it does in the batch tier and the DISTINCT-text oracle.
    */
  def exactStreaming(stream: DataFrame, eventTimeCol: String,
                     watermark: String,
                     textCol: String = "text"): DataFrame =
    stream
      .withColumn("text_hash", md5(col(textCol)))
      .withColumn("text_len", length(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash", "text_len")

  /** The persistable MinHash band index of a corpus: one row per
    * (doc_id, band, key) with the full signature riding along — write
    * this once, then dedup every future ingest batch against it with
    * [[incrementalCandidates]] instead of re-banding the whole corpus.
    */
  def minHashIndex(docs: DataFrame, k: Int = 3): DataFrame =
    sigBands(minHashSignatures(docs, k))

  /** Incremental near-dup candidates: NEW documents against an
    * existing band index (plus within the new batch itself), without
    * touching the indexed corpus's text — the daily-ingest dedup shape
    * at 100 TB. Work is proportional to the new batch: it bands only
    * its own documents, and the index side of the equi-join prunes to
    * matching (band, key) buckets. Output pairs are (min, max)-ordered
    * with the LSH Jaccard estimate, exactly like
    * [[minHashCandidates]].
    */
  def incrementalCandidates(index: DataFrame, newDocs: DataFrame,
                            k: Int = 3): DataFrame = {
    // materialize the new batch's bands once: they feed BOTH join
    // branches below (vs-index and within-new), and an unmaterialized
    // band frame — a tokenize + minhash + band chain — would be
    // re-computed per branch; with one cached copy the two (band, key)
    // exchanges are also identical, so ReuseExchange shuffles the new
    // batch once
    val nb = minHashIndex(newDocs, k).cache()
    val matches =
      expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))")
    val pairCols = Seq(
      least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
      greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
      (matches.cast("double") / NumMinHashes).as("est_jaccard"))
    val vsIndex = nb.as("a").join(index.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(pairCols: _*)
    val withinNew = nb.as("a").join(nb.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(pairCols: _*)
    vsIndex.unionByName(withinNew)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Connected components over an undirected candidate-pair graph
    * `(doc_a, doc_b)` — the step that turns pairwise near-dup output
    * into duplicate CLUSTERS, the scalable Spark form of union-find
    * over LSH pairs. Iterative hash-min label propagation: every node
    * starts labeled with its own id, and each round takes the min of
    * its own and its neighbours' labels — one shuffle per round,
    * converging in O(max cluster diameter) rounds (near-dup clusters
    * are shallow stars/cliques, so 2-4 in practice; `maxIter` bounds
    * pathological chains). Each round's result is localCheckpoint'd so
    * the iteration plan stays O(1) deep — at petabyte scale use a
    * reliable checkpoint directory instead. Returns (id, comp) where
    * `comp` is the cluster's minimum doc id.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // No distinct: callers pass dropDuplicates'd (doc_a < doc_b) pairs,
    // whose two directed halves are disjoint and dup-free by
    // construction — the old edge-dedup shuffle bought nothing (and
    // even under a caller's duplicate pairs the min-aggregation is
    // multiset-insensitive, so the result is unchanged either way).
    // The edge list IS hash-partitioned by dst before caching: the
    // per-round message join keys on dst, so every iteration reuses
    // this one layout instead of re-exchanging the (large) edge frame
    // each round (guide §2.4 — operations keyed the same way share one
    // exchange).
    // one explode, not a self-union: a union references the pair plan
    // twice, and when `pairs` is an unmaterialized LSH+verify chain
    // (the incremental-clusters shape) both branches recompute it —
    // the explode emits the same two directed edges per pair from a
    // single evaluation
    val und = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst")).cache()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    // labels only ever decrease, so Σcomp is strictly monotone until
    // the fixed point — an aggregate compare detects convergence with
    // one tiny scan of the checkpointed frame, no join probe. DECIMAL
    // sum: exact and overflow-free even for 64-bit-hash ids (a long
    // sum would overflow-throw under ANSI mode).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum: java.math.BigDecimal = labelSum(labels)
    // an empty pair graph is already converged — without this, a clean
    // corpus would burn every iteration's jobs doing nothing
    var converged = prevSum == null
    var it = 0
    while (!converged && it < maxIter) {
      val msgs = und
        .join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("comp"))
        .unionByName(labels)
      // checkpoint BEFORE the self-join: a self-join on the fresh
      // aggregation's lineage trips Catalyst attribute resolution, and
      // the materialization also keeps the per-round plan O(1) deep
      val propagated = msgs.groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      // convergence is detected on the PROPAGATE fixpoint (r12): labels
      // are pointwise non-increasing through both the propagate and the
      // jump step, so an unchanged sum here means propagate moved
      // nothing — i.e. every label already equals the min over its
      // closed neighbourhood, which is exactly the component-min
      // fixpoint (any over-labelled node adjacent to the shortest path
      // toward its component min would still decrease). The pointer
      // jump is then a provable no-op (label[comp] = comp at the
      // fixpoint), so the final round skips its self-join and second
      // checkpoint outright — one fewer pass over the label frame per
      // CC invocation at any scale.
      val s = labelSum(propagated)
      if (prevSum != null && s.compareTo(prevSum) == 0) {
        labels = propagated
        converged = true
      } else {
        // pointer jumping: relabel through the current label OF the
        // label (comp is itself a node id), halving chain depth every
        // round — convergence in O(log diameter) instead of
        // O(diameter), which is what keeps a sprawling low-threshold
        // similarity graph (or an adversarial path) inside maxIter
        val parents = propagated
          .select(col("id").as("_pid"), col("comp").as("_pcomp"))
        labels = propagated
          .join(parents, col("comp") === col("_pid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("_pcomp"), col("comp")))
              .as("comp"))
          .localCheckpoint()
        prevSum = s
      }
      it += 1
    }
    und.unpersist()
    labels
  }

  /** Per-document cluster assignment over the near-dup pair graph:
    * (doc_id, comp, cluster_size, keep) — `keep` marks the cluster's
    * canonical representative (minimum doc id; comp IS that id, so the
    * flag is a comparison, no extra pass). Documents absent from the
    * pair graph are untouched singletons — filter the corpus with
    * `keep = false` rows via an anti-join to materialize the deduped
    * corpus.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, maxIter)
    // cluster size via a window over comp: one exchange, where the old
    // groupBy + join back paid the aggregation exchange AND re-shuffled
    // the label frame into the join (same rows, same counts)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("comp")
    comp.withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("id").as("doc_id"), col("comp"), col("cluster_size"),
        (col("id") === col("comp")).as("keep"))
  }

  /** The deduplicated corpus: drop every non-canonical member of every
    * near-dup cluster (broadcast anti-join — the drop set is tiny
    * relative to the corpus).
    */
  def dedupedCorpus(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val drop = duplicateClusters(pairs).where(!col("keep"))
      .select(col("doc_id"))
    // no broadcast hint: the drop set is every non-canonical duplicate,
    // which on a high-dup-rate corpus is NOT small — AQE broadcasts it
    // when it actually is, and falls back to a shuffled anti-join when
    // a forced broadcast would blow the executor/driver limits
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one k-token shingle with the eval set — the n-gram-overlap
    * contamination check every serious training pipeline runs before
    * reporting benchmark numbers. The eval shingle set is tiny relative
    * to the corpus, so it broadcasts into the corpus shingle pass: one
    * scan, no corpus shuffle, linear at any corpus size. Returns
    * (doc_id, eval_ngram_hits) for contaminated documents only;
    * anti-join the corpus against it to materialize the clean set.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
                    k: Int = 5): DataFrame = {
    val evalShingles = rawShingles(evalDocs, k)
      .select(col("shingle")).distinct()
    // corpus side stays shuffle-free: the broadcast join prunes to
    // matching rows first, and the distinct-shingle count aggregates
    // that (tiny) subset — deduplicating the whole corpus upfront
    // would shuffle every shingle once for the same answer
    rawShingles(docs, k)
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count_distinct(col("shingle")).as("eval_ngram_hits"))
  }

  /** The eval-side view of [[decontaminate]] — the report a lab
    * publishes next to a benchmark score: per eval document, how much
    * of it leaks into the training corpus (GPT-3 appendix-C /
    * PaLM-style n-gram overlap accounting). Same shuffle-free corpus
    * shape as decontaminate: the corpus is scanned once and semi-joined
    * against the broadcast eval shingle set; everything after that
    * join is eval-sized. A 100 TB corpus against a 10k-doc benchmark
    * costs one pruned scan.
    *
    * Output: ONE row per eval document — (eval_doc_id, n_shingles,
    * n_hit, hit_frac): distinct k-shingles of the eval doc, how many
    * occur anywhere in the corpus, and their ratio. Docs shorter than
    * k tokens produce no shingles and surface explicitly with
    * n_shingles = n_hit = 0 and a NULL hit_frac (no denominator) —
    * a caller summing per-benchmark coverage sees them instead of
    * silently missing rows.
    */
  def contaminationReport(docs: DataFrame, evalDocs: DataFrame,
                          k: Int = 5): DataFrame = {
    val evSh = shingles(evalDocs, k)
      .select(col("doc_id").as("eval_doc_id"), col("shingle"))
    val matched = rawShingles(docs, k)
      .join(broadcast(evSh.select("shingle").distinct()), Seq("shingle"))
      .select("shingle").distinct()
      .withColumn("hit", lit(true))
    val report = evSh.join(matched, Seq("shingle"), "left")
      .groupBy("eval_doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
      .select(col("eval_doc_id"), col("n_shingles"), col("n_hit"),
        TextAnalysis.r6(col("n_hit").cast("double") / col("n_shingles"))
          .as("hit_frac"))
    evalDocs.select(col("doc_id").as("eval_doc_id"))
      .join(report, Seq("eval_doc_id"), "left")
      .select(col("eval_doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("hit_frac"))
  }

  /** C4-style repeated-segment removal, generalized: partition each
    * document into non-overlapping `k`-token segments, count each
    * segment's exact occurrences across the corpus, and drop every
    * occurrence except the globally first (smallest (doc_id, idx)) of
    * any segment occurring at least `minOcc` times — C4 deduplicates
    * repeated lines this way, and span-level dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better")
    * removes repeated ≥k-token spans; fixed windows keep it to one
    * aggregation instead of a suffix array. The trailing partial
    * segment (< k tokens) is never a dedup candidate and is always
    * kept, so short boilerplate tails can't be mass-deleted by the
    * window phase.
    *
    * Plan shape at 100 TB: one map-side-combinable groupBy(segment)
    * for (count, first-occurrence), filtered to repeated segments
    * BEFORE the join back — on a natural corpus the repeated subset is
    * orders of magnitude smaller than the corpus, so AQE turns the
    * join into a broadcast; the reassembly groupBy(doc_id) shuffles
    * kept segments once.
    *
    * Returns (doc_id, text, n_removed) with `text` rebuilt from the
    * kept segments in order — in the [[tokens]] normalization
    * (lowercased, punctuation-split), like [[spanDedupedCorpus]]; see
    * the note there.
    */
  def segmentDedup(docs: DataFrame, k: Int = 8, minOcc: Int = 2,
                   textCol: String = "text"): DataFrame = {
    require(k > 0, s"segment length must be positive: $k")
    require(minOcc >= 2, s"minOcc below 2 would drop unique text: $minOcc")
    val toks = docs.select(col("doc_id"), tokens(textCol).as("toks"))
      .where(size(col("toks")) > 0)
    // full k-token segments at idx 0..n/k-1, plus the always-kept tail
    val segs = toks.select(col("doc_id"),
        (size(col("toks")) / k).cast("int").as("n_full"), col("toks"))
      .select(col("doc_id"), posexplode(concat(
        // sequence(0, -1) yields [0, -1] (Spark infers step -1), so a
        // sub-k-token doc must short-circuit to an empty segment list
        when(col("n_full") > 0,
          transform(sequence(lit(0), col("n_full") - 1),
            i => struct(
              concat_ws(" ", slice(col("toks"), i * k + 1, lit(k))).as("seg"),
              lit(true).as("is_full"))))
          .otherwise(array().cast("array<struct<seg:string,is_full:boolean>>")),
        when(size(col("toks")) % k > 0, array(struct(
            concat_ws(" ", slice(col("toks"), col("n_full") * k + 1, lit(k)))
              .as("seg"),
            lit(false).as("is_full"))))
          .otherwise(array().cast("array<struct<seg:string,is_full:boolean>>")))))
      .select(col("doc_id"), col("pos").as("idx"),
        col("col.seg").as("seg"), col("col.is_full").as("is_full"))
    val repeated = segs.where(col("is_full"))
      .groupBy("seg")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("idx"))).as("keeper"))
      .where(col("occ") >= minOcc)
      .select(col("seg").as("_seg"), col("keeper"))
    segs.join(repeated, col("is_full") && col("seg") === col("_seg"), "left")
      .withColumn("keep", col("_seg").isNull ||
        (col("doc_id") === col("keeper.doc_id") &&
          col("idx") === col("keeper.idx")))
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(when(col("keep"),
            struct(col("idx"), col("seg"))))),
          s => s.getField("seg"))).as(textCol),
        sum(when(!col("keep"), 1).otherwise(0)).cast("int").as("n_removed"))
  }

  /** Exact duplicated-span extraction — Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499) ExactSubstr, re-expressed for Spark: instead of
    * the paper's corpus-wide suffix array (inherently sequential to
    * build and RAM-resident to query), slide a k-token window over
    * every document, find window values occurring ≥ `minOcc` times
    * corpus-wide, and merge each document's consecutive duplicated
    * window positions into maximal spans — the token ranges a
    * span-level dedup pass would cut. A run of j duplicated windows is
    * a duplicated substring of j + k − 1 tokens, so duplicated
    * substrings of length ≥ k are recovered at suffix-array output
    * granularity without the suffix array.
    *
    * Scale shape: windows are the codegen'd zip_with fold (shared with
    * [[rawShingles]]); the dup-window set is one map-side-combinable
    * count; membership is a hash equi-join on the 60-bit window hash
    * (AQE-sized — membership costs O(df) join rows per hot window,
    * never O(df²) pairs); the island merge is a per-document window
    * function (partitionBy doc_id, no global sort).
    *
    * Output: (doc_id, span_start, span_end, span_tokens, n_windows) —
    * token positions 0-based inclusive.
    */
  /** (doc_id, pos, h): every k-token window of every document with its
    * 0-based token position and 60-bit hash — the shared input of
    * [[duplicateSpans]] (reporting) and [[spanDedupedCorpus]] (apply).
    */
  private def windowHashes(docs: DataFrame, k: Int,
                           textCol: String): DataFrame = {
    val toks = tokens(textCol)
    val shArr = (1 until k).foldLeft(toks: Column) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    docs
      .select(col("doc_id"), posexplode(shArr).as(Seq("pos", "shingle")))
      .where(col("shingle").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        Hashing.md5Hash60(col("shingle")).as("h"))
  }

  def duplicateSpans(docs: DataFrame, k: Int = 5, minOcc: Int = 2,
                     textCol: String = "text"): DataFrame = {
    require(k > 0, s"window length must be positive: $k")
    require(minOcc >= 2, s"minOcc below 2 would flag unique text: $minOcc")
    import org.apache.spark.sql.expressions.Window
    // one pass over the window hashes: the corpus-wide occurrence
    // count rides a window over h — the same shuffle the old
    // groupBy(h) paid — instead of aggregating win and joining the
    // result back onto a SECOND evaluation of win (windowHashes is an
    // unmaterialized tokenize + k-gram + md5 chain; sibling plan
    // branches do not CSE, so the join shape re-tokenized the corpus)
    val win = windowHashes(docs, k, textCol)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    win
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("occ") >= minOcc)
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k.toLong - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
  }

  /** Apply span-level dedup — the removal step of Lee et al. 2021
    * ExactSubstr: every duplicated k-window value keeps its FIRST
    * occurrence (min (doc_id, pos), the same field-lexicographic
    * keeper rule as [[segmentDedup]]) and every token covered by a
    * non-keeper duplicated window is cut; survivors re-join into the
    * cleaned text. Unlike [[segmentDedup]]'s fixed non-overlapping
    * grid, this removes duplicated runs at ANY alignment.
    *
    * Scale shape: the keeper choice rides the same combinable
    * aggregation as the dup count; coverage expansion is a bounded k×
    * explode of only the removed windows; the cut is a left-anti
    * equi-join on (doc, position); the text rebuild is the per-doc
    * sorted collect every returning-the-corpus operator here pays.
    * 100×-probed linear (BASELINE.md SPANAPPLY100X: 500k docs / 20M
    * windows with a df≈167k hot run, 46.5 s warm, closed-form removal
    * count verified).
    *
    * Output: (doc_id, text, n_removed) — n_removed in tokens.
    * NOTE the text is rebuilt from the [[tokens]] normalization
    * (lowercased, punctuation-split, whitespace collapsed), so even a
    * document with nothing removed comes back normalized — the same
    * convention as [[segmentDedup]], and unlike reference ExactSubstr
    * implementations that cut byte ranges from the original text.
    * Keep the original column alongside when byte-exact survivors
    * matter; matching is on normalized tokens either way.
    */
  /** `carry` forwards extra per-doc columns (e.g. a label the caller
    * would otherwise RE-JOIN onto the cleaned corpus) through the
    * existing final join — zero extra shuffle, same rows (r12).
    */
  def spanDedupedCorpus(docs: DataFrame, k: Int = 5, minOcc: Int = 2,
                        textCol: String = "text",
                        carry: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"window length must be positive: $k")
    require(minOcc >= 2, s"minOcc below 2 would cut unique text: $minOcc")
    import org.apache.spark.sql.expressions.Window
    // one pass over the window hashes: occurrence count and the
    // struct-min keeper ride a window over h — the same shuffle the
    // old groupBy(h) paid — instead of aggregating win and joining the
    // result back onto a SECOND evaluation of win (an unmaterialized
    // tokenize + k-gram + md5 chain that the join shape re-computed).
    // And no distinct on the covered positions: they only ever feed
    // the left-anti cut below, and an anti join is insensitive to
    // duplicate rows on its right side — deduplicating first paid a
    // full shuffle of the exploded coverage for nothing (the anti
    // join's own build side handles the ≤k-fold overlap)
    val wh = Window.partitionBy("h")
    val removed = windowHashes(docs, k, textCol)
      .withColumn("occ", count(lit(1)).over(wh))
      .withColumn("keeper",
        min(struct(col("doc_id"), col("pos"))).over(wh))
      .where(col("occ") >= minOcc &&
        !(col("doc_id") === col("keeper.doc_id") &&
          col("pos") === col("keeper.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k.toLong - 1)))
          .as("p"))
    val toksPos = docs
      .select(col("doc_id"), posexplode(tokens(textCol)).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("tok"))
    val cleaned = toksPos.join(removed, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok"))).as(textCol),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id") +:
        size(tokens(textCol)).cast("long").as("n_toks") +:
        carry.map(col): _*)
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        coalesce(col(textCol), lit("")).as(textCol) +:
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed") +:
        carry.map(col): _*)
  }

  /** Exact all-co-shingled-pairs n-gram Jaccard — the BASELINE oracle
    * the LSH→verify path ([[nearDupPairs]]) is measured against. It is
    * deliberately quadratic in co-shingled documents and must never
    * sit on a scale path; `maxDocs` enforces that contract loudly (the
    * gramMatrix discipline: a guard, not a doc comment) — pass None
    * only from a caller that has already bounded the corpus.
    */
  def ngramJaccard(docs: DataFrame, k: Int = 3,
                   minJaccard: Double = DefaultMinJaccard,
                   maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq),
                   maxDocs: Option[Long] = Some(200000L)): DataFrame = {
    maxDocs.foreach { cap =>
      // limit(cap+1) bounds the guard's own scan — a full count over
      // the corpus just to refuse it would cost what it guards against
      val n = docs.limit(math.min(cap + 1, Int.MaxValue.toLong).toInt).count()
      require(n <= cap,
        s"ngramJaccard is the quadratic exact baseline: more than $cap " +
          "documents — use the LSH->verify production path " +
          "(nearDupPairs) or pass maxDocs = None from a bounded caller")
    }
    val sh = capDocFreq(shingles(docs, k), maxDocFreq).cache()
    // NOTE (r12): carrying each doc's count through the pair join via
    // a window over doc_id was probed and is SLOWER — it sorts the
    // full shingle frame, while these two joins attach doc-sized
    // counts onto the (near-dup-pair-sized) `inter` frame, which is
    // cheap at any scale. The nearDupPairs carry-the-counts rewrite
    // paid off because there the attach re-aggregated the corpus.
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS algorithm): hash every k-token gram positionally, then keep
    * the MINIMUM hash of each sliding window of `window` consecutive
    * gram hashes. The selection guarantee: any shared run of at least
    * k + window − 1 tokens between two documents yields at least one
    * SHARED fingerprint, while only ~2/(window+1) of all gram hashes
    * are kept — a sparse index with a detection floor, where plain
    * shingle sampling (mod-p) can miss arbitrarily long overlaps.
    *
    * Everything is per-row array math (grams, window minima, distinct)
    * — no shuffle until the overlap join; the fingerprint frame is the
    * sparse index [[winnowOverlapPairs]] self-joins. Ties inside a
    * window keep one copy of the VALUE (array_distinct), which is the
    * robust-winnowing variant — position-independent, so the
    * fingerprint set is stable under document reordering edits.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 4, window: Int = 4,
                         textCol: String = "text"): DataFrame = {
    val h = (e: String) =>
      s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS LONG)"
    docs.select(col("doc_id"), tokens(textCol).as("toks"))
      .where(size(col("toks")) >= k + window - 1)
      .withColumn("kg", expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), i -> " +
          h(s"concat_ws(' ', slice(toks, i, $k))") + ")"))
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, size(kg) - ${window - 1}), " +
          s"j -> array_min(slice(kg, j, $window)))"))).as("fp"))
  }

  /** Document pairs sharing at least `minShared` winnowing
    * fingerprints — plagiarism-style overlap detection. The join is an
    * equi-join on the fingerprint value (never all-pairs); hot
    * fingerprints (boilerplate) are AQE-splittable like every LSH
    * family here.
    */
  def winnowOverlapPairs(fps: DataFrame, minShared: Int = 2): DataFrame = {
    // cache the fingerprint frame: `fps` is an unmaterialized
    // tokenize → k-gram → window-min chain and self-join branches do
    // not CSE — the uncached shape tokenized the corpus twice and
    // exchanged each evaluation separately (cached, the two fp
    // exchanges are identical and ReuseExchange collapses them)
    val f = fps.cache()
    f.as("a").join(f.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
