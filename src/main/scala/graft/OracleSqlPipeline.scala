package graft

import graft.pipeline.{Hashing, Retrieval, Similarity, TextAnalysis}
import Hashing._

/** DuckDB oracles for the corpus-pipeline operators (dedup, text
  * analysis, similarity). Generated from the same constants
  * ([[Hashing.Perms]], [[Similarity.Planes]], [[TextAnalysis.Stopwords]])
  * the Spark plans embed, so both engines execute identical math.
  */
object OracleSqlPipeline {

  /** doc_id + whitespace tokens (same regex split as the Spark side). */
  private val TOKS =
    """t AS (
      |  SELECT doc_id, lang,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  /** Distinct 3-token shingles per doc. */
  private val SH3 =
    """sh AS (
      |  SELECT DISTINCT doc_id,
      |         concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      |  FROM t, UNNEST(range(1, greatest(len(toks) - 1, 1))) u(i))""".stripMargin

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")

  /** Winnowing CTE (appended after TOKS): positional 4-gram hashes →
    * window-of-4 minima → distinct fingerprints per doc. Mirrors
    * `Dedup.winnowFingerprints(k = 4, window = 4)`.
    */
  private lazy val winnowCte: String =
    s"""tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 7),
       |kg AS (SELECT doc_id, list_transform(range(1, len(toks) - 2), i ->
       |         ${md5Hash60Sql("array_to_string(toks[i : i + 3], ' ')")})
       |         AS kgs FROM tt),
       |fp AS (SELECT DISTINCT doc_id, fp FROM (
       |         SELECT doc_id, unnest(list_transform(range(1, len(kgs) - 2),
       |           j -> list_min(kgs[j : j + 3]))) AS fp
       |         FROM kg))""".stripMargin

  /** Shared WITH-prefix for the image-dHash oracles: the analytic PNG
    * pixel law (`Multimodal.attachPngPayload`) sampled nearest-neighbor
    * onto the 9×8 dHash grid, bits packed into four 16-bit blocks —
    * identical integer math to `Multimodal.imageDHash` minus the codec
    * round-trip the Spark side actually performs.
    */
  private lazy val dhashCte: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + ((doc_id * 7) % 9) AS h
      |  FROM documents),
      |bits AS (
      |  SELECT doc_id, (y.y * 8 + x.x) // 16 AS blk,
      |    CASE WHEN ((doc_id * 31 + ((x.x * w) // 9) * 7
      |                + ((y.y * h) // 8) * 13) % 256)
      |            > ((doc_id * 31 + (((x.x + 1) * w) // 9) * 7
      |                + ((y.y * h) // 8) * 13) % 256)
      |      THEN 1 << CAST((y.y * 8 + x.x) % 16 AS INT) ELSE 0 END AS v
      |  FROM d, UNNEST(generate_series(0, 7)) x(x),
      |       UNNEST(generate_series(0, 7)) y(y)),
      |blk AS (SELECT doc_id, blk, sum(v) AS bv FROM bits GROUP BY 1, 2),
      |hash AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN blk = 0 THEN bv ELSE 0 END) AS INT) AS b0,
      |  CAST(sum(CASE WHEN blk = 1 THEN bv ELSE 0 END) AS INT) AS b1,
      |  CAST(sum(CASE WHEN blk = 2 THEN bv ELSE 0 END) AS INT) AS b2,
      |  CAST(sum(CASE WHEN blk = 3 THEN bv ELSE 0 END) AS INT) AS b3
      |  FROM blk GROUP BY doc_id)""".stripMargin

  /** Shared WITH-prefix for the BPE oracles: token occurrences
    * char-spaced with double separators (s0), then one
    * pair-count/top-1/padded-replace stage per training round
    * (p{i}/m{i}/s{i}), with (doc_id, tok) carried through so the
    * tokenize oracle can aggregate the final representation per doc.
    */
  private lazy val bpeChain: String = {
    val stages = (1 to TextAnalysis.GateBpeRounds).map { i =>
      s"""y$i AS (SELECT list_filter(string_split(sp, ' '), x -> x <> '') AS s
         |       FROM s${i - 1}),
         |p$i AS (SELECT pair, count(*) AS n FROM (
         |         SELECT unnest(list_transform(range(1, len(s)),
         |                  j -> s[j] || ' ' || s[j + 1])) AS pair
         |         FROM y$i WHERE len(s) >= 2)
         |       GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 1),
         |m$i AS (SELECT ' ' || split_part(pair, ' ', 1) || '  ' ||
         |           split_part(pair, ' ', 2) || ' ' AS pat,
         |         ' ' || replace(pair, ' ', '') || ' ' AS rep FROM p$i),
         |s$i AS (SELECT doc_id, tok, replace(sp, m.pat, m.rep) AS sp
         |       FROM s${i - 1}, m$i m)""".stripMargin
    }.mkString(",\n")
    s"""WITH $TOKS,
       |w AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |s0 AS (SELECT doc_id, tok, ' ' || array_to_string(
       |         list_transform(range(1, length(tok) + 1),
       |           i -> substring(tok, i, 1)), '  ') || ' ' AS sp
       |       FROM w),
       |$stages""".stripMargin
  }

  private val hitsCols = TextAnalysis.Stopwords.map { case (l, ws) =>
    s"CAST(len(list_filter(toks, x -> list_contains(${inList(ws)}, x))) AS INT) AS hits_$l"
  }.mkString(",\n    ")

  private val langCase = {
    val langs = TextAnalysis.Stopwords.map(_._1)
    langs.map { l =>
      val others = langs.filter(_ != l).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
      s"WHEN hits_$l > 0 AND $others THEN '$l'"
    }.mkString("CASE ", "\n       ", "\n       ELSE 'und' END")
  }

  private val sigCols = (0 until NumMinHashes)
    .map(i => s"min(${permSql("h", i)}) AS s$i").mkString(",\n    ")

  private val bandSelects = (0 until NumBands).map { b =>
    val ks = (0 until RowsPerBand).map(r => s"s${b * RowsPerBand + r}").mkString(", ")
    s"SELECT doc_id, $b AS band, concat_ws('_', $ks) AS key FROM sig"
  }.mkString("\n  UNION ALL ")

  private val sigMatches = (0 until NumMinHashes)
    .map(i => s"CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END").mkString(" + ")

  /** One definition of the MinHash-LSH candidate-pair oracle — the
    * batch gate (`dedup_minhash_lsh`) and the streaming drain
    * (`stream_dedup_minhash`) assert the SAME pair set, which is the
    * streaming operator's whole contract. */
  private lazy val MINHASH_LSH_SQL =
    s"""WITH $TOKS,
       |$SH3,
       |hs AS (SELECT doc_id, ${md5HashM31Sql("shingle")} AS h FROM sh),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  round(($sigMatches)::DOUBLE / $NumMinHashes, 6) AS est_jaccard
       |FROM pairs
       |JOIN sig sa ON doc_a = sa.doc_id
       |JOIN sig sb ON doc_b = sb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  private val bitSumCols = (0 until graft.pipeline.Dedup.SimHashBits)
    .map(b => s"sum(((h >> $b) & 1) * 2 - 1) AS b$b").mkString(",\n    ")

  private val simhashExpr = (0 until graft.pipeline.Dedup.SimHashBits)
    .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)")
    .mkString(" + ")

  private def planeArray(t: Int, p: Int): String =
    Similarity.planes(t, Similarity.NumPlanes)(p)
      .map(c => if (c > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]::DOUBLE[]")

  private def bucketExpr(t: Int): String =
    (0 until Similarity.NumPlanes).map { p =>
      s"(CASE WHEN list_dot_product(v, ${planeArray(t, p)}) >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")

  /** One row per (vector, hash table) — mirror of Similarity's
    * multi-table bucketing with the same plane constants.
    */
  private val bucketedCte: String =
    "b AS (\n" + (0 until Similarity.NumTables).map { t =>
      s"  SELECT vec_id, v, $t AS tbl, ${bucketExpr(t)} AS bucket FROM e"
    }.mkString("\n  UNION ALL\n") + ")"

  private val enList = inList(TextAnalysis.Stopwords.head._2)

  /** Full-corpus duplicate clusters — shared by the from-scratch gate
    * (`dedup_clusters`) and the incremental-maintenance gate
    * (`dedup_clusters_incremental`), which must serve the identical
    * cluster set without re-banding the old corpus. */
  private lazy val CLUSTERS_SQL =
    s"""WITH RECURSIVE $CLUSTER_COMP,
       |sizes AS (SELECT comp, count(*) AS cluster_size FROM comp GROUP BY 1)
       |SELECT c.id AS doc_id, c.comp, s.cluster_size,
       |       (c.id = c.comp) AS keep
       |FROM comp c JOIN sizes s USING (comp)
       |ORDER BY doc_id""".stripMargin

  /** The full verified-near-dup → connected-components pipeline through
    * the `comp` CTE (id → min-id component) — shared by the clustering
    * and leakage-safe-split oracles so both gate the identical graph.
    */
  private lazy val CLUSTER_COMP = s"""$TOKS,
$SH3,
hs AS (SELECT doc_id, ${md5HashM31Sql("shingle")} AS h FROM sh),
sig AS (SELECT doc_id,
    $sigCols
  FROM hs GROUP BY doc_id),
bands AS (
  $bandSelects),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p
  JOIN sh a ON p.doc_a = a.doc_id
  JOIN sh b ON p.doc_b = b.doc_id AND a.shingle = b.shingle
  GROUP BY 1, 2),
vp AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  LEFT JOIN inter ON p.doc_a = inter.doc_a AND p.doc_b = inter.doc_b
  JOIN cnt ca ON p.doc_a = ca.doc_id
  JOIN cnt cb ON p.doc_b = cb.doc_id
  WHERE coalesce(i, 0)::DOUBLE / (ca.n + cb.n - coalesce(i, 0)) >= ${graft.pipeline.Dedup.DefaultMinJaccard}),
und AS (SELECT doc_a AS src, doc_b AS dst FROM vp
        UNION SELECT doc_b, doc_a FROM vp),
nodes AS (SELECT DISTINCT src AS id FROM und),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY 1)"""

  /** The full count-min heavy-hitters query (shared by the standalone
    * gate and the stopword-density composition's nested CTE).
    */
  private lazy val heavyHittersSql: String = {
    val d = TextAnalysis.CmsDepth
    val wdt = TextAnalysis.CmsWidth
    def bucket(i: Int) = s"(${permSql("h", i)} % $wdt)"
    val skRows = (0 until d).map(i =>
      s"SELECT $i AS i, ${bucket(i)} AS bucket FROM wh").mkString(
      "\n         UNION ALL\n         ")
    // LEFT joins + coalesce(0): the Spark side answers external
    // candidates (whose bucket may be globally empty) with 0, never a
    // dropped row — the mirror must match that contract
    val joins = (0 until d).map(i =>
      s"LEFT JOIN (SELECT bucket, cnt AS c$i FROM sk WHERE i = $i) s$i" +
        s" ON s$i.bucket = ${bucket(i)}").mkString("\n        ")
    val leastOf = (0 until d).map(i => s"coalesce(c$i, 0)")
      .mkString("least(", ", ", ")")
    s"""WITH $TOKS,
       |w AS (SELECT unnest(toks) AS tok FROM t),
       |wh AS (SELECT ${md5HashM31Sql("tok")} AS h FROM w),
       |sk AS (SELECT i, bucket, count(*) AS cnt FROM (
       |         $skRows
       |       ) GROUP BY i, bucket),
       |cand AS (SELECT DISTINCT tok, ${md5HashM31Sql("tok")} AS h FROM w)
       |SELECT tok, CAST($leastOf AS BIGINT) AS est_count
       |FROM cand
       |        $joins
       |ORDER BY est_count DESC, tok ASC LIMIT 25""".stripMargin
  }

  /** Shared fragments between the standalone stop-density / TF-IDF
    * mirrors and the pipeline_curate3 composition — factored so a fix
    * to either cannot drift from the other (requires `t` from TOKS,
    * and `hh` for the stop-density pair).
    */
  private val stopDensityCtes: String =
    """tr AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      |st AS (SELECT doc_id, count(*) AS n_stop
      |       FROM tr JOIN hh USING (tok) GROUP BY doc_id)""".stripMargin

  private val stopFracExpr: String =
    """CAST(CAST(round(coalesce(st.n_stop, 0)::DOUBLE / len(toks)
      |      * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0""".stripMargin

  /** TF-IDF scoring chain over a (doc_id, tok) rows CTE. */
  private def tfidfScoreCtes(tokRows: String): String =
    s"""tf AS (SELECT doc_id, tok, count(*) AS tf FROM $tokRows GROUP BY 1, 2),
       |dfc AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |sc AS (SELECT doc_id, tok, tf,
       |         CAST(CAST(round(tf * (ln((1.0 + n_docs) / (1.0 + df))
       |           + 1.0) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0
       |           AS score
       |       FROM tf JOIN dfc USING (tok) CROSS JOIN n)""".stripMargin

  val all: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    // mirror of Dedup.rateBySource: the exact-dedup groups joined back
    // per source, exact integer counts, scaled 6dp removal rate
    "dedup_rate_by_source" ->
      """WITH g AS (
        |  SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
        |         count(*) AS n_copies
        |  FROM documents GROUP BY 1),
        |d AS (
        |  SELECT source, doc_id, md5(text) AS text_hash FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(coalesce(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_duplicated,
        |  CAST(coalesce(sum(CASE WHEN doc_id != keeper_id THEN 1 ELSE 0 END),
        |    0) AS BIGINT) AS n_removed,
        |  CAST(CAST(round(CAST(coalesce(sum(CASE WHEN doc_id != keeper_id
        |      THEN 1 ELSE 0 END), 0) AS DOUBLE) / count(*) * 1000000.0)
        |    AS BIGINT) AS DOUBLE) / 1e6 AS removal_rate
        |FROM d JOIN g USING (text_hash)
        |GROUP BY 1 ORDER BY source""".stripMargin,

    // SparkEntry doc_jsonl_roundtrip — the JSONL write+read must be
    // the identity, so the oracle is the parquet original
    "doc_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // graft.pipeline.Dedup.bloomNewDocs — the bloom prefilter + exact
    // confirm is semantically the plain anti-join, which is exactly
    // what the oracle states.
    "dedup_bloom_new" ->
      """WITH batch AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN doc_id % 8 = 0 THEN text || ' graftnew'
        |              ELSE text END AS text
        |  FROM documents WHERE doc_id % 4 = 0)
        |SELECT b.doc_id, b.lang FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM documents h WHERE h.text = b.text)
        |ORDER BY doc_id""".stripMargin,

    "dedup_minhash_lsh" -> MINHASH_LSH_SQL,

    // the STREAMING near-dup drain serves the batch candidate set row
    // for row (exactly-once cross-band emission via the first-shared-
    // band rule), so the gate states that by sharing the batch oracle
    "stream_dedup_minhash" -> MINHASH_LSH_SQL,

    // the horizon-TTL stream: event time is doc_id minutes, horizon
    // 500 minutes, so the within-horizon rule is |doc_b - doc_a| <=
    // 500 — the batch pair set under that filter IS the contract
    "stream_dedup_minhash_ttl" ->
      s"""SELECT doc_a, doc_b, est_jaccard FROM ($MINHASH_LSH_SQL) t
         |WHERE doc_b - doc_a <= 500
         |ORDER BY doc_a, doc_b""".stripMargin,

    // capBandSize guard parity: buckets of more than 4 docs are
    // removed from the banding frame before pairing — same filter,
    // same surviving pairs, on both engines
    "dedup_minhash_lsh_capped" ->
      s"""WITH $TOKS,
         |$SH3,
         |hs AS (SELECT doc_id, ${md5HashM31Sql("shingle")} AS h FROM sh),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM hs GROUP BY doc_id),
         |bands0 AS (
         |  $bandSelects),
         |hot AS (SELECT band, key FROM bands0
         |        GROUP BY band, key HAVING count(*) > 4),
         |bands AS (SELECT b.* FROM bands0 b
         |          WHERE NOT EXISTS (SELECT 1 FROM hot h
         |            WHERE h.band = b.band AND h.key = b.key)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(($sigMatches)::DOUBLE / $NumMinHashes, 6) AS est_jaccard
         |FROM pairs
         |JOIN sig sa ON doc_a = sa.doc_id
         |JOIN sig sb ON doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_verified" ->
      s"""WITH $TOKS,
         |$SH3,
         |hs AS (SELECT doc_id, ${md5HashM31Sql("shingle")} AS h FROM sh),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM hs GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT p.doc_a, p.doc_b, count(*) AS i
         |  FROM pairs p
         |  JOIN sh a ON p.doc_a = a.doc_id
         |  JOIN sh b ON p.doc_b = b.doc_id AND a.shingle = b.shingle
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |  round(coalesce(i, 0)::DOUBLE /
         |        (ca.n + cb.n - coalesce(i, 0)), 6) AS jaccard
         |FROM pairs p
         |LEFT JOIN inter ON p.doc_a = inter.doc_a AND p.doc_b = inter.doc_b
         |JOIN cnt ca ON p.doc_a = ca.doc_id
         |JOIN cnt cb ON p.doc_b = cb.doc_id
         |WHERE coalesce(i, 0)::DOUBLE / (ca.n + cb.n - coalesce(i, 0)) >= ${graft.pipeline.Dedup.DefaultMinJaccard}
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    // incremental candidates ≡ all band-bucket pairs with at least one
    // NEW (doc_id % 4 = 0) side — the set the Spark side produces as
    // (new × index) ∪ (new × new)
    "dedup_incremental" ->
      s"""WITH $TOKS,
         |$SH3,
         |hs AS (SELECT doc_id, ${md5HashM31Sql("shingle")} AS h FROM sh),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM hs GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)
         |SELECT doc_a, doc_b,
         |  round(($sigMatches)::DOUBLE / $NumMinHashes, 6) AS est_jaccard
         |FROM pairs
         |JOIN sig sa ON doc_a = sa.doc_id
         |JOIN sig sb ON doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // duplicate clusters over the verified near-dup pair graph:
    // transitive closure + min-label in a recursive CTE mirrors the
    // Spark side's hash-min label propagation (both converge to
    // comp = min doc id of the connected component)
    "dedup_clusters" -> CLUSTERS_SQL,

    // incremental cluster maintenance serves the FROM-SCRATCH cluster
    // set (candidate-pair algebra: old-vs-old ∪ pairs-involving-new is
    // exactly the full banding join), so the gate shares the
    // full-corpus oracle
    "dedup_clusters_incremental" -> CLUSTERS_SQL,

    // leakage-safe split: the SAME verified near-dup components, every
    // cluster hash-assigned atomically via its canonical (min-id)
    // representative; singletons hash on their own id = sample_split
    "sample_split_safe" ->
      s"""WITH RECURSIVE $CLUSTER_COMP
         |SELECT doc_id,
         |  CASE WHEN u < 0.8 THEN 'train'
         |       WHEN u < 0.9 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT d.doc_id,
         |        (('0x' || substr(md5(coalesce(c.comp, d.doc_id)::VARCHAR || 'split'), 1, 15))::BIGINT
         |         / 1152921504606846976.0) AS u
         |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
         |ORDER BY doc_id""".stripMargin,

    // per-language data-card stats; quantile_cont uses the same linear
    // interpolation as Spark's exact percentile. All 6dp roundings use
    // the scaled multiply→round(0)→divide sequence mirroring
    // TextAnalysis.r6 — plain round(x, 6) diverges at 6dp ties; mean is
    // the explicit Σ/n of exact integers, never avg().
    "corpus_stats" ->
      s"""WITH n AS (
         |  SELECT lang,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(CAST(round(CAST(sum(n_tokens) AS DOUBLE) / count(*) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS mean_tokens,
         |  CAST(CAST(round(quantile_cont(n_tokens, 0.5) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS p50_tokens,
         |  CAST(CAST(round(quantile_cont(n_tokens, 0.9) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS p90_tokens,
         |  CAST(CAST(round(quantile_cont(n_tokens, 0.99) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS p99_tokens
         |FROM n GROUP BY lang ORDER BY lang""".stripMargin,

    // PII scrubbing over deterministically salted text: counts on the
    // original, replacements email -> ip -> phone, result hashed (the
    // regex subset used has identical RE2/Java semantics)
    "text_redact_pii" -> {
      import graft.pipeline.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text || ' contact u' || doc_id || '@example.com at 10.0.' ||
         |    (doc_id % 256) || '.7 or 555-867-' ||
         |    format('{:04d}', doc_id % 10000) AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS email_count,
         |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS ip_count,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS phone_count,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailRe', '[EMAIL]', 'g'),
         |    '$Ipv4Re', '[IP]', 'g'),
         |    '$PhoneRe', '[PHONE]', 'g')) AS clean_md5
         |FROM p ORDER BY doc_id""".stripMargin
    },

    // decontamination: corpus docs sharing any 3-token shingle with the
    // (doc_id % 11 = 0) eval subset — eval shingles are the broadcast
    // side on the Spark plan, a plain semi-join-and-count here
    // mirror of TextAnalysis.bpePairCounts at topK 30: adjacent char
    // pairs per token occurrence, deterministic (cnt desc, pair asc)
    "text_bpe_pairs" ->
      s"""WITH $TOKS,
         |w AS (SELECT unnest(toks) AS tok FROM t),
         |p AS (SELECT substring(tok, i, 2) AS pair
         |      FROM w, UNNEST(range(1, length(tok))) u(i)
         |      WHERE length(tok) >= 2)
         |SELECT pair, count(*) AS n_occurrences FROM p GROUP BY pair
         |ORDER BY n_occurrences DESC, pair ASC LIMIT 30""".stripMargin,

    // mirror of TextAnalysis.bpeApplyTopMerge: top pair by
    // (count desc, pair asc), literal space-collapse replace — each
    // application removes exactly one character
    "text_bpe_merged" ->
      s"""WITH $TOKS,
         |w AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |pc AS (SELECT substring(tok, i, 2) AS pair, count(*) AS c
         |       FROM w, UNNEST(range(1, length(tok))) u(i)
         |       WHERE length(tok) >= 2
         |       GROUP BY pair ORDER BY c DESC, pair ASC LIMIT 1),
         |m AS (SELECT pat, rep FROM (
         |        SELECT substring(pair, 1, 1) || ' ' || substring(pair, 2, 1)
         |          AS pat, pair AS rep, 0 AS prio FROM pc
         |        UNION ALL
         |        SELECT chr(0) || ' ' || chr(0), chr(0) || chr(0), 1)
         |      ORDER BY prio LIMIT 1),
         |sp AS (SELECT doc_id, tok,
         |         array_to_string(list_transform(range(1, length(tok) + 1),
         |           i -> substring(tok, i, 1)), ' ') AS spaced
         |       FROM w),
         |x AS (SELECT doc_id, length(tok) AS ub,
         |        length(spaced) - length(replace(spaced, pat, rep)) AS merges
         |      FROM sp, m)
         |SELECT doc_id, CAST(sum(ub) AS BIGINT) AS n_units_before,
         |  CAST(sum(ub) - sum(merges) AS BIGINT) AS n_units_after,
         |  CAST(sum(merges) AS BIGINT) AS n_merges_applied
         |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.bpeTrain at GateBpeRounds: the full merge
    // loop unrolled — one pair-count + top-1 + padded literal replace
    // per round (double-space separators make the replace an exact
    // leftmost greedy merge; see bpeTrain's doc comment)
    "text_bpe_vocab" -> {
      val union = (1 to TextAnalysis.GateBpeRounds).map { i =>
        s"""SELECT CAST($i AS INT) AS round,
           |  split_part(pair, ' ', 1) AS lhs, split_part(pair, ' ', 2) AS rhs,
           |  replace(pair, ' ', '') AS pair, n AS n_occurrences FROM p$i"""
          .stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""$bpeChain
         |SELECT * FROM (
         |  $union
         |) ORDER BY round""".stripMargin
    },

    // mirror of TextAnalysis.bpeTokenize over bpeTrain's merges: the
    // final representation s{K} of the same chain, aggregated per doc
    "text_bpe_tokenize" -> {
      val k = TextAnalysis.GateBpeRounds
      s"""$bpeChain
         |SELECT doc_id, CAST(sum(length(tok)) AS BIGINT) AS n_chars,
         |  CAST(sum(len(list_filter(string_split(sp, ' '), x -> x <> '')))
         |    AS BIGINT) AS n_subwords,
         |  count(*) AS n_tokens,
         |  CAST(CAST(round(sum(length(tok))::DOUBLE /
         |    sum(len(list_filter(string_split(sp, ' '), x -> x <> '')))
         |    * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS compression
         |FROM s$k GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // mirror of Retrieval.bm25TopK (k1 = 1.2, b = 0.75, Lucene idf):
    // every float input is an exact integer, the per-term expression
    // shares one evaluation order with the Spark plan, per-doc term
    // sums ride DECIMAL(38,12)
    "text_bm25_topk" -> {
      val q = Retrieval.GateQuery.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $TOKS,
         |d AS (SELECT doc_id, len(toks) AS dl,
         |        list_filter(toks, x -> list_contains($q, x)) AS q
         |      FROM t),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
         |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM (
         |         SELECT doc_id, dl, unnest(q) AS tok FROM d WHERE len(q) > 0)
         |       GROUP BY doc_id, dl, tok),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |sc AS (SELECT tf.doc_id,
         |        CAST(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
         |          ((tf * 2.2) / (tf + 1.2 * (0.25 +
         |            0.75 * CAST(dl AS DOUBLE) * n_docs / sum_dl)))
         |          AS DECIMAL(38,12)) AS contrib
         |      FROM tf JOIN df USING (tok), stats)
         |SELECT doc_id, count(*) AS n_query_terms,
         |  CAST(round(sum(contrib), 6) AS DOUBLE) AS score
         |FROM sc GROUP BY doc_id
         |ORDER BY sum(contrib) DESC, doc_id ASC LIMIT 25""".stripMargin
    },

    // mirror of Sampling.dsirWeights: add-one-smoothed unigram
    // log-ratios over the joint vocabulary, target = doc_id % 11 = 0
    "sample_dsir_weights" ->
      s"""WITH $TOKS,
         |occ_r AS (SELECT doc_id, unnest(toks) AS tok FROM t
         |          WHERE doc_id % 11 <> 0),
         |occ_t AS (SELECT doc_id, unnest(toks) AS tok FROM t
         |          WHERE doc_id % 11 = 0),
         |cr AS (SELECT tok, count(*) AS c_r FROM occ_r GROUP BY tok),
         |ct AS (SELECT tok, count(*) AS c_t FROM occ_t GROUP BY tok),
         |vocab AS (SELECT coalesce(cr.tok, ct.tok) AS tok,
         |            coalesce(c_r, 0) AS c_r, coalesce(c_t, 0) AS c_t
         |          FROM cr FULL OUTER JOIN ct ON cr.tok = ct.tok),
         |tot AS (SELECT sum(c_r) AS tot_r, sum(c_t) AS tot_t,
         |          count(*) AS v FROM vocab),
         |wt AS (SELECT tok,
         |        CAST(ln((c_t + 1.0) / (tot_t + v))
         |           - ln((c_r + 1.0) / (tot_r + v))
         |          AS DECIMAL(38,12)) AS w
         |      FROM vocab, tot)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(round(sum(w), 6) AS DOUBLE) AS logw
         |FROM occ_r JOIN wt USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of Sampling.dsirResample (n = 60, salt 'dsir'):
    // Gumbel-top-k keys from the md5 uniform; the add narrows to
    // DECIMAL(30,12) (38+38 would exceed DuckDB's width ceiling)
    "sample_dsir_select" ->
      s"""WITH $TOKS,
         |occ_r AS (SELECT doc_id, unnest(toks) AS tok FROM t
         |          WHERE doc_id % 11 <> 0),
         |occ_t AS (SELECT doc_id, unnest(toks) AS tok FROM t
         |          WHERE doc_id % 11 = 0),
         |cr AS (SELECT tok, count(*) AS c_r FROM occ_r GROUP BY tok),
         |ct AS (SELECT tok, count(*) AS c_t FROM occ_t GROUP BY tok),
         |vocab AS (SELECT coalesce(cr.tok, ct.tok) AS tok,
         |            coalesce(c_r, 0) AS c_r, coalesce(c_t, 0) AS c_t
         |          FROM cr FULL OUTER JOIN ct ON cr.tok = ct.tok),
         |tot AS (SELECT sum(c_r) AS tot_r, sum(c_t) AS tot_t,
         |          count(*) AS v FROM vocab),
         |wt AS (SELECT tok,
         |        CAST(ln((c_t + 1.0) / (tot_t + v))
         |           - ln((c_r + 1.0) / (tot_r + v))
         |          AS DECIMAL(38,12)) AS w
         |      FROM vocab, tot),
         |lw AS (SELECT doc_id, count(*) AS n_tokens, sum(w) AS logw_exact
         |       FROM occ_r JOIN wt USING (tok) GROUP BY doc_id),
         |k AS (SELECT doc_id, n_tokens,
         |        CAST(round(logw_exact, 6) AS DOUBLE) AS logw,
         |        CAST(logw_exact AS DECIMAL(30,12)) +
         |          CAST(-ln(-ln(greatest(
         |            ('0x' || substr(md5(doc_id::VARCHAR || 'dsir'), 1, 15))::BIGINT
         |            / 1152921504606846976.0, 1e-18)))
         |          AS DECIMAL(30,12)) AS key_exact
         |      FROM lw)
         |SELECT doc_id, n_tokens, logw,
         |  CAST(round(key_exact, 6) AS DOUBLE) AS key
         |FROM (SELECT * FROM k
         |      ORDER BY key_exact DESC, doc_id ASC LIMIT 60)
         |ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.bigramScore (alpha = 0.4): stupid-backoff
    // bigram LM, target = doc_id % 11 = 0 scored against the rest
    "text_bigram_score" ->
      s"""WITH $TOKS,
         |tgt AS (SELECT doc_id, toks FROM t
         |        WHERE doc_id % 11 = 0 AND len(toks) >= 2),
         |refc AS (SELECT doc_id, toks FROM t WHERE doc_id % 11 <> 0),
         |runi AS (SELECT tok, count(*) AS c1 FROM (
         |           SELECT unnest(toks) AS tok FROM refc) GROUP BY tok),
         |rtot AS (SELECT sum(c1) AS tr, count(*) AS vr FROM runi),
         |rbi AS (SELECT u, w, count(*) AS c2 FROM (
         |          SELECT toks[i] AS u, toks[i + 1] AS w
         |          FROM refc, UNNEST(range(1, len(toks))) g(i)
         |          WHERE len(toks) >= 2) GROUP BY u, w),
         |bis AS (SELECT u, w, CAST(ln(c2::DOUBLE / c1) AS DECIMAL(38,12))
         |          AS w_bi
         |        FROM rbi JOIN runi ON rbi.u = runi.tok),
         |back AS (SELECT tok AS w,
         |           CAST(ln(0.4 * (c1 + 1) / (tr + vr)) AS DECIMAL(38,12))
         |             AS w_back
         |         FROM runi, rtot),
         |occ AS (SELECT doc_id, toks[i] AS u, toks[i + 1] AS w
         |        FROM tgt, UNNEST(range(1, len(toks))) g(i))
         |SELECT doc_id, count(*) AS n_scored,
         |  round(CAST(sum(coalesce(w_bi, w_back,
         |      CAST(ln(0.4 * 1.0 / (tr + vr)) AS DECIMAL(38,12))))
         |    AS DOUBLE) / count(*), 6) AS avg_logprob
         |FROM occ LEFT JOIN bis USING (u, w) LEFT JOIN back USING (w), rtot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of Dedup.duplicateSpans at k=5: 0-based window positions,
    // 60-bit window hash, corpus-wide occ >= 2, gap-and-island merge
    "dedup_dup_spans" ->
      s"""WITH $TOKS,
         |win AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ${md5Hash60Sql(
             "concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])")} AS h
         |  FROM t, UNNEST(range(1, greatest(len(toks) - 3, 1))) g(i)),
         |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
         |isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM win JOIN dup USING (h))
         |SELECT doc_id,
         |  CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
         |  CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_tokens,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin,

    // mirror of Dedup.spanDedupedCorpus at k=5: struct-min keeper per
    // duplicated window value, k-position coverage expansion of
    // non-keeper windows, anti-join cut, ordered text rebuild
    "dedup_span_apply" ->
      s"""WITH $TOKS,
         |tp AS (SELECT doc_id, i - 1 AS p, toks[i] AS tok
         |       FROM t, UNNEST(range(1, len(toks) + 1)) g(i)),
         |win AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ${md5Hash60Sql(
             "concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])")} AS h
         |  FROM t, UNNEST(range(1, greatest(len(toks) - 3, 1))) g(i)),
         |rep AS (
         |  SELECT h, min(struct_pack(d := doc_id, p := pos)) AS keeper
         |  FROM win GROUP BY h HAVING count(*) >= 2),
         |rm AS (
         |  SELECT DISTINCT w.doc_id, w.pos + j AS p
         |  FROM win w JOIN rep USING (h), UNNEST(range(5)) u(j)
         |  WHERE NOT (w.doc_id = struct_extract(rep.keeper, 'd')
         |             AND w.pos = struct_extract(rep.keeper, 'p'))),
         |keep AS (
         |  SELECT tp.doc_id, tp.p, tp.tok
         |  FROM tp LEFT JOIN rm ON tp.doc_id = rm.doc_id AND tp.p = rm.p
         |  WHERE rm.p IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text2,
         |         count(*) AS n_kept
         |  FROM keep GROUP BY doc_id),
         |base AS (SELECT doc_id, len(toks) AS n FROM t)
         |SELECT base.doc_id, COALESCE(agg.text2, '') AS text,
         |  CAST(base.n - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
         |FROM base LEFT JOIN agg USING (doc_id) ORDER BY base.doc_id""".stripMargin,

    // mirror of TextAnalysis.hashedLinearScore with the stand-in
    // weight table w(h) = (h mod 2001) - 1000: per-doc mean hashed-
    // bigram weight, exact integers until the output-edge round
    "text_quality_classifier" ->
      s"""WITH $TOKS,
         |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
         |       FROM t, UNNEST(range(1, len(toks))) g(i)
         |       WHERE len(toks) >= 2),
         |wt AS (SELECT doc_id,
         |         (${md5HashM31Sql("bigram")} % 2001) - 1000 AS w
         |       FROM bg),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
         |         CAST(sum(w) AS BIGINT) AS sw
         |       FROM wt GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(sc.n_features, 0) AS n_features,
         |       CAST(CAST(round((sc.sw::DOUBLE / sc.n_features) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS score,
         |       (sc.sw > 0) AS positive
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // mirror of the round-4/5 composition flagship: the span-apply
    // chain (its cleaned text IS space-joined normalized tokens, so
    // re-tokenization is a plain space split), the classifier trained
    // on the cleaned corpus, positive-score keep, hash split
    "pipeline_curate2" ->
      s"""WITH $TOKS,
         |tp AS (SELECT doc_id, i - 1 AS p, toks[i] AS tok
         |       FROM t, UNNEST(range(1, len(toks) + 1)) g(i)),
         |win AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    ${md5Hash60Sql(
             "concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])")} AS h
         |  FROM t, UNNEST(range(1, greatest(len(toks) - 3, 1))) g(i)),
         |rep AS (
         |  SELECT h, min(struct_pack(d := doc_id, p := pos)) AS keeper
         |  FROM win GROUP BY h HAVING count(*) >= 2),
         |rm AS (
         |  SELECT DISTINCT w.doc_id, w.pos + j AS p
         |  FROM win w JOIN rep USING (h), UNNEST(range(5)) u(j)
         |  WHERE NOT (w.doc_id = struct_extract(rep.keeper, 'd')
         |             AND w.pos = struct_extract(rep.keeper, 'p'))),
         |keep AS (
         |  SELECT tp.doc_id, tp.p, tp.tok
         |  FROM tp LEFT JOIN rm ON tp.doc_id = rm.doc_id AND tp.p = rm.p
         |  WHERE rm.p IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text2,
         |         count(*) AS n_kept
         |  FROM keep GROUP BY doc_id),
         |base AS (SELECT doc_id, len(toks) AS n FROM t),
         |clean AS (
         |  SELECT base.doc_id, COALESCE(agg.text2, '') AS text,
         |    CAST(base.n - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
         |  FROM base LEFT JOIN agg USING (doc_id)),
         |ct AS (SELECT doc_id,
         |         list_filter(string_split(text, ' '), x -> x <> '') AS toks2
         |       FROM clean),
         |bg2 AS (SELECT doc_id, toks2[i] || ' ' || toks2[i + 1] AS bigram
         |        FROM ct, UNNEST(range(1, len(toks2))) g(i)
         |        WHERE len(toks2) >= 2),
         |ft2 AS (SELECT doc_id, ${md5HashM31Sql("bigram")} AS h FROM bg2),
         |lbl AS (SELECT doc_id,
         |          CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
         |               ELSE CAST(-1.0 AS DOUBLE) END AS label
         |        FROM documents),
         |wt AS (SELECT ft2.h AS fh, sum(lbl.label) AS weight
         |       FROM ft2 JOIN lbl USING (doc_id) GROUP BY ft2.h),
         |sc AS (SELECT ft2.doc_id, CAST(count(*) AS BIGINT) AS n_features,
         |         sum(wt.weight) AS sw
         |       FROM ft2 JOIN wt ON ft2.h = wt.fh
         |       GROUP BY ft2.doc_id),
         |scored AS (
         |  SELECT doc_id, n_features,
         |    CAST(CAST(round((sw / n_features) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
         |  FROM sc),
         |thr AS (
         |  SELECT CAST(sum(CAST(score AS DECIMAL(38,12))) AS DOUBLE)
         |           / count(*) AS thr
         |  FROM scored)
         |SELECT doc_id, n_removed, n_features, score,
         |       CASE WHEN u < 0.8 THEN 'train'
         |            WHEN u < 0.9 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (
         |  SELECT s.doc_id, clean.n_removed, s.n_features, s.score,
         |    (('0x' || substr(md5(s.doc_id::VARCHAR || 'split'), 1, 15))::BIGINT
         |     / 1152921504606846976.0) AS u
         |  FROM scored s JOIN clean ON s.doc_id = clean.doc_id
         |  WHERE s.score > (SELECT thr FROM thr))
         |ORDER BY doc_id""".stripMargin,

    // mirror of the TRAINED classifier composition: the weight table
    // is sum(label) per feature hash (±1.0 double labels from lang),
    // then the same per-doc mean-weight score as the stand-in gate.
    // Every sum is of integer-valued doubles — order-independent exact.
    "text_classifier_trained" ->
      s"""WITH $TOKS,
         |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram
         |       FROM t, UNNEST(range(1, len(toks))) g(i)
         |       WHERE len(toks) >= 2),
         |ft AS (SELECT doc_id, ${md5HashM31Sql("bigram")} AS h FROM bg),
         |lbl AS (SELECT doc_id,
         |          CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
         |               ELSE CAST(-1.0 AS DOUBLE) END AS label
         |        FROM documents),
         |wt AS (SELECT ft.h AS feature_hash, sum(lbl.label) AS weight
         |       FROM ft JOIN lbl USING (doc_id) GROUP BY ft.h),
         |sc AS (SELECT ft.doc_id, CAST(count(*) AS BIGINT) AS n_features,
         |         sum(wt.weight) AS sw
         |       FROM ft JOIN wt ON ft.h = wt.feature_hash
         |       GROUP BY ft.doc_id)
         |SELECT d.doc_id,
         |       coalesce(sc.n_features, 0) AS n_features,
         |       CAST(CAST(round((sc.sw::DOUBLE / sc.n_features) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS score,
         |       (sc.sw > 0) AS positive
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // mirror of Sampling.qualityBucketSample (rates .1/.3/.6/.9,
    // vocab 20): unigram-score quantile thresholds (scaled-round 6dp),
    // comparison-chain bucketing, salted-hash Bernoulli keep
    "sample_quality_bucket" ->
      s"""WITH $TOKS,
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |counts AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
         |vocab AS (SELECT tok, TRUE AS in_vocab FROM counts
         |          ORDER BY cnt DESC, tok ASC LIMIT 20),
         |scored AS (
         |  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(CAST(round((sum(c.cnt)::DOUBLE / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS avg_token_count
         |  FROM occ o JOIN counts c USING (tok)
         |  GROUP BY o.doc_id),
         |thr AS (SELECT
         |  CAST(CAST(round(quantile_cont(avg_token_count, 0.25) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS thr1,
         |  CAST(CAST(round(quantile_cont(avg_token_count, 0.5) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS thr2,
         |  CAST(CAST(round(quantile_cont(avg_token_count, 0.75) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS thr3
         |  FROM scored),
         |bucketed AS (
         |  SELECT s.doc_id, s.n_tokens, s.avg_token_count,
         |    1 + (CASE WHEN s.avg_token_count > thr.thr1 THEN 1 ELSE 0 END)
         |      + (CASE WHEN s.avg_token_count > thr.thr2 THEN 1 ELSE 0 END)
         |      + (CASE WHEN s.avg_token_count > thr.thr3 THEN 1 ELSE 0 END)
         |      AS bucket
         |  FROM scored s, thr)
         |SELECT doc_id, n_tokens, avg_token_count, bucket
         |FROM bucketed
         |WHERE (('0x' || substr(md5(doc_id::VARCHAR || 'qb'), 1, 15))::BIGINT
         |       / 1152921504606846976.0) <
         |  CASE bucket WHEN 1 THEN 0.1 WHEN 2 THEN 0.3
         |              WHEN 3 THEN 0.6 ELSE 0.9 END
         |ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.unigramScore at vocabSize 20: corpus
    // token counts, top-V membership by (cnt desc, tok asc), per-doc
    // mean corpus count and OOV fraction as exact-integer ratios
    "text_unigram_score" ->
      s"""WITH $TOKS,
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |counts AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
         |vocab AS (SELECT tok, TRUE AS in_vocab FROM counts
         |          ORDER BY cnt DESC, tok ASC LIMIT 20)
         |SELECT o.doc_id, count(*) AS n_tokens,
         |  CAST(CAST(round((sum(c.cnt)::DOUBLE / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS avg_token_count,
         |  CAST(CAST(round((sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0
         |    AS oov_frac
         |FROM occ o JOIN counts c USING (tok) LEFT JOIN vocab v USING (tok)
         |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin,

    // mirror of Dedup.segmentDedup: non-overlapping 8-token windows,
    // repeated segments keep only the min-(doc_id, idx) occurrence,
    // the sub-k tail never dedups; struct min gives the same
    // field-lexicographic keeper as Spark's min(struct(...))
    "dedup_segments" ->
      s"""WITH $TOKS,
         |tt AS (SELECT doc_id, toks, len(toks) AS n, len(toks) // 8 AS n_full
         |       FROM t WHERE len(toks) > 0),
         |seg AS (
         |  SELECT doc_id, i AS idx,
         |         array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' ') AS seg,
         |         TRUE AS is_full
         |  FROM tt, UNNEST(range(n_full)) u(i)
         |  UNION ALL
         |  SELECT doc_id, n_full AS idx,
         |         array_to_string(toks[n_full * 8 + 1 : n], ' ') AS seg, FALSE
         |  FROM tt WHERE n % 8 > 0),
         |rep AS (
         |  SELECT seg, min(struct_pack(d := doc_id, i := idx)) AS keeper
         |  FROM seg WHERE is_full GROUP BY seg HAVING count(*) >= 2),
         |j AS (
         |  SELECT s.doc_id, s.idx, s.seg,
         |    (rep.seg IS NULL
         |      OR (s.doc_id = struct_extract(rep.keeper, 'd')
         |          AND s.idx = struct_extract(rep.keeper, 'i'))) AS keep
         |  FROM seg s LEFT JOIN rep ON s.is_full AND s.seg = rep.seg)
         |SELECT doc_id,
         |  COALESCE(string_agg(seg, ' ' ORDER BY idx) FILTER (WHERE keep), '')
         |    AS text,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS INT) AS n_removed
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_decontaminate" ->
      s"""WITH $TOKS,
         |$SH3,
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 11 = 0)
         |SELECT s.doc_id, count(*) AS eval_ngram_hits
         |FROM sh s JOIN ev USING (shingle)
         |WHERE s.doc_id % 11 <> 0
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // mirror of Dedup.contaminationReport (k=3, eval = doc_id % 11 = 0):
    // distinct eval shingles left-joined against the distinct set of
    // eval shingles present anywhere in the training split; the final
    // left join back onto the eval docs surfaces sub-k documents with
    // n_shingles = 0 and NULL hit_frac instead of omitting them
    "dedup_contamination_report" ->
      s"""WITH $TOKS,
         |$SH3,
         |ev AS (SELECT doc_id AS eval_doc_id, shingle FROM sh
         |       WHERE doc_id % 11 = 0),
         |matched AS (
         |  SELECT DISTINCT s.shingle
         |  FROM sh s JOIN (SELECT DISTINCT shingle FROM ev) e USING (shingle)
         |  WHERE s.doc_id % 11 <> 0),
         |rep AS (
         |  SELECT ev.eval_doc_id,
         |    CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(count(m.shingle) AS BIGINT) AS n_hit,
         |    CAST(CAST(round((count(m.shingle)::DOUBLE / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS hit_frac
         |  FROM ev LEFT JOIN matched m USING (shingle)
         |  GROUP BY 1)
         |SELECT d.doc_id AS eval_doc_id,
         |  coalesce(rep.n_shingles, 0) AS n_shingles,
         |  coalesce(rep.n_hit, 0) AS n_hit,
         |  rep.hit_frac
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 11 = 0) d
         |LEFT JOIN rep ON d.doc_id = rep.eval_doc_id
         |ORDER BY 1""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH $TOKS,
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |th AS (SELECT doc_id, ${md5Hash60Sql("tk")} AS h FROM tok),
         |bits AS (SELECT doc_id,
         |    $bitSumCols
         |  FROM th GROUP BY doc_id),
         |sh2 AS (SELECT doc_id, $simhashExpr AS simhash FROM bits),
         |blocks AS (
         |  SELECT doc_id, simhash, u.blk AS blk,
         |         (simhash >> (u.blk * ${graft.pipeline.Dedup.SimHashBlockBits}))
         |           % ${1 << graft.pipeline.Dedup.SimHashBlockBits} AS v
         |  FROM sh2, UNNEST(range(0, 4)) u(blk))
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM blocks a JOIN blocks b
         |  ON a.blk = b.blk AND a.v = b.v AND a.doc_id < b.doc_id
         |WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $TOKS,
         |$SH3,
         |shc AS (
         |  SELECT * FROM sh WHERE shingle IN (
         |    SELECT shingle FROM sh GROUP BY 1
         |    HAVING count(*) <= ${graft.pipeline.Dedup.DefaultMaxDocFreq})),
         |cnt AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(i::DOUBLE / (ca.n + cb.n - i), 6) AS jaccard
         |FROM inter
         |JOIN cnt ca ON doc_a = ca.doc_id
         |JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE i::DOUBLE / (ca.n + cb.n - i) >= ${graft.pipeline.Dedup.DefaultMinJaccard}
         |ORDER BY doc_a, doc_b""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE (('0x' || substr(md5(doc_id::VARCHAR || 'strat'), 1, 15))::BIGINT
         |       / 1152921504606846976.0) <
         |  CASE WHEN lang = 'fr' THEN 0.2
         |       WHEN lang = 'de' THEN 0.3
         |       WHEN lang = 'en' THEN 0.5
         |       ELSE 0.1 END
         |ORDER BY doc_id""".stripMargin,

    "sample_topn" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY
         |      (('0x' || substr(md5(doc_id::VARCHAR || 'topn'), 1, 15))::BIGINT
         |       / 1152921504606846976.0), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 40 ORDER BY doc_id""".stripMargin,

    // mirror of Sampling.interleave: hash-shuffled rank within source,
    // train_ord = rank·n_sources + source-name-rank (dense_rank ==
    // the Spark side's collected name-ordered index)
    "sample_interleave" ->
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY
         |      (('0x' || substr(md5(doc_id::VARCHAR || 'ilv'), 1, 15))::BIGINT
         |       / 1152921504606846976.0), doc_id) - 1 AS BIGINT)
         |      AS rank_in_source,
         |    CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT)
         |      AS src_idx
         |  FROM documents),
         |n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns
         |      FROM documents)
         |SELECT doc_id, source, rank_in_source,
         |  rank_in_source * ns + src_idx AS train_ord
         |FROM r CROSS JOIN n ORDER BY train_ord""".stripMargin,

    // mirror of pipeline_curate4: quality filter → global curriculum
    // position → prefix-sum shard assignment, all in the oracle's
    // sequential windows (the Spark side's distributed ordinal +
    // prefix-sum recipes must land on exactly these rows)
    // mirror of pipeline_curate5: word-count floor (Gopher rule) →
    // exact-dedup keepers among the survivors → the pack_sequences
    // chain over the surviving docs (vocab from survivors, EOS −2,
    // 64-id cut)
    "pipeline_curate5" ->
      s"""WITH wc AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      CAST(len(list_filter(string_split_regex(lower(text),
         |        '\\s+'), x -> x <> '')) AS BIGINT) AS n
         |    FROM documents)
         |  WHERE n >= 50 AND n <= 100000),
         |kept AS (SELECT d.* FROM documents d JOIN wc USING (doc_id)),
         |keepers AS (SELECT min(doc_id) AS doc_id
         |            FROM kept GROUP BY md5(text)),
         |surv AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
         |t AS (SELECT doc_id,
         |        list_filter(string_split_regex(lower(text), '\\s+'),
         |                    x -> x <> '') AS toks
         |      FROM surv),
         |u AS (SELECT tok AS token, count(*) AS c
         |      FROM t, UNNEST(toks) x(tok) GROUP BY 1),
         |r AS (SELECT token,
         |        CAST(row_number() OVER (ORDER BY c DESC, token) - 1
         |          AS INT) AS token_id
         |      FROM u QUALIFY token_id < 20),
         |p AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i+1] AS token
         |      FROM t, UNNEST(range(0, len(toks))) g(i)),
         |ids AS (SELECT p.doc_id, p.pos,
         |          CAST(coalesce(r.token_id, -1) AS INT) AS token_id
         |        FROM p LEFT JOIN r USING (token)),
         |cnt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) + 1 AS n_eff
         |        FROM t),
         |off AS (SELECT doc_id, n_eff,
         |          CAST(coalesce(sum(n_eff) OVER (ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            AS BIGINT) AS cb
         |        FROM cnt),
         |g AS (SELECT i.doc_id, o.cb + i.pos AS gpos, i.token_id
         |      FROM ids i JOIN off o USING (doc_id)
         |      UNION ALL
         |      SELECT doc_id, cb + n_eff - 1 AS gpos,
         |             CAST(-2 AS INT) AS token_id FROM off),
         |s AS (SELECT gpos // 64 AS seq_id, gpos % 64 AS seq_pos,
         |             token_id, doc_id FROM g)
         |SELECT seq_id, count(*) AS n_tokens,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  string_agg(token_id::VARCHAR, ',' ORDER BY seq_pos) AS ids
         |FROM s GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "pipeline_curate4" ->
      s"""WITH $TOKS,
         |d AS (SELECT t.doc_id,
         |        length(text)::DOUBLE AS n_chars,
         |        len(toks)::DOUBLE AS n_tokens,
         |        (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS n_digits,
         |        len(list_filter(toks, x -> list_contains($enList, x)))::DOUBLE AS stop_hits
         |      FROM documents JOIN t ON documents.doc_id = t.doc_id),
         |q AS (SELECT doc_id,
         |        round(least(1.0, (stop_hits / greatest(n_tokens, 1)) * 3) * 0.5
         |          + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 0.3 ELSE 0.0 END)
         |          + (CASE WHEN n_digits / greatest(n_chars, 1) < 0.2 THEN 0.2 ELSE 0.0 END), 6)
         |          AS quality_score,
         |        CAST(n_tokens AS BIGINT) AS n_tokens
         |      FROM d),
         |f AS (SELECT * FROM q WHERE quality_score >= 0.5),
         |o AS (SELECT doc_id, quality_score, n_tokens,
         |        row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS position
         |      FROM f),
         |c AS (SELECT doc_id, quality_score, position, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY position
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS cb
         |      FROM o)
         |SELECT doc_id, quality_score, position, n_tokens,
         |  cb // 2048 AS shard
         |FROM c ORDER BY position""".stripMargin,

    // mirror of Retrieval.hybridRrfWith over the IVF generator: the
    // same lex chain as text_hybrid_rrf, the same IVF chain as
    // sim_ivf_search (seed quantizer, nProbe 2, probe vec 0, top-50),
    // the same 1/(60+rank) fusion
    "text_hybrid_rrf_ivf" -> {
      val q = Retrieval.GateQuery.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $TOKS,
         |d AS (SELECT doc_id, len(toks) AS dl,
         |        list_filter(toks, x -> list_contains($q, x)) AS q
         |      FROM t),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
         |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM (
         |         SELECT doc_id, dl, unnest(q) AS tok FROM d WHERE len(q) > 0)
         |       GROUP BY doc_id, dl, tok),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |sc AS (SELECT tf.doc_id,
         |        CAST(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
         |          ((tf * 2.2) / (tf + 1.2 * (0.25 +
         |            0.75 * CAST(dl AS DOUBLE) * n_docs / sum_dl)))
         |          AS DECIMAL(38,12)) AS contrib
         |      FROM tf JOIN df USING (tok), stats),
         |lex0 AS (SELECT doc_id, CAST(round(sum(contrib), 6) AS DOUBLE) AS score
         |         FROM sc GROUP BY doc_id
         |         ORDER BY sum(contrib) DESC, doc_id ASC LIMIT 50),
         |lex AS (SELECT doc_id, CAST(row_number() OVER (
         |          ORDER BY score DESC, doc_id) AS INT) AS lex_rank
         |        FROM lex0),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS cluster, v AS sv FROM e ORDER BY vec_id LIMIT 8),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, seeds.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN seeds) WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id = 0),
         |pclusters AS (
         |  SELECT probe_id, pv, cluster FROM (
         |    SELECT p.probe_id, p.pv, seeds.cluster,
         |           row_number() OVER (PARTITION BY p.probe_id
         |             ORDER BY round(list_cosine_similarity(p.pv, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM probes p CROSS JOIN seeds) WHERE rn <= 2),
         |sem AS (SELECT vec_id AS doc_id, CAST(rk AS INT) AS sem_rank FROM (
         |  SELECT a.vec_id,
         |    row_number() OVER (ORDER BY
         |      round(list_cosine_similarity(pc.pv, e.v), 6) DESC,
         |      a.vec_id) AS rk
         |  FROM pclusters pc
         |  JOIN assigned a ON pc.cluster = a.cluster
         |  JOIN e ON a.vec_id = e.vec_id
         |  WHERE pc.probe_id != a.vec_id) WHERE rk <= 50),
         |fused AS (
         |  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         |    coalesce(lex_rank, 0) AS lex_rank,
         |    coalesce(sem_rank, 0) AS sem_rank,
         |    CAST(CAST(round(((CASE WHEN lex_rank IS NOT NULL
         |            THEN 1.0 / (60 + lex_rank) ELSE 0.0 END)
         |        + (CASE WHEN sem_rank IS NOT NULL
         |            THEN 1.0 / (60 + sem_rank) ELSE 0.0 END))
         |      * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS rrf
         |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         |SELECT doc_id, lex_rank, sem_rank, rrf,
         |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
         |FROM fused QUALIFY rank <= 10 ORDER BY rank""".stripMargin
    },

    // mirror of Sampling.curriculumOrder: the global easy-to-hard
    // position is a pure function of the (quality_score desc, doc_id)
    // total order, so the oracle is ONE window — the Spark side's
    // range-partition + offset recipe must land on exactly these
    // ordinals or the hash reds
    "sample_curriculum" ->
      s"""WITH $TOKS,
         |d AS (SELECT t.doc_id,
         |        length(text)::DOUBLE AS n_chars,
         |        len(toks)::DOUBLE AS n_tokens,
         |        (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS n_digits,
         |        len(list_filter(toks, x -> list_contains($enList, x)))::DOUBLE AS stop_hits
         |      FROM documents JOIN t ON documents.doc_id = t.doc_id),
         |q AS (SELECT doc_id,
         |        round(least(1.0, (stop_hits / greatest(n_tokens, 1)) * 3) * 0.5
         |          + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 0.3 ELSE 0.0 END)
         |          + (CASE WHEN n_digits / greatest(n_chars, 1) < 0.2 THEN 0.2 ELSE 0.0 END), 6)
         |          AS quality_score
         |      FROM d)
         |SELECT doc_id, quality_score,
         |  row_number() OVER (ORDER BY quality_score DESC, doc_id) AS position
         |FROM q ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.lengthQuantiles: dyadic p ∈ {.25,.5,.75}
    // over the integer n_chars make quantile_cont's interpolation
    // bit-exact against Spark's exact percentile; the ≥-median count
    // compares against the UNROUNDED median on both sides
    "text_length_quantiles" ->
      s"""WITH s AS (
         |  SELECT lang, count(*) AS n_docs,
         |    quantile_cont(n_chars, 0.25) AS p25,
         |    quantile_cont(n_chars, 0.50) AS p50,
         |    quantile_cont(n_chars, 0.75) AS p75
         |  FROM documents GROUP BY lang),
         |a AS (
         |  SELECT d.lang, count(*) AS n_above
         |  FROM documents d JOIN s ON d.lang = s.lang
         |  WHERE d.n_chars >= s.p50 GROUP BY d.lang)
         |SELECT s.lang AS lang, n_docs,
         |  round(p25, 6) AS p25, round(p50, 6) AS p50, round(p75, 6) AS p75,
         |  n_above AS n_above_median
         |FROM s JOIN a ON s.lang = a.lang ORDER BY s.lang""".stripMargin,

    // mirror of Retrieval.hybridRrf: BM25 top-50 (selected by the
    // exact decimal score, RANKED by the 6dp output score — exactly
    // the Spark side's two-stage order) fused with the cosine top-50
    // of probe vec_id 0 via 1/(60+rank) reciprocal-rank fusion,
    // scale-rounded, doc_id tie-break
    "text_hybrid_rrf" -> {
      val q = Retrieval.GateQuery.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH $TOKS,
         |d AS (SELECT doc_id, len(toks) AS dl,
         |        list_filter(toks, x -> list_contains($q, x)) AS q
         |      FROM t),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
         |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM (
         |         SELECT doc_id, dl, unnest(q) AS tok FROM d WHERE len(q) > 0)
         |       GROUP BY doc_id, dl, tok),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |sc AS (SELECT tf.doc_id,
         |        CAST(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
         |          ((tf * 2.2) / (tf + 1.2 * (0.25 +
         |            0.75 * CAST(dl AS DOUBLE) * n_docs / sum_dl)))
         |          AS DECIMAL(38,12)) AS contrib
         |      FROM tf JOIN df USING (tok), stats),
         |lex0 AS (SELECT doc_id, CAST(round(sum(contrib), 6) AS DOUBLE) AS score
         |         FROM sc GROUP BY doc_id
         |         ORDER BY sum(contrib) DESC, doc_id ASC LIMIT 50),
         |lex AS (SELECT doc_id, CAST(row_number() OVER (
         |          ORDER BY score DESC, doc_id) AS INT) AS lex_rank
         |        FROM lex0),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id = 0),
         |sem AS (SELECT vec_id AS doc_id, sem_rank FROM (
         |          SELECT c.vec_id,
         |            CAST(row_number() OVER (ORDER BY
         |              round(list_cosine_similarity(p.v, c.v), 6) DESC,
         |              c.vec_id) AS INT) AS sem_rank
         |          FROM p JOIN e c ON c.vec_id != p.vec_id)
         |        WHERE sem_rank <= 50),
         |fused AS (
         |  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         |    coalesce(lex_rank, 0) AS lex_rank,
         |    coalesce(sem_rank, 0) AS sem_rank,
         |    CAST(CAST(round(((CASE WHEN lex_rank IS NOT NULL
         |            THEN 1.0 / (60 + lex_rank) ELSE 0.0 END)
         |        + (CASE WHEN sem_rank IS NOT NULL
         |            THEN 1.0 / (60 + sem_rank) ELSE 0.0 END))
         |      * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS rrf
         |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         |SELECT doc_id, lex_rank, sem_rank, rrf,
         |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
         |FROM fused QUALIFY rank <= 10 ORDER BY rank""".stripMargin
    },

    // mirror of Sampling.packSequential: the interleave order's
    // global running token sum is ONE window here (the oracle may be
    // sequential; the Spark side must reproduce it distributed),
    // shard = exclusive-prefix-sum div budget. sum(BIGINT) widens to
    // HUGEINT in DuckDB — cast back before the integer div
    // mirror of Sampling.packSequences: the text_encode_ids vocab/id
    // chain, doc offsets as a cumulative window (the sequential
    // reference of the distributed prefix sum), EOS −2 per doc,
    // gpos // 64 cut, ids string_agg'd in seq_pos order
    "pack_sequences" ->
      s"""WITH $TOKS,
         |u AS (SELECT tok AS token, count(*) AS c
         |      FROM t, UNNEST(toks) x(tok) GROUP BY 1),
         |r AS (SELECT token,
         |        CAST(row_number() OVER (ORDER BY c DESC, token) - 1
         |          AS INT) AS token_id
         |      FROM u QUALIFY token_id < 20),
         |p AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i+1] AS token
         |      FROM t, UNNEST(range(0, len(toks))) g(i)),
         |ids AS (SELECT p.doc_id, p.pos,
         |          CAST(coalesce(r.token_id, -1) AS INT) AS token_id
         |        FROM p LEFT JOIN r USING (token)),
         |cnt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) + 1 AS n_eff
         |        FROM t),
         |off AS (SELECT doc_id, n_eff,
         |          CAST(coalesce(sum(n_eff) OVER (ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            AS BIGINT) AS cb
         |        FROM cnt),
         |g AS (SELECT i.doc_id, o.cb + i.pos AS gpos, i.token_id
         |      FROM ids i JOIN off o USING (doc_id)
         |      UNION ALL
         |      SELECT doc_id, cb + n_eff - 1 AS gpos,
         |             CAST(-2 AS INT) AS token_id FROM off),
         |s AS (SELECT gpos // 64 AS seq_id, gpos % 64 AS seq_pos,
         |             token_id, doc_id FROM g)
         |SELECT seq_id, count(*) AS n_tokens,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  string_agg(token_id::VARCHAR, ',' ORDER BY seq_pos) AS ids
         |FROM s GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "pack_sequential" ->
      s"""WITH tt AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |      x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY
         |      (('0x' || substr(md5(doc_id::VARCHAR || 'ilv'), 1, 15))::BIGINT
         |       / 1152921504606846976.0), doc_id) - 1 AS BIGINT)
         |      AS rank_in_source,
         |    CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT)
         |      AS src_idx
         |  FROM tt),
         |n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns
         |      FROM documents),
         |o AS (SELECT doc_id, source,
         |        rank_in_source * ns + src_idx AS train_ord, n_tokens
         |      FROM r CROSS JOIN n),
         |c AS (SELECT doc_id, source, train_ord, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY train_ord
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS cb
         |      FROM o)
         |SELECT doc_id, source, train_ord, n_tokens, cb // 512 AS shard
         |FROM c ORDER BY train_ord""".stripMargin,

    // mirror of Sampling.temperatureMix at nTarget 300: sqrt-weighted
    // quotas in exact integer arithmetic (floor∘sqrt of an integer is
    // engine-deterministic; halfUp division via (2a+b)//(2b)), then
    // the same salted-hash rank selection as sample_topn
    "sample_mixture" ->
      s"""WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |w AS (SELECT lang, CAST(floor(sqrt(n_docs)) AS BIGINT) AS w FROM n),
         |t AS (SELECT sum(w) AS tot FROM w),
         |q AS (SELECT w.lang,
         |        LEAST((300 * w * 2 + tot) // (tot * 2), n.n_docs) AS quota
         |      FROM w, t, n WHERE w.lang = n.lang),
         |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY
         |        (('0x' || substr(md5(doc_id::VARCHAR || 'mix'), 1, 15))::BIGINT
         |         / 1152921504606846976.0), doc_id) AS rn
         |      FROM documents)
         |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
         |WHERE rn <= quota ORDER BY doc_id""".stripMargin,

    "sample_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN u < 0.8 THEN 'train'
         |       WHEN u < 0.9 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        (('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 15))::BIGINT
         |         / 1152921504606846976.0) AS u
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "pack_greedy" ->
      s"""WITH tn AS (
         |  SELECT doc_id, lang,
         |    CAST((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 4) AS INT) AS shard,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, lang, shard, n_tokens,
         |  CAST(floor(COALESCE(sum(n_tokens) OVER (
         |    PARTITION BY lang, shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS bin
         |FROM tn ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH $TOKS,
         |h AS (SELECT doc_id, lang AS lang_actual,
         |    $hitsCols
         |  FROM t)
         |SELECT doc_id, lang_actual,
         |  ${TextAnalysis.Stopwords.map { case (l, _) => s"hits_$l" }.mkString(", ")},
         |  $langCase AS lang_detected,
         |  CAST(($langCase) = lang_actual AS INT) AS is_match
         |FROM h ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.langIdConfusion: the langid CASE over
    // stopword hits, grouped (actual, detected), scaled 6dp share
    "text_langid_confusion" ->
      s"""WITH $TOKS,
         |h AS (SELECT doc_id, lang AS lang_actual,
         |    $hitsCols
         |  FROM t),
         |c AS (SELECT lang_actual, $langCase AS lang_detected,
         |        count(*) AS n
         |      FROM h GROUP BY 1, 2)
         |SELECT lang_actual, lang_detected, n,
         |  CAST(CAST(round(CAST(n AS DOUBLE) /
         |      CAST(sum(n) OVER (PARTITION BY lang_actual) AS DOUBLE)
         |      * 1000000.0) AS BIGINT) AS DOUBLE) / 1e6 AS share
         |FROM c ORDER BY lang_actual, lang_detected""".stripMargin,

    // mirror of TextAnalysis.c4Rules: \n line segments, terminal-punct
    // + >=5-word line retention, exact integer page rules
    "text_c4_rules" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    string_split(text, chr(10)) AS lines,
        |    CAST(length(text) - length(regexp_replace(text, '[.!?]', '',
        |      'g')) AS BIGINT) AS n_sentences,
        |    contains(text, '{') AS has_brace,
        |    contains(lower(text), 'lorem ipsum') AS has_lorem
        |  FROM documents),
        |k AS (
        |  SELECT *,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l ->
        |      regexp_matches(l, '[.!?]["'']?\s*$') AND
        |      len(list_filter(string_split_regex(l, '\s+'),
        |          w -> w <> '')) >= 5)) AS BIGINT) AS n_kept_lines
        |  FROM d)
        |SELECT doc_id, n_lines, n_kept_lines, n_sentences,
        |  CAST(has_brace AS INT) AS has_brace,
        |  CAST(has_lorem AS INT) AS has_lorem,
        |  CAST(n_sentences >= 3 AND NOT has_brace AND NOT has_lorem
        |    AND n_kept_lines >= 1 AS INT) AS keep
        |FROM k ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH $TOKS,
         |d AS (SELECT t.doc_id, toks, text,
         |        length(text)::DOUBLE AS n_chars,
         |        len(toks)::DOUBLE AS n_tokens,
         |        length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE AS n_nonspace,
         |        (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS n_digits,
         |        (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g'))) AS n_punct,
         |        len(list_filter(toks, x -> list_contains($enList, x)))::DOUBLE AS stop_hits
         |      FROM documents JOIN t ON documents.doc_id = t.doc_id)
         |SELECT doc_id,
         |  CAST(n_chars AS BIGINT) AS n_chars,
         |  CAST(n_tokens AS INT) AS n_tokens,
         |  round(n_nonspace / greatest(n_tokens, 1), 6) AS avg_token_len,
         |  round(stop_hits / greatest(n_tokens, 1), 6) AS stopword_ratio,
         |  CAST(n_digits AS BIGINT) AS n_digits,
         |  CAST(n_punct AS BIGINT) AS n_punct,
         |  round(least(1.0, (stop_hits / greatest(n_tokens, 1)) * 3) * 0.5
         |    + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 0.3 ELSE 0.0 END)
         |    + (CASE WHEN n_digits / greatest(n_chars, 1) < 0.2 THEN 0.2 ELSE 0.0 END), 6)
         |    AS quality_score
         |FROM d ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.gopherRules: every rule an exact integer
    // comparison (3n ≤ Σlen ≤ 10n etc.), ratios 6dp scale-rounded at
    // the edge only; stop list generated from TextAnalysis.GopherStops
    "text_gopher_rules" -> {
      def sr6(x: String) =
        s"CAST(CAST(round(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
      val stops = inList(TextAnalysis.GopherStops)
      s"""WITH $TOKS,
         |d AS (SELECT t.doc_id,
         |        CAST(len(toks) AS BIGINT) AS n,
         |        CAST(coalesce(list_sum(list_transform(toks,
         |          x -> length(x))), 0) AS BIGINT) AS sum_len,
         |        CAST(len(list_filter(toks,
         |          x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |        CAST(len(list_filter($stops,
         |          w -> list_contains(toks, w))) AS BIGINT) AS n_stop,
         |        CAST((length(text) - length(replace(text, '#', '')))
         |          + (length(text) - length(regexp_replace(text,
         |              '\\.\\.\\.', '', 'g'))) / 3 AS BIGINT) AS n_sym
         |      FROM documents JOIN t ON documents.doc_id = t.doc_id)
         |SELECT doc_id, n AS n_tokens,
         |  ${sr6("CAST(sum_len AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE)")}
         |    AS mean_token_len,
         |  ${sr6("CAST(n_alpha AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE)")}
         |    AS frac_alpha,
         |  n_stop AS n_stop_distinct,
         |  n_sym AS n_symbols,
         |  CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END AS ok_words,
         |  CASE WHEN sum_len >= n * 3 AND sum_len <= n * 10
         |       THEN 1 ELSE 0 END AS ok_mean_len,
         |  CASE WHEN n_alpha * 5 >= n * 4 THEN 1 ELSE 0 END AS ok_alpha,
         |  CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS ok_stop,
         |  CASE WHEN n_sym * 10 <= n THEN 1 ELSE 0 END AS ok_symbol,
         |  CASE WHEN n >= 50 AND n <= 100000
         |        AND sum_len >= n * 3 AND sum_len <= n * 10
         |        AND n_alpha * 5 >= n * 4 AND n_stop >= 2
         |        AND n_sym * 10 <= n THEN 1 ELSE 0 END AS keep
         |FROM d ORDER BY doc_id""".stripMargin
    },

    // mirror of TextAnalysis.normalizeText over the unicode-injected
    // corpus: same op order (trim → collapse \s+ → NFC → lower);
    // chr(769) = U+0301 combining acute, chr(8491) = U+212B ANGSTROM
    // SIGN (an NFC singleton → U+00C5). Both engines count length in
    // codepoints
    "text_normalize" ->
      s"""WITH inj AS (
         |  SELECT doc_id,
         |    text || '  Cafe' || chr(769) || '  ' || chr(8491) || ' end'
         |      AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars_raw,
         |  lower(nfc_normalize(
         |    regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS text_norm,
         |  CAST(length(lower(nfc_normalize(
         |    regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS BIGINT)
         |    AS n_chars_norm
         |FROM inj ORDER BY doc_id""".stripMargin,

    "text_token_stats" ->
      s"""WITH $TOKS
         |SELECT t.doc_id,
         |  CAST(len(toks) AS INT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT)
         |    AS n_bpe_tokens,
         |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens
         |FROM documents JOIN t ON documents.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // mirror of TextAnalysis.fertility: exact integer sums per
    // (lang, source), two double divisions 6dp scale-rounded
    "text_fertility" -> {
      def sq(x: String) =
        s"CAST(CAST(round(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
      s"""WITH $TOKS,
         |d AS (SELECT t.doc_id, documents.lang, source,
         |        CAST(length(text) AS BIGINT) AS n_chars,
         |        CAST(len(toks) AS BIGINT) AS n_ws,
         |        CAST(len(regexp_extract_all(lower(text),
         |          '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe
         |      FROM documents JOIN t ON documents.doc_id = t.doc_id),
         |g AS (SELECT lang, source, count(*) AS n_docs,
         |        CAST(sum(n_ws) AS BIGINT) AS n_words,
         |        CAST(sum(n_bpe) AS BIGINT) AS n_subwords,
         |        CAST(sum(n_chars) AS BIGINT) AS n_chars
         |      FROM d GROUP BY 1, 2)
         |SELECT lang, source, n_docs, n_words, n_subwords, n_chars,
         |  ${sq("CAST(n_subwords AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)")}
         |    AS fertility,
         |  ${sq("CAST(n_chars AS DOUBLE) / CAST(greatest(n_subwords, 1) AS DOUBLE)")}
         |    AS chars_per_subword
         |FROM g ORDER BY lang, source""".stripMargin
    },

    // mirror of Multimodal.attachPngPayload's analytic pixel law —
    // the Spark side round-trips these through a real PNG codec, so a
    // value match proves lossless encode→decode, not just plumbing
    // the stub-decoder path, value-checked: the "decoder" reads the
    // UTF-8 text bytes as the pixel buffer (documents are ASCII, so
    // byte == code point and ascii(substring(...)) reproduces it), and
    // the feature math is integer moment sums → identical IEEE ops
    "mm_features" ->
      s"""WITH m AS (
         |  SELECT doc_id, length(text) AS nb, text FROM documents),
         |dims AS (
         |  SELECT doc_id, nb,
         |    GREATEST(1, LEAST(64, nb)) AS w,
         |    GREATEST(1, nb // GREATEST(1, LEAST(64, nb))) AS h,
         |    text
         |  FROM m),
         |px AS (
         |  SELECT doc_id, ascii(substring(text, i + 1, 1)) AS p
         |  FROM dims, UNNEST(range(LEAST(nb, w * h))) u(i)),
         |st AS (
         |  SELECT doc_id, count(*) AS n, sum(p) AS sp, sum(p * p) AS sp2
         |  FROM px GROUP BY 1)
         |SELECT d.doc_id, 'image/fake' AS mime, CAST(d.nb AS INT) AS n_bytes,
         |  CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
         |  round(sp::DOUBLE / n, 6) AS mean_px,
         |  round(sqrt(GREATEST(0, sp2::DOUBLE / n
         |    - (sp::DOUBLE / n) * (sp::DOUBLE / n))), 6) AS std_px
         |FROM dims d JOIN st USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // mirror of Multimodal.attachClipPayload's analytic per-frame
    // pixel law at everyN=2 — the Spark side round-trips each sampled
    // frame through a real PNG codec inside a seekable clip container
    "mm_clip_frames" ->
      s"""WITH d AS (
         |  SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + ((doc_id * 7) % 9) AS h,
         |         2 + (doc_id % 4) AS nf
         |  FROM documents),
         |fr AS (
         |  SELECT doc_id, w, h, nf, f.f
         |  FROM d, UNNEST(range(nf)) f(f) WHERE f.f % 2 = 0),
         |px AS (
         |  SELECT doc_id, w, h, nf, f,
         |         ((doc_id * 31 + f * 17 + x.x * 7 + y.y * 13) % 256) AS p
         |  FROM fr,
         |       UNNEST(generate_series(0, w - 1)) x(x),
         |       UNNEST(generate_series(0, h - 1)) y(y))
         |SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(nf AS INT) AS n_frames,
         |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       round(avg(p), 6) AS mean_px,
         |       CAST(min(p) AS INT) AS min_px, CAST(max(p) AS INT) AS max_px
         |FROM px GROUP BY doc_id, f, nf, w, h
         |ORDER BY doc_id, frame_idx""".stripMargin,

    // mirror of Multimodal.attachWavPayload's analytic sample law —
    // the Spark side round-trips these through a real WAV/PCM16 codec
    // (javax.sound.sampled), so a value match proves lossless
    // encode→decode; zero crossings recompute sample i−1 in closed
    // form rather than via a window function
    "mm_audio_features" ->
      s"""WITH d AS (
         |  SELECT doc_id, 256 + (doc_id % 257) AS n FROM documents),
         |s AS (
         |  SELECT doc_id, n,
         |    ((doc_id * 31 + i * 7919) % 4096) - 2048 AS s,
         |    CASE WHEN i > 0
         |      THEN ((doc_id * 31 + (i - 1) * 7919) % 4096) - 2048 END AS prev
         |  FROM d, UNNEST(range(n)) u(i))
         |SELECT doc_id, 'audio/wav' AS mime, 8000 AS sample_rate,
         |  CAST(n AS INT) AS n_samples,
         |  round(sqrt(sum(s * s)::DOUBLE / n), 6) AS rms,
         |  CAST(count(*) FILTER (WHERE prev IS NOT NULL
         |    AND ((prev < 0) <> (s < 0))) AS INT) AS zero_crossings,
         |  CAST(max(abs(s)) AS INT) AS peak
         |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // mirror of Multimodal.audioActivitySegments (frameLen 64, mean
    // energy >= 1.4e6): the same analytic sample law as
    // mm_audio_features, framed; integer-exact threshold compare and
    // gap-and-island merge — a value match proves the codec
    // round-trip AND the segmentation arithmetic
    "mm_audio_vad" ->
      s"""WITH d AS (
         |  SELECT doc_id, 256 + (doc_id % 257) AS n FROM documents),
         |s AS (
         |  SELECT doc_id, i // 64 AS frame,
         |    ((doc_id * 31 + i * 7919) % 4096) - 2048 AS s
         |  FROM d, UNNEST(range(n)) u(i)),
         |f AS (
         |  SELECT doc_id, frame, CAST(count(*) AS BIGINT) AS nf,
         |    CAST(sum(s * s) AS BIGINT) AS energy
         |  FROM s GROUP BY 1, 2),
         |act AS (SELECT * FROM f WHERE energy >= 1400000 * nf),
         |isl AS (
         |  SELECT doc_id, frame, nf, energy,
         |    frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame)
         |      AS grp
         |  FROM act)
         |SELECT doc_id,
         |  CAST(min(frame) AS BIGINT) AS seg_start,
         |  CAST(max(frame) AS BIGINT) AS seg_end,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(nf) AS BIGINT) AS n_samples,
         |  CAST(sum(energy) AS BIGINT) AS energy_sum
         |FROM isl GROUP BY doc_id, grp
         |ORDER BY doc_id, seg_start""".stripMargin,

    "mm_png_features" ->
      s"""WITH d AS (
         |  SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + ((doc_id * 7) % 9) AS h
         |  FROM documents),
         |px AS (
         |  SELECT doc_id, w, h,
         |         ((doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS p
         |  FROM d,
         |       UNNEST(generate_series(0, w - 1)) x(x),
         |       UNNEST(generate_series(0, h - 1)) y(y))
         |SELECT doc_id, 'image/png' AS mime,
         |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       round(avg(p), 6) AS mean_px,
         |       CAST(min(p) AS INT) AS min_px, CAST(max(p) AS INT) AS max_px
         |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // mirror of Dedup.winnowFingerprints (k = 4, window = 4): positional
    // 4-gram md5 hashes, sliding-window-of-4 minima, distinct per doc
    "dedup_winnow" ->
      s"""WITH $TOKS,
         |$winnowCte
         |SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp
         |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mirror of Dedup.winnowOverlapPairs at minShared 2
    "dedup_winnow_pairs" ->
      s"""WITH $TOKS,
         |$winnowCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*) AS n_shared
         |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY doc_a, doc_b""".stripMargin,

    // mirror of Multimodal.imageDHash: the analytic pixel law sampled
    // onto the 9×8 dHash grid with the same integer math
    "mm_image_dhash" ->
      s"""$dhashCte
         |SELECT h.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
         |  b0, b1, b2, b3
         |FROM hash h JOIN d USING (doc_id) ORDER BY h.doc_id""".stripMargin,

    // mirror of Multimodal.imageNearDupPairs at maxHamming 3:
    // 16-bit-block candidates (hot values df > DefaultMaxBlockFreq
    // dropped, mirroring the Spark-side cap), exact Hamming over
    // XORed blocks
    "mm_image_neardup" ->
      s"""$dhashCte,
         |hb0 AS (SELECT doc_id, u.i AS blk,
         |         CASE u.i WHEN 0 THEN b0 WHEN 1 THEN b1
         |                  WHEN 2 THEN b2 ELSE b3 END AS bv
         |       FROM hash, UNNEST(generate_series(0, 3)) u(i)),
         |hot AS (SELECT blk, bv FROM hb0 GROUP BY blk, bv
         |        HAVING count(*) > ${graft.pipeline.Multimodal.DefaultMaxBlockFreq}),
         |hb AS (SELECT hb0.* FROM hb0 ANTI JOIN hot USING (blk, bv)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM hb a JOIN hb b
         |           ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT doc_id, count(*) AS n_neardups,
         |  CAST(min(hamming) AS INT) AS min_hamming
         |FROM (
         |  SELECT doc_a AS doc_id,
         |    CAST(bit_count(xor(ha.b0, h2.b0)) + bit_count(xor(ha.b1, h2.b1))
         |       + bit_count(xor(ha.b2, h2.b2)) + bit_count(xor(ha.b3, h2.b3))
         |      AS INT) AS hamming
         |  FROM cand JOIN hash ha ON doc_a = ha.doc_id
         |            JOIN hash h2 ON doc_b = h2.doc_id)
         |WHERE hamming <= 3 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH $TOKS,
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2),
         |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |         CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(max(c) AS BIGINT) AS top_c
         |       FROM tc GROUP BY 1),
         |big AS (SELECT doc_id, concat_ws(' ', toks[i], toks[i+1]) AS bg
         |        FROM t, UNNEST(range(1, len(toks))) u(i)),
         |bc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
         |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi,
         |         CAST(count(*) AS BIGINT) AS n_bi_distinct
         |       FROM bc GROUP BY 1)
         |SELECT ts.doc_id, n_tok AS n_tokens,
         |  round(1.0 - n_distinct::DOUBLE / n_tok::DOUBLE, 6) AS dup_token_frac,
         |  round(top_c::DOUBLE / n_tok::DOUBLE, 6) AS top_token_frac,
         |  round(1.0 - n_bi_distinct::DOUBLE / n_bi::DOUBLE, 6) AS dup_bigram_frac
         |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
         |ORDER BY ts.doc_id""".stripMargin,

    // end-to-end curation: every stage is the same SQL as its
    // standalone gate, chained in one statement
    "pipeline_curate" ->
      s"""WITH RECURSIVE $TOKS,
         |$SH3,
         |hs AS (SELECT doc_id, ${md5HashM31Sql("shingle")} AS h FROM sh),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM hs GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT p.doc_a, p.doc_b, count(*) AS i
         |  FROM pairs p
         |  JOIN sh a ON p.doc_a = a.doc_id
         |  JOIN sh b ON p.doc_b = b.doc_id AND a.shingle = b.shingle
         |  GROUP BY 1, 2),
         |vp AS (
         |  SELECT p.doc_a, p.doc_b
         |  FROM pairs p
         |  LEFT JOIN inter ON p.doc_a = inter.doc_a AND p.doc_b = inter.doc_b
         |  JOIN cnt ca ON p.doc_a = ca.doc_id
         |  JOIN cnt cb ON p.doc_b = cb.doc_id
         |  WHERE coalesce(i, 0)::DOUBLE / (ca.n + cb.n - coalesce(i, 0)) >= ${graft.pipeline.Dedup.DefaultMinJaccard}),
         |und AS (SELECT doc_a AS src, doc_b AS dst FROM vp
         |        UNION SELECT doc_b, doc_a FROM vp),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id),
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY 1),
         |cdrop AS (SELECT id AS doc_id FROM comp WHERE id != comp),
         |ek AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |dq AS (SELECT t.doc_id,
         |        length(text)::DOUBLE AS n_chars,
         |        len(toks)::DOUBLE AS n_tokens,
         |        (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS n_digits,
         |        len(list_filter(toks, x -> list_contains($enList, x)))::DOUBLE AS stop_hits
         |      FROM documents JOIN t ON documents.doc_id = t.doc_id),
         |qs AS (SELECT doc_id,
         |  round(least(1.0, (stop_hits / n_tokens) * 3) * 0.5
         |    + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 0.3 ELSE 0.0 END)
         |    + (CASE WHEN n_digits / n_chars < 0.2 THEN 0.2 ELSE 0.0 END), 6)
         |    AS quality_score
         |  FROM dq),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2),
         |rp AS (SELECT doc_id,
         |        round(1.0 - count(*)::DOUBLE / CAST(sum(c) AS BIGINT)::DOUBLE, 6)
         |          AS dup_token_frac
         |      FROM tc GROUP BY doc_id),
         |ucnt AS (SELECT tk AS tok, count(*) AS cnt FROM tok GROUP BY tk),
         |uvoc AS (SELECT tok, TRUE AS in_vocab FROM ucnt
         |         ORDER BY cnt DESC, tok ASC LIMIT 20),
         |us AS (SELECT o.tok_doc AS doc_id,
         |        round(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)::DOUBLE
         |          / count(*), 6) AS oov_frac
         |      FROM (SELECT doc_id AS tok_doc, tk AS tok FROM tok) o
         |      LEFT JOIN uvoc v USING (tok) GROUP BY o.tok_doc),
         |kept AS (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM documents d
         |  JOIN ek ON d.doc_id = ek.doc_id
         |  LEFT JOIN cdrop ON d.doc_id = cdrop.doc_id
         |  JOIN qs ON d.doc_id = qs.doc_id
         |  JOIN rp ON d.doc_id = rp.doc_id
         |  JOIN us ON d.doc_id = us.doc_id
         |  WHERE cdrop.doc_id IS NULL
         |    AND qs.quality_score >= 0.3 AND rp.dup_token_frac <= 0.9
         |    AND us.oov_frac <= 0.42),
         |samp AS (
         |  SELECT doc_id, lang, text FROM kept
         |  WHERE (('0x' || substr(md5(doc_id::VARCHAR || 'strat'), 1, 15))::BIGINT
         |         / 1152921504606846976.0) <
         |    CASE WHEN lang = 'de' THEN 0.6
         |         WHEN lang = 'en' THEN 0.8
         |         ELSE 0.5 END),
         |tn AS (
         |  SELECT doc_id, lang,
         |    CAST((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 4) AS INT) AS shard,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM samp)
         |SELECT tn.doc_id, lang, shard, n_tokens,
         |  CAST(floor(COALESCE(sum(n_tokens) OVER (
         |    PARTITION BY lang, shard ORDER BY tn.doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256) AS BIGINT) AS bin,
         |  CASE WHEN (('0x' || substr(md5(tn.doc_id::VARCHAR || 'split'), 1, 15))::BIGINT
         |            / 1152921504606846976.0) < 0.9 THEN 'train'
         |       WHEN (('0x' || substr(md5(tn.doc_id::VARCHAR || 'split'), 1, 15))::BIGINT
         |            / 1152921504606846976.0) < 0.95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM tn ORDER BY tn.doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""WITH $TOKS
         |SELECT doc_id,
         |  list_reduce(
         |    list_concat([0::BIGINT],
         |      list_transform(toks, tk -> ${md5HashM31Sql("tk")})),
         |    (a, b) -> (a * 31 + b) % $M31) AS fingerprint
         |FROM t ORDER BY doc_id""".stripMargin,

    "sim_pq_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cb AS (
         |  SELECT u.m, vec_id::INT AS code, v[u.m*16+1 : u.m*16+16] AS cent
         |  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id, v
         |        FROM e ORDER BY vec_id LIMIT 16) e16, UNNEST(range(4)) u(m)),
         |sub AS (
         |  SELECT vec_id, u.m, v[u.m*16+1 : u.m*16+16] AS sub
         |  FROM e, UNNEST(range(4)) u(m)),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.code,
         |    round(list_dot_product(cent, cent)
         |          - 2.0 * list_dot_product(sub, cent), 6) AS d2
         |  FROM sub s JOIN cb ON s.m = cb.m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, code) AS rn FROM enc) WHERE rn = 1),
         |lut AS (
         |  SELECT p.vec_id AS probe_id, cb.m, cb.code,
         |    list_dot_product(p.v[cb.m*16+1 : cb.m*16+16], cent) AS term
         |  FROM e p, cb WHERE p.vec_id < 5),
         |scored AS (
         |  SELECT probe_id, c.vec_id,
         |    round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6) AS approx_dot
         |  FROM codes c JOIN lut ON c.m = lut.m AND c.code = lut.code
         |  WHERE c.vec_id != lut.probe_id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT probe_id, vec_id, approx_dot,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY approx_dot DESC, vec_id) AS INT) AS rank
         |  FROM scored)
         |SELECT probe_id, vec_id, approx_dot, rank
         |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // IVF-PQ + exact rerank: the sim_ivf_search cluster pruning, the
    // sim_pq_topk ADC scoring restricted to pruned candidates, then
    // the exact-cosine rerank of the top-50 shortlist
    "sim_ivfpq_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS cluster, v AS sv FROM e ORDER BY vec_id LIMIT 8),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, seeds.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN seeds) WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
         |pclusters AS (
         |  SELECT probe_id, cluster FROM (
         |    SELECT p.probe_id, seeds.cluster,
         |           row_number() OVER (PARTITION BY p.probe_id
         |             ORDER BY round(list_cosine_similarity(p.pv, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM probes p CROSS JOIN seeds) WHERE rn <= 2),
         |cb AS (
         |  SELECT u.m, vec_id::INT AS code, v[u.m*16+1 : u.m*16+16] AS cent
         |  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id, v
         |        FROM e ORDER BY vec_id LIMIT 16) e16, UNNEST(range(4)) u(m)),
         |sub AS (
         |  SELECT vec_id, u.m, v[u.m*16+1 : u.m*16+16] AS sub
         |  FROM e, UNNEST(range(4)) u(m)),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.code,
         |    round(list_dot_product(cent, cent)
         |          - 2.0 * list_dot_product(sub, cent), 6) AS d2
         |  FROM sub s JOIN cb ON s.m = cb.m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, code) AS rn FROM enc) WHERE rn = 1),
         |lut AS (
         |  SELECT p.probe_id, cb.m, cb.code,
         |    list_dot_product(p.pv[cb.m*16+1 : cb.m*16+16], cent) AS term
         |  FROM probes p, cb),
         |cand AS (
         |  SELECT pc.probe_id, a.vec_id
         |  FROM pclusters pc JOIN assigned a ON pc.cluster = a.cluster
         |  WHERE pc.probe_id != a.vec_id),
         |scored AS (
         |  SELECT c.probe_id, c.vec_id,
         |    round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6) AS approx_dot
         |  FROM cand c
         |  JOIN codes k ON c.vec_id = k.vec_id
         |  JOIN lut ON c.probe_id = lut.probe_id
         |         AND k.m = lut.m AND k.code = lut.code
         |  GROUP BY 1, 2),
         |shortlist AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY approx_dot DESC, vec_id) AS rn FROM scored)
         |  WHERE rn <= 50),
         |exact AS (
         |  SELECT s.probe_id, s.vec_id,
         |    round(list_cosine_similarity(p.pv, e.v), 6) AS cos_sim
         |  FROM shortlist s
         |  JOIN e ON s.vec_id = e.vec_id
         |  JOIN probes p ON s.probe_id = p.probe_id)
         |SELECT probe_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM exact)
         |WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    "sim_pq_refined" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cb AS (
         |  SELECT u.m, vec_id::INT AS code, v[u.m*16+1 : u.m*16+16] AS cent
         |  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id, v
         |        FROM e ORDER BY vec_id LIMIT 16) e16, UNNEST(range(4)) u(m)),
         |sub AS (
         |  SELECT vec_id, u.m, v[u.m*16+1 : u.m*16+16] AS sub
         |  FROM e, UNNEST(range(4)) u(m)),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.code,
         |    round(list_dot_product(cent, cent)
         |          - 2.0 * list_dot_product(sub, cent), 6) AS d2
         |  FROM sub s JOIN cb ON s.m = cb.m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, code) AS rn FROM enc) WHERE rn = 1),
         |dims AS (
         |  SELECT c.m, c.code, g.pos, s.sub[g.pos + 1] AS val
         |  FROM codes c JOIN sub s ON c.vec_id = s.vec_id AND c.m = s.m,
         |       UNNEST(generate_series(0, 15)) g(pos)),
         |means AS (
         |  SELECT m, code, pos,
         |    CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS v
         |  FROM dims GROUP BY 1, 2, 3),
         |refined AS (
         |  SELECT m, code, list(v ORDER BY pos) AS cent2
         |  FROM means GROUP BY 1, 2)
         |SELECT CAST(cb.m AS INT) AS m, cb.code AS code,
         |  '[' || array_to_string(
         |    list_transform(COALESCE(refined.cent2, cb.cent),
         |      x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)),
         |    ',') || ']' AS cent_str
         |FROM cb LEFT JOIN refined ON cb.m = refined.m AND cb.code = refined.code
         |ORDER BY m, code""".stripMargin,

    "sim_pq_reranked" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cb AS (
         |  SELECT u.m, vec_id::INT AS code, v[u.m*16+1 : u.m*16+16] AS cent
         |  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS vec_id, v
         |        FROM e ORDER BY vec_id LIMIT 16) e16, UNNEST(range(4)) u(m)),
         |sub AS (
         |  SELECT vec_id, u.m, v[u.m*16+1 : u.m*16+16] AS sub
         |  FROM e, UNNEST(range(4)) u(m)),
         |enc AS (
         |  SELECT s.vec_id, s.m, cb.code,
         |    round(list_dot_product(cent, cent)
         |          - 2.0 * list_dot_product(sub, cent), 6) AS d2
         |  FROM sub s JOIN cb ON s.m = cb.m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
         |      ORDER BY d2, code) AS rn FROM enc) WHERE rn = 1),
         |lut AS (
         |  SELECT p.vec_id AS probe_id, cb.m, cb.code,
         |    list_dot_product(p.v[cb.m*16+1 : cb.m*16+16], cent) AS term
         |  FROM e p, cb WHERE p.vec_id < 5),
         |scored AS (
         |  SELECT probe_id, c.vec_id,
         |    round(CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6) AS approx_dot
         |  FROM codes c JOIN lut ON c.m = lut.m AND c.code = lut.code
         |  WHERE c.vec_id != lut.probe_id
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY approx_dot DESC, vec_id) AS rn
         |    FROM scored) WHERE rn <= 50),
         |exact AS (
         |  SELECT s.probe_id, s.vec_id,
         |    round(list_cosine_similarity(p.v, c.v), 6) AS cos_sim
         |  FROM short s
         |  JOIN e c ON s.vec_id = c.vec_id
         |  JOIN e p ON s.probe_id = p.vec_id)
         |SELECT probe_id, vec_id, cos_sim,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
         |FROM exact QUALIFY rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // mirror of Similarity.pairHistogram: probe slice by vec_id
    // arithmetic, 6dp-rounded cosine, clamped [-1,1) 40-bin counts
    "sim_pair_hist" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id % 97 = 0),
         |j AS (SELECT p.label = c.label AS same_label,
         |        round(list_cosine_similarity(p.v, c.v), 6) AS cs
         |      FROM p JOIN e c ON c.vec_id != p.vec_id),
         |b AS (SELECT same_label,
         |        least(39, greatest(0,
         |          CAST(floor((cs + 1.0) * 40 / 2.0) AS INT))) AS bin
         |      FROM j)
         |SELECT same_label, bin,
         |  -1.0 + CAST(bin AS DOUBLE) * (2.0 / 40) AS bin_lo,
         |  count(*) AS n
         |FROM b GROUP BY 1, 2 ORDER BY same_label, bin""".stripMargin,

    "sim_bruteforce_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id < 5),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |         round(list_cosine_similarity(p.v, c.v), 6) AS cos_sim
         |  FROM p JOIN e c ON c.vec_id != p.vec_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
         |  FROM scored)
         |SELECT probe_id, vec_id, cos_sim, rank
         |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // Matryoshka prefix tier: the brute-force mirror on v[1:16]
    "sim_matryoshka_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id < 5),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |         round(list_cosine_similarity(p.v[1:16], c.v[1:16]), 6) AS cos_sim
         |  FROM p JOIN e c ON c.vec_id != p.vec_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
         |  FROM scored)
         |SELECT probe_id, vec_id, cos_sim, rank
         |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // prefix shortlist (50 on v[1:16]) -> exact full-dim rerank (10)
    "sim_matryoshka_reranked" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id < 5),
         |tr AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |         round(list_cosine_similarity(p.v[1:16], c.v[1:16]), 6) AS tcos
         |  FROM p JOIN e c ON c.vec_id != p.vec_id),
         |short AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |           row_number() OVER (PARTITION BY probe_id
         |             ORDER BY tcos DESC, vec_id) AS rk
         |    FROM tr) WHERE rk <= 50),
         |ex AS (
         |  SELECT s.probe_id, s.vec_id,
         |         round(list_cosine_similarity(p.v, c.v), 6) AS cos_sim
         |  FROM short s
         |  JOIN e c ON c.vec_id = s.vec_id
         |  JOIN p ON p.vec_id = s.probe_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
         |  FROM ex)
         |SELECT probe_id, vec_id, cos_sim, rank
         |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // mirror of Similarity.int8TopK: per-vector symmetric int8
    // quantization, exact integer dot, rescale by the two scales,
    // multiply→scale-0-round→divide 6dp rounding (identical IEEE
    // sequence to the Spark side)
    // per-source unigram KL vs the corpus: exact integer counts, each
    // ln on the same fixed-order double ratio quantized to a 12dp
    // Long grid before the exact DECIMAL sum — mirrors sourceKl
    "text_source_kl" ->
      s"""WITH ts AS (
         |  SELECT source,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |                x -> x <> '') AS toks
         |  FROM documents),
         |w AS (SELECT source, unnest(toks) AS tok FROM ts),
         |st AS (SELECT source, tok, count(*) AS c_st FROM w GROUP BY 1, 2),
         |ct AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_ct
         |       FROM st GROUP BY 1),
         |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
         |       FROM st GROUP BY 1),
         |nc AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_c FROM ns),
         |terms AS (
         |  SELECT st.source, ns.n_s,
         |    CAST(st.c_st AS DECIMAL(19,0)) *
         |    CAST(CAST(round(ln(
         |        (CAST(st.c_st AS DOUBLE) * CAST(nc.n_c AS DOUBLE))
         |        / (CAST(ns.n_s AS DOUBLE) * CAST(c_ct AS DOUBLE)))
         |      * 1000000000000.0) AS BIGINT) AS DECIMAL(19,0)) AS term
         |  FROM st JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN nc)
         |SELECT source, max(n_s) AS n_tokens,
         |  CAST(CAST(round(CAST(sum(term) AS DOUBLE)
         |      / CAST(max(n_s) AS DOUBLE) / 1000000000000.0
         |      * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS kl
         |FROM terms GROUP BY 1 ORDER BY source""".stripMargin,

    // exact Gram triangle on the 6dp grid: the d²·N explode the Spark
    // side exists to avoid is the oracle-side definition
    "sim_gram_matrix" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |idx AS (SELECT unnest(generate_series(0,
         |          ${graft.pipeline.Similarity.Dim - 1})) AS i),
         |x AS (
         |  SELECT e.vec_id, idx.i,
         |    CAST(round(e.v[idx.i + 1] * 1000000.0) AS BIGINT) AS q
         |  FROM e CROSS JOIN idx)
         |SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
         |  -- VARCHAR-routed decimal→double: DuckDB's direct hugeint
         |  -- cast double-rounds past 2⁵³ (see OracleSql.spectrumChain);
         |  -- s is a raw full-precision double output, so a 1-ulp slip
         |  -- is a hash mismatch
         |  CAST(CAST(sum(CAST(a.q * b.q AS DECIMAL(38,0))) AS VARCHAR)
         |    AS DOUBLE) AS s
         |FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
         |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,

    // mirror of Similarity.sourceOutliers: per-(source, dim) DECIMAL
    // mean scale-rounded to 6dp before the cosine (the ivf_refined
    // centroid discipline), bottom-5 cosines per source
    "sim_source_outliers" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m AS (SELECT d.doc_id, d.source, e.v
         |      FROM documents d JOIN e ON d.doc_id = e.vec_id),
         |dm AS (SELECT source, g.pos, v[g.pos + 1] AS val
         |       FROM m, UNNEST(generate_series(0, len(v) - 1)) g(pos)),
         |cm AS (SELECT source, pos,
         |         CAST(CAST(round((CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS cx
         |       FROM dm GROUP BY 1, 2),
         |cent AS (SELECT source, list(cx ORDER BY pos) AS c FROM cm
         |         GROUP BY source),
         |scored AS (
         |  SELECT m.source, m.doc_id,
         |         round(list_cosine_similarity(m.v, cent.c), 6)
         |           AS cos_centroid
         |  FROM m JOIN cent ON m.source = cent.source)
         |SELECT source, doc_id, cos_centroid,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY cos_centroid ASC, doc_id) AS INT) AS rank
         |FROM scored QUALIFY rank <= 5 ORDER BY source, rank""".stripMargin,

    // mirror of the sim_recall_report gate: each tier's top-10 CTE is
    // the same SQL as its standalone gate; hits = |tier ∩ exact| per
    // probe via LEFT JOIN + count(non-null)
    "sim_recall_report" -> {
      def blk(b: Int) = (0 until 16).map(j =>
        s"(CASE WHEN v[${b * 16 + j + 1}] > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pr AS (SELECT * FROM e WHERE vec_id < 5),
         |exact AS (SELECT probe_id, vec_id FROM (
         |  SELECT p.vec_id AS probe_id, c.vec_id,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      round(list_cosine_similarity(p.v, c.v), 6) DESC, c.vec_id) AS rk
         |  FROM pr p JOIN e c ON c.vec_id != p.vec_id) WHERE rk <= 10),
         |b AS (SELECT vec_id,
         |        CAST(${blk(0)} AS INT) AS b0, CAST(${blk(1)} AS INT) AS b1,
         |        CAST(${blk(2)} AS INT) AS b2, CAST(${blk(3)} AS INT) AS b3
         |      FROM e),
         |bp AS (SELECT vec_id AS probe_id, b0 AS p0, b1 AS p1,
         |         b2 AS p2, b3 AS p3 FROM b WHERE vec_id < 5),
         |bin AS (SELECT probe_id, vec_id FROM (
         |  SELECT probe_id, c.vec_id,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY
         |      bit_count(xor(c.b0, p0)) + bit_count(xor(c.b1, p1))
         |      + bit_count(xor(c.b2, p2)) + bit_count(xor(c.b3, p3)) ASC,
         |      c.vec_id) AS rk
         |  FROM b c JOIN bp ON c.vec_id != bp.probe_id) WHERE rk <= 10),
         |s8 AS (SELECT vec_id, v,
         |        CASE WHEN m = 0 THEN 1.0 ELSE m / 127 END AS scale
         |      FROM (SELECT vec_id, v,
         |              list_max(list_transform(v, x -> abs(x))) AS m
         |            FROM e)),
         |q8 AS (SELECT vec_id, scale,
         |        list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv
         |      FROM s8),
         |p8 AS (SELECT vec_id AS probe_id, scale AS pscale, qv AS pqv
         |      FROM q8 WHERE vec_id < 5),
         |i8 AS (SELECT probe_id, vec_id FROM (
         |  SELECT p.probe_id, c.vec_id,
         |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
         |      CAST(round(list_dot_product(c.qv, p.pqv) * c.scale * p.pscale
         |        * 1000000.0) AS BIGINT) / 1000000.0 DESC, c.vec_id) AS rk
         |  FROM q8 c JOIN p8 p ON c.vec_id != p.probe_id) WHERE rk <= 10),
         |mat AS (SELECT probe_id, vec_id FROM (
         |  SELECT p.vec_id AS probe_id, c.vec_id,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      round(list_cosine_similarity(p.v[1:16], c.v[1:16]), 6) DESC,
         |      c.vec_id) AS rk
         |  FROM pr p JOIN e c ON c.vec_id != p.vec_id) WHERE rk <= 10),
         |rb AS (SELECT a.probe_id, 'binary' AS tier,
         |         CAST(count(x.vec_id) AS BIGINT) AS hits
         |       FROM bin a LEFT JOIN exact x
         |         ON a.probe_id = x.probe_id AND a.vec_id = x.vec_id
         |       GROUP BY a.probe_id),
         |ri AS (SELECT a.probe_id, 'int8' AS tier,
         |         CAST(count(x.vec_id) AS BIGINT) AS hits
         |       FROM i8 a LEFT JOIN exact x
         |         ON a.probe_id = x.probe_id AND a.vec_id = x.vec_id
         |       GROUP BY a.probe_id),
         |rm AS (SELECT a.probe_id, 'matryoshka16' AS tier,
         |         CAST(count(x.vec_id) AS BIGINT) AS hits
         |       FROM mat a LEFT JOIN exact x
         |         ON a.probe_id = x.probe_id AND a.vec_id = x.vec_id
         |       GROUP BY a.probe_id)
         |SELECT probe_id, tier, hits FROM (
         |  SELECT * FROM rb UNION ALL SELECT * FROM ri
         |  UNION ALL SELECT * FROM rm)
         |ORDER BY tier, probe_id""".stripMargin
    },

    // mirror of Similarity.binaryTopK: sign bits packed into four
    // 16-bit blocks (the dHash block convention), Hamming =
    // Σ bit_count(xor) — pure integer, no rounding step anywhere
    "sim_binary_topk" -> {
      def blk(b: Int) = (0 until 16).map(j =>
        s"(CASE WHEN v[${b * 16 + j + 1}] > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id,
         |        CAST(${blk(0)} AS INT) AS b0, CAST(${blk(1)} AS INT) AS b1,
         |        CAST(${blk(2)} AS INT) AS b2, CAST(${blk(3)} AS INT) AS b3
         |      FROM e),
         |p AS (SELECT vec_id AS probe_id, b0 AS p0, b1 AS p1,
         |        b2 AS p2, b3 AS p3
         |      FROM b WHERE vec_id < 5),
         |h AS (SELECT probe_id, c.vec_id,
         |        CAST(bit_count(xor(c.b0, p0)) + bit_count(xor(c.b1, p1))
         |           + bit_count(xor(c.b2, p2)) + bit_count(xor(c.b3, p3))
         |          AS INT) AS hamming
         |      FROM b c JOIN p ON c.vec_id != p.probe_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, hamming,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY hamming ASC, vec_id) AS INT) AS rank
         |  FROM h)
         |SELECT probe_id, vec_id, hamming, rank
         |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin
    },

    // mirror of Similarity.binarySearchReranked: Hamming shortlist
    // (rank ≤ 50) reranked by exact cosine
    "sim_binary_reranked" -> {
      def blk(b: Int) = (0 until 16).map(j =>
        s"(CASE WHEN v[${b * 16 + j + 1}] > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id,
         |        CAST(${blk(0)} AS INT) AS b0, CAST(${blk(1)} AS INT) AS b1,
         |        CAST(${blk(2)} AS INT) AS b2, CAST(${blk(3)} AS INT) AS b3
         |      FROM e),
         |p AS (SELECT vec_id AS probe_id, b0 AS p0, b1 AS p1,
         |        b2 AS p2, b3 AS p3
         |      FROM b WHERE vec_id < 5),
         |h AS (SELECT probe_id, c.vec_id,
         |        bit_count(xor(c.b0, p0)) + bit_count(xor(c.b1, p1))
         |          + bit_count(xor(c.b2, p2)) + bit_count(xor(c.b3, p3))
         |          AS hamming
         |      FROM b c JOIN p ON c.vec_id != p.probe_id),
         |short AS (SELECT probe_id, vec_id FROM (
         |            SELECT probe_id, vec_id,
         |              row_number() OVER (PARTITION BY probe_id
         |                ORDER BY hamming ASC, vec_id) AS rk
         |            FROM h) WHERE rk <= 50),
         |x AS (SELECT s.probe_id, s.vec_id,
         |        round(list_cosine_similarity(pe.v, ce.v), 6) AS cos_sim
         |      FROM short s JOIN e ce ON s.vec_id = ce.vec_id
         |                   JOIN e pe ON s.probe_id = pe.vec_id)
         |SELECT probe_id, vec_id, cos_sim,
         |  CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
         |FROM x QUALIFY rank <= 10 ORDER BY probe_id, rank""".stripMargin
    },

    "sim_int8_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT vec_id, v,
         |        CASE WHEN m = 0 THEN 1.0 ELSE m / 127 END AS scale
         |      FROM (SELECT vec_id, v,
         |              list_max(list_transform(v, x -> abs(x))) AS m
         |            FROM e)),
         |q AS (SELECT vec_id, scale,
         |        list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv
         |      FROM s),
         |p AS (SELECT vec_id AS probe_id, scale AS pscale, qv AS pqv
         |      FROM q WHERE vec_id < 5),
         |scored AS (
         |  SELECT p.probe_id, c.vec_id,
         |    CAST(round(list_dot_product(c.qv, p.pqv) * c.scale * p.pscale
         |      * 1000000.0) AS BIGINT) / 1000000.0 AS int8_score
         |  FROM q c JOIN p ON c.vec_id != p.probe_id),
         |ranked AS (
         |  SELECT probe_id, vec_id, int8_score,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY int8_score DESC, vec_id) AS INT) AS rank
         |  FROM scored)
         |SELECT probe_id, vec_id, int8_score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // mirror of Similarity.int8SearchReranked: the int8 shortlist
    // (rank ≤ 50 by quantized score) reranked by exact cosine
    "sim_int8_reranked" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT vec_id, v,
         |        CASE WHEN m = 0 THEN 1.0 ELSE m / 127 END AS scale
         |      FROM (SELECT vec_id, v,
         |              list_max(list_transform(v, x -> abs(x))) AS m
         |            FROM e)),
         |q AS (SELECT vec_id, scale,
         |        list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv
         |      FROM s),
         |p AS (SELECT vec_id AS probe_id, scale AS pscale, qv AS pqv
         |      FROM q WHERE vec_id < 5),
         |scored AS (
         |  SELECT p.probe_id, c.vec_id,
         |    CAST(round(list_dot_product(c.qv, p.pqv) * c.scale * p.pscale
         |      * 1000000.0) AS BIGINT) / 1000000.0 AS int8_score
         |  FROM q c JOIN p ON c.vec_id != p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY int8_score DESC, vec_id) AS rn
         |    FROM scored) WHERE rn <= 50),
         |ex AS (
         |  SELECT sh.probe_id, sh.vec_id,
         |    round(list_cosine_similarity(pe.v, ce.v), 6) AS cos_sim
         |  FROM short sh
         |  JOIN e ce ON sh.vec_id = ce.vec_id
         |  JOIN e pe ON sh.probe_id = pe.vec_id)
         |SELECT probe_id, vec_id, cos_sim, rank FROM (
         |  SELECT probe_id, vec_id, cos_sim,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
         |  FROM ex) WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    "sim_ivf_assign" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS cluster, v AS sv FROM e ORDER BY vec_id LIMIT 8),
         |scored AS (
         |  SELECT e.vec_id, seeds.cluster,
         |         round(list_cosine_similarity(e.v, seeds.sv), 6) AS cos_to_centroid
         |  FROM e CROSS JOIN seeds),
         |ranked AS (
         |  SELECT vec_id, cluster, cos_to_centroid,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cos_to_centroid DESC, cluster) AS rn
         |  FROM scored)
         |SELECT vec_id, cluster, cos_to_centroid
         |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "sim_ivf_centroids" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS cluster, v AS sv FROM e ORDER BY vec_id LIMIT 8),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, seeds.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN seeds) WHERE rn = 1),
         |dims AS (
         |  SELECT a.cluster, g.pos, e.v[g.pos + 1] AS val
         |  FROM assigned a JOIN e ON a.vec_id = e.vec_id,
         |       UNNEST(generate_series(0, len(e.v) - 1)) g(pos)),
         |cent AS (
         |  SELECT cluster, pos,
         |         CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS v,
         |         count(*) AS n
         |  FROM dims GROUP BY 1, 2)
         |SELECT cluster,
         |       '[' || array_to_string(
         |         list_transform(list(v ORDER BY pos),
         |           x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)),
         |         ',') || ']' AS centroid_str,
         |       max(n) AS n_assigned
         |FROM cent GROUP BY cluster ORDER BY cluster""".stripMargin,

    "sim_ivf_search" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS cluster, v AS sv FROM e ORDER BY vec_id LIMIT 8),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, seeds.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN seeds) WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
         |pclusters AS (
         |  SELECT probe_id, pv, cluster FROM (
         |    SELECT p.probe_id, p.pv, seeds.cluster,
         |           row_number() OVER (PARTITION BY p.probe_id
         |             ORDER BY round(list_cosine_similarity(p.pv, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM probes p CROSS JOIN seeds) WHERE rn <= 2),
         |cand AS (
         |  SELECT pc.probe_id, a.vec_id,
         |         round(list_cosine_similarity(pc.pv, e.v), 6) AS cos_sim
         |  FROM pclusters pc
         |  JOIN assigned a ON pc.cluster = a.cluster
         |  JOIN e ON a.vec_id = e.vec_id
         |  WHERE pc.probe_id != a.vec_id)
         |SELECT probe_id, vec_id, cos_sim,
         |       CAST(rank AS INT) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM cand)
         |WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // freshness-policy gate: after the drift-triggered rebuild the
    // index is bit-identical to a fresh build over the full corpus
    // (deterministic seeds = 8 smallest vec_ids), so the oracle is the
    // sim_ivf_search plan + per-probe hit count against the exact
    // top-10
    "sim_recall_after_churn" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS cluster, v AS sv FROM e ORDER BY vec_id LIMIT 8),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, seeds.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN seeds) WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
         |pclusters AS (
         |  SELECT probe_id, pv, cluster FROM (
         |    SELECT p.probe_id, p.pv, seeds.cluster,
         |           row_number() OVER (PARTITION BY p.probe_id
         |             ORDER BY round(list_cosine_similarity(p.pv, seeds.sv), 6) DESC,
         |                      cluster) AS rn
         |    FROM probes p CROSS JOIN seeds) WHERE rn <= 2),
         |cand AS (
         |  SELECT pc.probe_id, a.vec_id,
         |         round(list_cosine_similarity(pc.pv, e.v), 6) AS cos_sim
         |  FROM pclusters pc
         |  JOIN assigned a ON pc.cluster = a.cluster
         |  JOIN e ON a.vec_id = e.vec_id
         |  WHERE pc.probe_id != a.vec_id),
         |ivf AS (SELECT probe_id, vec_id FROM (
         |  SELECT probe_id, vec_id,
         |    row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM cand) WHERE rank <= 10),
         |exact AS (SELECT probe_id, vec_id FROM (
         |  SELECT p.probe_id, c.vec_id,
         |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
         |      round(list_cosine_similarity(p.pv, c.v), 6) DESC, c.vec_id) AS rk
         |  FROM probes p JOIN e c ON c.vec_id != p.probe_id) WHERE rk <= 10)
         |SELECT i.probe_id, 'ivf_rebuilt' AS tier,
         |       CAST(count(x.vec_id) AS BIGINT) AS hits
         |FROM ivf i LEFT JOIN exact x
         |  ON i.probe_id = x.probe_id AND i.vec_id = x.vec_id
         |GROUP BY i.probe_id ORDER BY i.probe_id""".stripMargin,

    // mirror of Similarity.ivfSearchRefined: two Lloyd sweeps over the
    // seed quantizer (assign → scaled-round-6dp per-dim DECIMAL mean,
    // empty clusters keep their previous centroid), then the standard
    // IVF probe/assign/rank search over the refined centroids
    "sim_ivf_refined" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cluster, v AS cent FROM e ORDER BY vec_id LIMIT 8),
         |a1 AS (SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, c0.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, c0.cent), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN c0) WHERE rn = 1),
         |d1 AS (SELECT a.cluster, g.pos, e.v[g.pos + 1] AS val
         |       FROM a1 a JOIN e ON a.vec_id = e.vec_id,
         |            UNNEST(generate_series(0, len(e.v) - 1)) g(pos)),
         |m1 AS (SELECT cluster, pos,
         |         CAST(CAST(round((CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS m
         |       FROM d1 GROUP BY 1, 2),
         |r1 AS (SELECT cluster, list(m ORDER BY pos) AS cent FROM m1 GROUP BY cluster),
         |c1 AS (SELECT c0.cluster, coalesce(r1.cent, c0.cent) AS cent
         |       FROM c0 LEFT JOIN r1 USING (cluster)),
         |a2 AS (SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, c1.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, c1.cent), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN c1) WHERE rn = 1),
         |d2 AS (SELECT a.cluster, g.pos, e.v[g.pos + 1] AS val
         |       FROM a2 a JOIN e ON a.vec_id = e.vec_id,
         |            UNNEST(generate_series(0, len(e.v) - 1)) g(pos)),
         |m2 AS (SELECT cluster, pos,
         |         CAST(CAST(round((CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS m
         |       FROM d2 GROUP BY 1, 2),
         |r2 AS (SELECT cluster, list(m ORDER BY pos) AS cent FROM m2 GROUP BY cluster),
         |c2 AS (SELECT c1.cluster, coalesce(r2.cent, c1.cent) AS cent
         |       FROM c1 LEFT JOIN r2 USING (cluster)),
         |a3 AS (SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, c2.cluster,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(e.v, c2.cent), 6) DESC,
         |                      cluster) AS rn
         |    FROM e CROSS JOIN c2) WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
         |pc AS (SELECT probe_id, pv, cluster FROM (
         |    SELECT p.probe_id, p.pv, c2.cluster,
         |           row_number() OVER (PARTITION BY p.probe_id
         |             ORDER BY round(list_cosine_similarity(p.pv, c2.cent), 6) DESC,
         |                      cluster) AS rn
         |    FROM probes p CROSS JOIN c2) WHERE rn <= 2),
         |cand AS (
         |  SELECT pc.probe_id, a3.vec_id,
         |         round(list_cosine_similarity(pc.pv, e.v), 6) AS cos_sim
         |  FROM pc JOIN a3 ON pc.cluster = a3.cluster
         |  JOIN e ON a3.vec_id = e.vec_id
         |  WHERE pc.probe_id != a3.vec_id)
         |SELECT probe_id, vec_id, cos_sim,
         |       CAST(rank AS INT) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM cand)
         |WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,

    // mirror of Similarity.semanticDedup at minCos 0.3: single-table
    // LSH buckets, 6dp-rounded per-bucket centroid (DECIMAL-routed
    // mean), tournament drop rule (closer-to-centroid same-bucket
    // 0.5-cosine mate wins; centroid_sim tie -> lower vec_id)
    "dedup_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ${bucketExpr(0)} AS bucket FROM e),
         |dims AS (SELECT bucket, g.pos AS pos, v[g.pos + 1] AS val
         |         FROM b, UNNEST(generate_series(0, len(v) - 1)) g(pos)),
         |agg AS (SELECT bucket, pos,
         |          CAST(CAST(round((CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0
         |            AS m
         |        FROM dims GROUP BY 1, 2),
         |cent AS (SELECT bucket, list(m ORDER BY pos) AS centroid
         |         FROM agg GROUP BY bucket),
         |mm AS (SELECT b.vec_id, b.bucket, b.v,
         |         round(list_cosine_similarity(b.v, cent.centroid), 6)
         |           AS centroid_sim
         |       FROM b JOIN cent USING (bucket)),
         |drp AS (SELECT DISTINCT x.vec_id FROM mm x JOIN mm y
         |          ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
         |         AND round(list_cosine_similarity(x.v, y.v), 6) >= 0.3
         |         AND (y.centroid_sim < x.centroid_sim OR
         |              (y.centroid_sim = x.centroid_sim
         |               AND y.vec_id < x.vec_id)))
         |SELECT mm.vec_id, mm.bucket, mm.centroid_sim,
         |       (drp.vec_id IS NOT NULL) AS dropped
         |FROM mm LEFT JOIN drp ON mm.vec_id = drp.vec_id
         |ORDER BY mm.vec_id""".stripMargin,

    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$bucketedCte,
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, bb.vec_id AS vec_b
         |  FROM b a JOIN b bb
         |    ON a.tbl = bb.tbl AND a.bucket = bb.bucket
         |   AND a.vec_id < bb.vec_id)
         |SELECT vec_a, vec_b,
         |       round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |FROM cand JOIN e ea ON vec_a = ea.vec_id
         |          JOIN e eb ON vec_b = eb.vec_id
         |WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
         |ORDER BY vec_a, vec_b""".stripMargin,

    // mirror of Similarity.semanticDecontaminate: max 6dp cosine to
    // any eval vector (self excluded), flagged at 0.3; every corpus
    // vector has >= 4 non-self eval partners so the inner join loses
    // no rows (Spark's left join + coalesce(-1) covers the empty-eval
    // edge the gate corpus cannot produce)
    "dedup_semantic_decon" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT * FROM e WHERE vec_id < 5),
         |s AS (SELECT c.vec_id,
         |        max(round(list_cosine_similarity(c.v, p.v), 6)) AS m
         |      FROM e c JOIN p ON p.vec_id != c.vec_id
         |      GROUP BY c.vec_id)
         |SELECT vec_id, m AS max_eval_cos, (m >= 0.3) AS contaminated
         |FROM s ORDER BY vec_id""".stripMargin,

    // cluster centroids over the 0.3-cosine near-dup graph: recursive
    // components + per-dimension DECIMAL-routed means; arrays
    // stringified exactly like the Spark side (round6 -> DECIMAL(18,6))
    "sim_cluster_centroids" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$bucketedCte,
         |ep AS (
         |  SELECT vec_a, vec_b FROM (
         |    SELECT DISTINCT a.vec_id AS vec_a, bb.vec_id AS vec_b
         |    FROM b a JOIN b bb
         |      ON a.tbl = bb.tbl AND a.bucket = bb.bucket
         |     AND a.vec_id < bb.vec_id) c
         |  JOIN e ea ON c.vec_a = ea.vec_id
         |  JOIN e eb ON c.vec_b = eb.vec_id
         |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.5),
         |und AS (SELECT vec_a AS src, vec_b AS dst FROM ep
         |        UNION SELECT vec_b, vec_a FROM ep),
         |nodes AS (SELECT DISTINCT src AS id FROM und),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id),
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY 1),
         |k AS (SELECT e.vec_id, coalesce(c.comp, e.vec_id) AS comp, e.v
         |      FROM e LEFT JOIN comp c ON e.vec_id = c.id),
         |mem AS (SELECT comp, count(*) AS n_members FROM k GROUP BY 1),
         |dims AS (SELECT comp, g.pos AS pos, v[g.pos + 1] AS val
         |         FROM k, UNNEST(generate_series(0, len(v) - 1)) g(pos)),
         |agg AS (SELECT comp, pos,
         |          CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
         |        FROM dims GROUP BY 1, 2),
         |cent AS (SELECT comp,
         |           '[' || string_agg(CAST(CAST(round(m, 6) AS DECIMAL(18,6)) AS VARCHAR),
         |                             ',' ORDER BY pos) || ']' AS centroid
         |         FROM agg GROUP BY comp)
         |SELECT c.comp, mem.n_members, c.centroid
         |FROM cent c JOIN mem USING (comp) ORDER BY comp""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$bucketedCte,
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_id, bb.vec_id AS mate_id
         |  FROM b a JOIN b bb
         |    ON a.tbl = bb.tbl AND a.bucket = bb.bucket
         |   AND a.vec_id != bb.vec_id),
         |sc AS (
         |  SELECT c.vec_id, c.mate_id,
         |         round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |  FROM cand c JOIN e ea ON c.vec_id = ea.vec_id
         |              JOIN e eb ON c.mate_id = eb.vec_id),
         |ranked AS (
         |  SELECT vec_id, mate_id, cos_sim,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cos_sim DESC, mate_id) AS rn,
         |         count(*) OVER (PARTITION BY vec_id) AS n_candidates
         |  FROM sc)
         |SELECT e.vec_id, coalesce(r.n_candidates, 0) AS n_candidates,
         |       r.mate_id AS best_mate, r.cos_sim AS best_cos
         |FROM e LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
         |  ON e.vec_id = r.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    // mirror of the pipeline_curate3 composition: heavy hitters →
    // stopword-density band → top-1 TF-IDF keyword → hash split,
    // each fragment identical to its standalone gate's mirror
    "pipeline_curate3" ->
      s"""WITH hh AS ($heavyHittersSql),
         |$TOKS,
         |$stopDensityCtes,
         |sd AS (SELECT t.doc_id,
         |         $stopFracExpr AS stop_frac
         |       FROM t LEFT JOIN st USING (doc_id) WHERE len(toks) > 0),
         |${tfidfScoreCtes("tr")},
         |kw AS (SELECT doc_id, tok AS top_keyword, score AS kw_score
         |       FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |               ORDER BY score DESC, tok ASC) AS rnk FROM sc)
         |       WHERE rnk = 1),
         |sp AS (SELECT doc_id,
         |         CASE WHEN u < 0.8 THEN 'train'
         |              WHEN u < 0.9 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM (SELECT doc_id,
         |               (('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 15))::BIGINT
         |                / 1152921504606846976.0) AS u
         |             FROM documents))
         |SELECT sd.doc_id, sd.stop_frac, kw.top_keyword, kw.kw_score,
         |       sp.split
         |FROM sd JOIN kw USING (doc_id) JOIN sp USING (doc_id)
         |WHERE sd.stop_frac BETWEEN 0.05 AND 0.95
         |ORDER BY sd.doc_id""".stripMargin,

    // mirror of Similarity.normalizeCenter: unit vectors (6dp
    // scale-rounded at the hand-off), per-dim DECIMAL-routed corpus
    // mean (6dp at hand-off), center, re-normalize, stringify — every
    // cross-stage hand-off rounds on both engines, so half-ULP drift
    // cannot compound (the iterating-chain rule)
    "sim_embed_normalize" -> {
      def sq(x: String) =
        s"CAST(CAST(round(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |nn AS (SELECT vec_id, v,
         |         sqrt(list_inner_product(v, v)) AS pre_norm FROM e),
         |un AS (SELECT vec_id, pre_norm,
         |         CASE WHEN pre_norm > 0
         |           THEN list_transform(v, x -> ${sq("x / pre_norm")})
         |           ELSE v END AS uv
         |       FROM nn),
         |d AS (SELECT g.pos AS pos, uv[g.pos + 1] AS x
         |      FROM un, UNNEST(generate_series(0, len(uv) - 1)) g(pos)),
         |m AS (SELECT pos,
         |        ${sq("CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*)")} AS mval
         |      FROM d GROUP BY pos),
         |mv AS (SELECT list(mval ORDER BY pos) AS mean_vec FROM m),
         |ce AS (SELECT vec_id, pre_norm,
         |         list_transform(range(1, len(uv) + 1),
         |           i -> uv[i] - mean_vec[i]) AS cv
         |       FROM un, mv),
         |cn AS (SELECT vec_id, pre_norm, cv,
         |         sqrt(list_inner_product(cv, cv)) AS c_norm FROM ce),
         |w AS (SELECT vec_id, pre_norm,
         |        CASE WHEN c_norm > 0
         |          THEN list_transform(cv, x -> ${sq("x / c_norm")})
         |          ELSE cv END AS wv
         |      FROM cn)
         |SELECT vec_id, ${sq("pre_norm")} AS pre_norm,
         |  '[' || array_to_string(list_transform(wv,
         |    x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)), ',')
         |    || ']' AS vec_str
         |FROM w ORDER BY vec_id""".stripMargin
    },

    // mirror of TextAnalysis.countMinSketch + cmsHeavyHitters: the
    // depth×width counter table from the same md5M31/perm bucket
    // hashes, point-queried (min over rows) for every distinct token
    "text_heavy_hitters" -> heavyHittersSql,

    // mirror of Retrieval.tfidfTopK: smoothed TF-IDF, score rounded
    // BEFORE the per-doc rank so half-ULP ln drift cannot flip ranks
    "text_tfidf_topk" ->
      s"""WITH $TOKS,
         |w AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |${tfidfScoreCtes("w")},
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, tok ASC) AS rank FROM sc)
         |SELECT doc_id, CAST(rank AS INT) AS rank, tok,
         |  CAST(tf AS BIGINT) AS tf, score
         |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    // mirror of TextAnalysis.chunkDocs(64, 48): chunk starts at every
    // stride multiple below the token count; 1-based inclusive list
    // slice == Spark's slice(toks, start+1, 64); the final chunk keeps
    // its natural short length
    "doc_chunks" ->
      s"""WITH $TOKS,
         |c AS (SELECT doc_id, CAST(i // 48 AS BIGINT) AS chunk_id,
         |        toks[i+1 : i+64] AS ch
         |      FROM t, UNNEST(range(0, len(toks), 48)) u(i)
         |      WHERE len(toks) > 0)
         |SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tokens,
         |  array_to_string(ch, ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // mirror of TextAnalysis.vocabulary(1000): ids dense from 0 by
    // (count desc, token asc); the filter after row_number ==
    // limit-then-rank because the order is identical
    "text_vocab_ids" ->
      s"""WITH $TOKS,
         |u AS (SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_occ
         |      FROM t, UNNEST(toks) x(tok) GROUP BY 1),
         |r AS (SELECT token, n_occ,
         |        CAST(row_number() OVER (ORDER BY n_occ DESC, token) - 1
         |          AS INT) AS token_id
         |      FROM u)
         |SELECT token, token_id, n_occ FROM r
         |WHERE token_id < 1000 ORDER BY token_id""".stripMargin,

    // HLL sketches in the coupon-collecting regime are exact, and the
    // shard-merge is lossless, so BOTH estimate columns equal the exact
    // per-lang distinct token count
    "text_vocab_sketch" ->
      s"""WITH $TOKS
         |SELECT lang,
         |       CAST(count(DISTINCT tok) AS BIGINT) AS est_distinct,
         |       CAST(count(DISTINCT tok) AS BIGINT) AS est_distinct_merged
         |FROM t, UNNEST(toks) x(tok)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // mirror of TextAnalysis.encodeIds over vocabulary(20): positional
    // token explode, left join the id table, OOV = -1
    "text_encode_ids" ->
      s"""WITH $TOKS,
         |u AS (SELECT tok AS token, count(*) AS c
         |      FROM t, UNNEST(toks) x(tok) GROUP BY 1),
         |r AS (SELECT token,
         |        CAST(row_number() OVER (ORDER BY c DESC, token) - 1
         |          AS INT) AS token_id
         |      FROM u QUALIFY token_id < 20),
         |p AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i+1] AS token
         |      FROM t, UNNEST(range(0, len(toks))) g(i))
         |SELECT p.doc_id, p.pos,
         |  CAST(coalesce(r.token_id, -1) AS INT) AS token_id
         |FROM p LEFT JOIN r USING (token)
         |ORDER BY doc_id, pos""".stripMargin,

    // mirror of Retrieval.invertedIndex: distinct (doc, token), df
    // band, sorted `,`-joined postings (the cross-engine array
    // contract — never hash raw lists)
    "text_inverted_index" ->
      s"""WITH $TOKS,
         |d AS (SELECT DISTINCT doc_id, tok AS token
         |      FROM t, UNNEST(toks) x(tok)),
         |g AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
         |        array_to_string(list_sort(list(doc_id)), ',') AS postings
         |      FROM d GROUP BY token)
         |SELECT token, df, postings FROM g
         |WHERE df BETWEEN 2 AND 1000000 ORDER BY token""".stripMargin,

    // the streaming chunker drains against the identical batch mirror
    "stream_chunks" ->
      s"""WITH $TOKS,
         |c AS (SELECT doc_id, CAST(i // 48 AS BIGINT) AS chunk_id,
         |        toks[i+1 : i+64] AS ch
         |      FROM t, UNNEST(range(0, len(toks), 48)) u(i)
         |      WHERE len(toks) > 0)
         |SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tokens,
         |  array_to_string(ch, ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // mirror of the text_stop_density composition: the heavy-hitters
    // query becomes the discovered stopword list (nested WITH), then
    // per-doc occurrence counting via an exploded join — the same
    // numbers the Spark side computes with a broadcast literal list
    "text_stop_density" ->
      s"""WITH hh AS ($heavyHittersSql),
         |$TOKS,
         |$stopDensityCtes
         |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(st.n_stop, 0) AS BIGINT) AS n_stop,
         |  CASE WHEN len(toks) > 0 THEN
         |    $stopFracExpr
         |  END AS stop_frac
         |FROM t LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin,

    // mirror of TextAnalysis.collocations: PMI over adjacent-token
    // pairs, min pair count 5, top 30 — the ln input is the one shared
    // integer-ratio parenthesization, 6dp scaled-round per pair
    "text_collocations" ->
      s"""WITH $TOKS,
         |pairs AS (SELECT toks[i] AS u, toks[i+1] AS w
         |          FROM t, UNNEST(range(1, len(toks))) ux(i)
         |          WHERE len(toks) >= 2),
         |uni AS (SELECT tok, count(*) AS c1
         |        FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
         |bi0 AS (SELECT u, w, count(*) AS c2 FROM pairs GROUP BY u, w),
         |tot AS (SELECT (SELECT CAST(sum(c2) AS BIGINT) FROM bi0) AS nb,
         |               (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS nu)
         |SELECT u, w, c2 AS n_pair,
         |  CAST(CAST(round(ln(c2::DOUBLE * nu * nu
         |      / (nb::DOUBLE * cu.c1 * cw.c1)) * 1000000.0) AS BIGINT) AS DOUBLE)
         |    / 1000000.0 AS pmi
         |FROM bi0
         |JOIN uni cu ON cu.tok = u
         |JOIN uni cw ON cw.tok = w
         |CROSS JOIN tot
         |WHERE c2 >= 5
         |ORDER BY pmi DESC, u ASC, w ASC LIMIT 30""".stripMargin,
  )
}
