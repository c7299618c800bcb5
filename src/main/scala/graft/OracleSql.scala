package graft

/** DuckDB oracle SQL builders for SparkEntry.oracleSql.
  *
  * Every query here mirrors a Spark plan in SparkEntry semantically
  * *and numerically*: rounding happens only at the output edge, money
  * sums go through DECIMAL so summation order cannot perturb them, and
  * the decimation variance carries the same 1e-9 noise floor as the
  * Scala implementation.
  */
object OracleSql {

  // ---- shared time constants (nanoseconds since epoch, UTC) ----
  val NS: Long = 1000000000L
  val P1H: Long = 3600L * NS
  val P6H: Long = 21600L * NS
  /** 2024-01-10T00:00:00Z */
  val LO: Long = 1704844800L * NS
  /** 2024-01-20T00:00:00Z */
  val HI: Long = 1705708800L * NS
  /** 2024-01-11T00:00:00Z — boundary-lookup probe time */
  val TB: Long = 1704931200L * NS
  /** 2024-01-16T00:00:00Z — multi-resolution cutover */
  val CUT: Long = 1705363200L * NS
  /** 7 days */
  val RET7D: Long = 7L * 86400L * NS

  // ---- spectral / change-point gate parameters (shared with the
  // Spark plans so both engines evaluate the identical program) ----
  /** Candidate oscillation periods probed by the spectral gates. */
  val SpectrumPeriods: Seq[Long] =
    graft.archive.Analytics.DefaultSpectrumPeriods
  /** Periods probed by the DECIMATED spectrum (all ≥ 2× the 1 h level). */
  val DecSpectrumPeriods: Seq[Long] =
    Seq(7200L, 21600L, 43200L, 86400L).map(_ * NS)

  /** CUSUM slack k (value units) — drift below k/sample accumulates nothing. */
  val CusumSlack: Double = graft.archive.Analytics.DefaultCusumSlack
  /** CUSUM decision threshold h (value units, cumulative). */
  val CusumThreshold: Double = graft.archive.Analytics.DefaultCusumThreshold

  // ---- auto-resolution request (planner-driven query) ----
  /** 2024-01-03T00:00:00Z */
  val LO2: Long = 1704240000L * NS
  /** 2024-01-28T00:00:00Z */
  val HI2: Long = 1706400000L * NS
  /** simulated retention: earliest available 1h sample (2024-01-12) */
  val E1H: Long = 1705017600L * NS
  /** earliest available 6h sample (2024-01-01) */
  val E6H: Long = 1704067200L * NS
  val AutoLevels: Seq[Long] = Seq(0L, 3600L, 21600L)
  val AutoCount: Long = 600L

  /** The aligned-matrix export's channel list (= the corpus's five
    * channels) — shared between the Spark gate and the oracle so the
    * pivot columns match by construction.
    */
  val MatrixChannels: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** The planned segments — computed by the SAME planner the Spark
    * query calls, so plan parity is by construction.
    */
  def autoSegments: Seq[(Long, Long, Long)] = {
    val chosen = graft.archive.ResolutionPlanner.selectLevel(
      AutoLevels, LO2, HI2, Some(AutoCount))
    graft.archive.ResolutionPlanner.fallbackSegments(chosen,
      Map(3600L -> E1H, 21600L -> E6H),
      AutoLevels.filter(_ > chosen), LO2, HI2)
  }

  /** events → canonical sample frame (graft.core.Samples.fromEvents).
    * epoch_ns() sees the same µs-truncated nanoseconds Spark does.
    */
  val SAMPLES: String =
    """samples AS (
      |  SELECT event_type AS channel, epoch_ns(ts) AS ts, value,
      |         props AS str_value,
      |         (CAST(json_extract_string(props, '$.k') AS INT) % 4) AS severity,
      |         (CAST(json_extract_string(props, '$.k') AS INT) % 8) AS status,
      |         event_id AS sample_id
      |  FROM events)""".stripMargin

  /** F6 monotonic dedup (graft.core.Samples.monotonicDedup). */
  val CLEAN: String =
    """clean AS (
      |  SELECT channel, ts, value, str_value, severity, status, sample_id FROM (
      |    SELECT s.*, max(ts) OVER (PARTITION BY channel ORDER BY sample_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |    FROM samples s) t
      |  WHERE prev_max IS NULL OR ts > prev_max)""".stripMargin

  /** Marker transform: severity 3 → disconnected (null value). */
  val MARKED: String =
    """marked AS (
      |  SELECT channel, ts, CASE WHEN severity = 3 THEN NULL ELSE value END AS value,
      |         str_value, severity, status, sample_id FROM clean)""".stripMargin

  /** W3 validity intervals + flush horizon over source CTE `src`.
    * `sfx` suffixes the CTE names so several decimation chains can
    * coexist in one statement.
    */
  def validity(src: String, sfx: String = ""): String =
    s"""v$sfx AS (
       |  SELECT *, lead(ts) OVER (PARTITION BY channel ORDER BY ts) AS next_ts,
       |         max(ts) OVER (PARTITION BY channel) AS t_max
       |  FROM $src)""".stripMargin

  /** Slice explosion over tumbling windows of period `p` ns. */
  def slices(p: Long, sfx: String = ""): String =
    s"""sl$sfx AS (
       |  SELECT channel, ts, value, str_value, severity, status,
       |         u.win AS win, GREATEST(ts, u.win) AS lo,
       |         LEAST(next_ts, u.win + $p) AS hi
       |  FROM v$sfx, UNNEST(generate_series(ts - (ts % $p),
       |         (next_ts - 1) - ((next_ts - 1) % $p), $p)) AS u(win)
       |  WHERE next_ts IS NOT NULL AND u.win + $p <= t_max
       |    AND LEAST(next_ts, u.win + $p) > GREATEST(ts, u.win))""".stripMargin

  /** A1/A3 weighted moments per (channel, window); unrounded. */
  def decAgg(p: Long, sfx: String = ""): String =
    s"""decagg$sfx AS (
       |  SELECT channel, win,
       |    CAST(sum(CAST((hi - lo) * value AS DECIMAL(38,12))) AS DOUBLE) AS sum_wx,
       |    CAST(sum(CAST((hi - lo) * value * value AS DECIMAL(38,12))) AS DOUBLE) AS sum_wx2,
       |    sum(CASE WHEN value IS NOT NULL THEN hi - lo ELSE 0 END) AS w_cov,
       |    min(value) AS min_value, max(value) AS max_value,
       |    count(value) AS n_samples
       |  FROM sl$sfx GROUP BY 1, 2),
       |dec$sfx AS (
       |  SELECT channel, win AS win_start,
       |    sum_wx / w_cov AS mean,
       |    CASE WHEN (sum_wx2 / w_cov - (sum_wx / w_cov) * (sum_wx / w_cov)) < 1e-9
       |         THEN 0.0
       |         ELSE sqrt(sum_wx2 / w_cov - (sum_wx / w_cov) * (sum_wx / w_cov)) END AS std,
       |    min_value, max_value,
       |    w_cov / $p.0 AS covered_fraction, n_samples
       |  FROM decagg$sfx)""".stripMargin

  /** Full prelude for decimation-based queries at period `p`. */
  def decPrelude(p: Long): String =
    s"WITH $SAMPLES,\n$CLEAN,\n$MARKED,\n${validity("marked")},\n${slices(p)},\n${decAgg(p)}"

  /** One extra decimation chain (CTEs suffixed) to append to a prelude. */
  def decChain(p: Long, sfx: String): String =
    s"${validity("marked", sfx)},\n${slices(p, sfx)},\n${decAgg(p, sfx)}"

  /** The span-intersection calc grid (click − view held onto the 1h
    * grid over the sources' span intersection) over source CTE `src`
    * — the CTE chain ONE definition of the calc semantics feeds:
    * `d(ts, value)` is the derived series. Shared so the calc gates
    * cannot drift. With a marker-bearing `src` the held value may be
    * the marker's NULL, and `d` drops the point — a calc record is
    * undefined while an input is disconnected.
    */
  private def calcGridCtes(src: String): String =
    s"""b AS (SELECT
       |  ((GREATEST((SELECT min(ts) FROM $src WHERE channel = 'click'),
       |             (SELECT min(ts) FROM $src WHERE channel = 'view'))
       |    + ${P1H} - 1) // ${P1H}) * ${P1H} AS glo,
       |  (LEAST((SELECT max(ts) FROM $src WHERE channel = 'click'),
       |         (SELECT max(ts) FROM $src WHERE channel = 'view'))
       |    // ${P1H}) * ${P1H} AS ghi),
       |grid AS (SELECT c.channel, u.g
       |         FROM (VALUES ('click'), ('view')) c(channel), b,
       |         UNNEST(generate_series(b.glo, b.ghi, ${P1H})) AS u(g)),
       |h AS (SELECT grid.channel, grid.g, s.value
       |      FROM grid ASOF LEFT JOIN $src s
       |        ON grid.channel = s.channel AND grid.g >= s.ts),
       |m AS (SELECT g AS ts,
       |        max(CASE WHEN channel = 'click' THEN value END) AS av,
       |        max(CASE WHEN channel = 'view' THEN value END) AS bv
       |      FROM h GROUP BY g),
       |d AS (SELECT ts, av - bv AS value FROM m
       |      WHERE av IS NOT NULL AND bv IS NOT NULL)""".stripMargin

  private val CalcGridCtes: String =
    s"$SAMPLES,\n$CLEAN,\n${calcGridCtes("clean")}"

  /** The widened serve of the archived calc series — the oracle for
    * BOTH arch_calc_configured and arch_calc_catchup: the incremental
    * catch-up build must serve the EXACT all-at-once bytes, so the two
    * gates share one query by construction.
    */
  private val CalcConfiguredOracle: String =
    s"""WITH $CalcGridCtes,
       |inner_rows AS (SELECT ts, value FROM d WHERE ts > $LO AND ts < $HI),
       |lo_b AS (SELECT ts, value FROM (
       |    SELECT ts, value,
       |      row_number() OVER (ORDER BY ts DESC) AS k
       |    FROM d WHERE ts <= $LO) WHERE k = 1),
       |hi_b AS (SELECT ts, value FROM (
       |    SELECT ts, value,
       |      row_number() OVER (ORDER BY ts ASC) AS k
       |    FROM d WHERE ts >= $HI) WHERE k = 1),
       |uni AS (
       |  SELECT * FROM inner_rows
       |  UNION SELECT * FROM lo_b
       |  UNION SELECT * FROM hi_b)
       |SELECT 'calc:cv' AS channel, ts, value, CAST(0 AS BIGINT) AS level
       |FROM uni ORDER BY ts""".stripMargin

  private def qList(a: Seq[Long]): String = a.mkString("[", ", ", "]")

  /** The projection/power CTE chain over a prelude-defined
    * `b(channel, ts, q)`, ending in `spec(channel, period_s, n, sc,
    * ss, power)` — composable so the raw and decimated-level spectra
    * share one definition. The literal cos/sin tables come from
    * [[graft.archive.Analytics.spectrumCosQ]] so both engines multiply
    * the identical 6dp-grid integers, the phase index is exact integer
    * arithmetic, and the projection sums are DECIMAL(38,0)
    * (order-free).
    *
    * The sum→DOUBLE conversions route through VARCHAR: DuckDB's
    * direct hugeint-decimal→double cast is NOT correctly rounded
    * (upper·2⁶⁴ + lower, two roundings — measured 1 ulp off at sf1
    * where |sum| > 2⁵³), while its string parse is, matching Spark's
    * BigDecimal.doubleValue. Spectrum outputs raw full-precision
    * doubles, so that ulp is a hash mismatch, not absorbed noise.
    */
  private def spectrumChain(lo: Long, periods: Seq[Long]): String =
    s"""m AS (
       |  SELECT channel,
       |    CAST(round(CAST(CAST(sum(CAST(q AS DECIMAL(19,0))) AS VARCHAR)
       |      AS DOUBLE) / count(*)) AS BIGINT) AS mq,
       |    count(*) AS n
       |  FROM b GROUP BY 1),
       |tab AS (SELECT ${qList(graft.archive.Analytics.spectrumCosQ.toSeq)} AS ct,
       |               ${qList(graft.archive.Analytics.spectrumSinQ.toSeq)} AS st),
       |p AS (SELECT unnest(${qList(periods)}) AS period),
       |e AS (
       |  SELECT b.channel, m.n, p.period, b.q - m.mq AS qd,
       |    CAST(((b.ts - $lo) % p.period)
       |      * ${graft.archive.Analytics.SpectrumTableSize}
       |      // p.period AS BIGINT) AS idx
       |  FROM b JOIN m USING (channel) CROSS JOIN p),
       |g AS (
       |  SELECT channel, period, max(n) AS n,
       |    CAST(CAST(sum(CAST(qd * ct[idx + 1] AS DECIMAL(38,0)))
       |      AS VARCHAR) AS DOUBLE) AS sc,
       |    CAST(CAST(sum(CAST(qd * st[idx + 1] AS DECIMAL(38,0)))
       |      AS VARCHAR) AS DOUBLE) AS ss
       |  FROM e CROSS JOIN tab GROUP BY 1, 2),
       |spec AS (
       |  SELECT channel, CAST(period // 1000000000 AS BIGINT) AS period_s, n,
       |    sc, ss,
       |    (sc * sc + ss * ss) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |      / 1e24 AS power
       |  FROM g)""".stripMargin

  private lazy val spectrumSql: String =
    s"""WITH $SAMPLES,
       |$CLEAN,
       |b AS (
       |  SELECT channel, ts, CAST(round(value * 1000000.0) AS BIGINT) AS q
       |  FROM clean
       |  WHERE ts >= $LO AND ts < $HI AND value IS NOT NULL
       |    AND NOT isnan(value)),
       |${spectrumChain(LO, SpectrumPeriods)}""".stripMargin

  val all: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "arch_range_scan" ->
      s"""WITH $SAMPLES
         |SELECT channel, ts, value, severity, status, sample_id
         |FROM samples WHERE ts BETWEEN $LO AND $HI
         |ORDER BY channel, ts, sample_id""".stripMargin,

    // graft.archive.Rolling.trailing — inclusive [ts - 1h, ts] RANGE
    // frame over the clean history, clipped to the gate range after
    "arch_rolling_window" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |roll AS (
         |  SELECT channel, ts,
         |    CAST(sum(CAST(value AS DECIMAL(38,12))) OVER w AS DOUBLE) /
         |      count(value) OVER w AS roll_mean,
         |    min(value) OVER w AS roll_min,
         |    max(value) OVER w AS roll_max,
         |    count(value) OVER w AS roll_n
         |  FROM clean
         |  WINDOW w AS (PARTITION BY channel ORDER BY ts
         |    RANGE BETWEEN ${3600L * NS} PRECEDING AND CURRENT ROW))
         |SELECT channel, ts,
         |  CAST(CAST(round(roll_mean * 1000000.0) AS BIGINT) AS DOUBLE)
         |    / 1000000.0 AS roll_mean,
         |       roll_min, roll_max, roll_n
         |FROM roll WHERE ts BETWEEN $LO AND $HI
         |ORDER BY channel, ts""".stripMargin,

    // SparkEntry stream_window_counts — the native window() streaming
    // aggregation must emit exactly the batch tumbling counts/sums
    "stream_window_counts" ->
      s"""WITH e AS (SELECT epoch_ns(ts) AS tsn, value FROM events)
         |SELECT tsn - tsn % ${21600L * 1000000000L} AS win_start,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(CAST(round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
         |    * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_value
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // graft.archive.Rolling.zscore — trailing-window anomaly scores:
    // exact DECIMAL Σx/Σx² window sums, one shared double
    // parenthesization for mean/variance, clamp + NULL degenerate
    // frames, scaled 6dp round at the edge
    "arch_rolling_zscore" -> {
      def sq(x: String) =
        s"CAST(CAST(round(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
      s"""WITH $SAMPLES,
         |$CLEAN,
         |roll AS (
         |  SELECT channel, ts, value,
         |    CAST(sum(CAST(value AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sx,
         |    CAST(sum(CAST(value * value AS DECIMAL(38,12))) OVER w AS DOUBLE)
         |      AS sxx,
         |    count(value) OVER w AS n
         |  FROM clean
         |  WINDOW w AS (PARTITION BY channel ORDER BY ts
         |    RANGE BETWEEN ${3600L * NS} PRECEDING AND CURRENT ROW)),
         |z AS (
         |  SELECT channel, ts, value,
         |    sx / n AS zmean_raw,
         |    CASE WHEN n >= 2 THEN
         |      sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0))
         |    END AS zstd_raw
         |  FROM roll)
         |SELECT channel, ts, value,
         |  ${sq("zmean_raw")} AS zmean,
         |  ${sq("zstd_raw")} AS zstd,
         |  CASE WHEN zstd_raw > 0 THEN
         |    ${sq("(value - zmean_raw) / zstd_raw")}
         |  END AS zscore
         |FROM z WHERE ts BETWEEN $LO AND $HI
         |ORDER BY channel, ts""".stripMargin
    },

    // graft.streaming.Sessionize.windowedUserStats — 6h tumbling
    // windows: count, exact distinct users, DECIMAL-routed value sum
    // (scaled 6dp round on both sides)
    "events_window_users" ->
      s"""WITH e AS (SELECT epoch_ns(ts) AS tsn, user_id, value FROM events)
         |SELECT tsn - tsn % ${21600L * 1000000000L} AS win_start,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(CAST(round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
         |    * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_value
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // graft.streaming.Sessionize.sessions — session_window semantics:
    // merge iff diff <= gap (an exactly-gap successor still merges);
    // 12h gap
    "events_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, epoch_ns(ts) AS ts, event_id, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w)
         |              > ${43200L * 1000000000L} THEN 1 ELSE 0 END AS is_new
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         |  FROM flagged)
         |SELECT user_id, min(ts) AS start_ns, max(ts) AS end_ns,
         |       count(*) AS n_events,
         |       round(CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE), 6)
         |         AS sum_value
         |FROM sess GROUP BY user_id, session_seq
         |ORDER BY user_id, start_ns""".stripMargin,

    "arch_boundary_before" ->
      s"""WITH $SAMPLES
         |SELECT channel, ts, value, severity, status, sample_id FROM (
         |  SELECT s.*, row_number() OVER (PARTITION BY channel
         |    ORDER BY ts DESC, sample_id DESC) AS rn
         |  FROM samples s WHERE ts <= $TB) t
         |WHERE rn = 1 ORDER BY channel""".stripMargin,

    "arch_boundary_after" ->
      s"""WITH $SAMPLES
         |SELECT channel, ts, value, severity, status, sample_id FROM (
         |  SELECT s.*, row_number() OVER (PARTITION BY channel
         |    ORDER BY ts ASC, sample_id ASC) AS rn
         |  FROM samples s WHERE ts >= $TB) t
         |WHERE rn = 1 ORDER BY channel""".stripMargin,

    "arch_limit_modes" ->
      s"""WITH $SAMPLES,
         |$CLEAN
         |SELECT channel, ts, value, severity, status, sample_id FROM (
         |  SELECT channel, ts, value, severity, status, sample_id FROM (
         |    SELECT c.*, row_number() OVER (PARTITION BY channel
         |      ORDER BY ts DESC, sample_id DESC) AS rn
         |    FROM clean c WHERE ts <= $LO) t1 WHERE rn = 1
         |  UNION
         |  SELECT channel, ts, value, severity, status, sample_id
         |  FROM clean WHERE ts > $LO AND ts < $HI
         |  UNION
         |  SELECT channel, ts, value, severity, status, sample_id FROM (
         |    SELECT c.*, row_number() OVER (PARTITION BY channel
         |      ORDER BY ts ASC, sample_id ASC) AS rn
         |    FROM clean c WHERE ts >= $HI) t2 WHERE rn = 1) u
         |ORDER BY channel, ts""".stripMargin,

    "arch_reverse_topk" ->
      s"""WITH $SAMPLES
         |SELECT channel, ts, value, severity, status, sample_id FROM (
         |  SELECT s.*, row_number() OVER (PARTITION BY channel
         |    ORDER BY ts DESC, sample_id DESC) AS rn
         |  FROM samples s) t
         |WHERE rn <= 5 ORDER BY channel, ts DESC, sample_id DESC""".stripMargin,

    "arch_bounded_fetch" ->
      s"""WITH $SAMPLES
         |SELECT channel, ts, value, severity, status, sample_id FROM (
         |  SELECT s.*, row_number() OVER (PARTITION BY channel
         |    ORDER BY ts, sample_id) AS rn
         |  FROM samples s WHERE ts BETWEEN $LO AND $HI) t
         |WHERE rn <= 50 ORDER BY channel, ts, sample_id""".stripMargin,

    "arch_monotonic_dedup" ->
      s"""WITH $SAMPLES,
         |$CLEAN
         |SELECT channel, ts, value, severity, status, sample_id
         |FROM clean ORDER BY channel, sample_id""".stripMargin,

    // per-channel F6-violation counters over the RAW arrival stream
    // (lag by arrival order = sample_id); integer sums through the
    // BIGINT cast (DuckDB sum widens to HUGEINT → float in pandas)
    "arch_integrity_report" ->
      s"""WITH $SAMPLES,
         |l AS (
         |  SELECT channel, ts,
         |    lag(ts) OVER (PARTITION BY channel ORDER BY sample_id)
         |      AS prev_ts
         |  FROM samples)
         |SELECT channel, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN ts = prev_ts THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_ts,
         |  CAST(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_backward,
         |  CAST(sum(CASE WHEN ts = prev_ts THEN 1 ELSE 0 END)
         |     + sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violations
         |FROM l GROUP BY channel ORDER BY channel""".stripMargin,

    "arch_decimate_1h" ->
      s"""${decPrelude(P1H)}
         |SELECT channel, win_start, round(mean, 6) AS mean, round(std, 6) AS std,
         |  min_value, max_value, round(covered_fraction, 6) AS covered_fraction,
         |  n_samples
         |FROM dec ORDER BY channel, win_start""".stripMargin,

    // mirror of Analytics.correlatedChannels: 1 h means over CLEAN,
    // quantized to the 6dp integer grid, exact DECIMAL moment sums,
    // fixed-order closed-form Pearson, scale-rounded edge
    "arch_correlated_channels" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |${validity("clean", "_c")},
         |${slices(P1H, "_c")},
         |${decAgg(P1H, "_c")},
         |g AS (SELECT channel, win_start,
         |        CAST(round(mean * 1000000.0) AS BIGINT) AS q FROM dec_c),
         |x AS (SELECT win_start, q AS x FROM g WHERE channel = 'click'),
         |yy AS (SELECT channel AS other, win_start, q AS y FROM g
         |       WHERE channel <> 'click'),
         |a AS (SELECT other, count(*) AS n,
         |        -- VARCHAR-routed decimal→double: DuckDB's direct
         |        -- hugeint cast double-rounds (see spectrumChain)
         |        CAST(CAST(sum(CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sx,
         |        CAST(CAST(sum(CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sy,
         |        CAST(CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sxy,
         |        CAST(CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sxx,
         |        CAST(CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS syy
         |      FROM yy JOIN x USING (win_start) GROUP BY other)
         |SELECT other AS channel, n AS n_windows,
         |  CAST(CAST(round((CASE WHEN
         |      sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |      sqrt(CAST(n AS DOUBLE) * syy - sy * sy) = 0
         |    THEN 0.0
         |    ELSE (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |      (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |       sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) END) * 1000000.0)
         |    AS BIGINT) AS DOUBLE) / 1000000.0 AS corr
         |FROM a ORDER BY corr DESC, channel""".stripMargin,

    // mirror of Analytics.histogram: clamped fixed-bin counts over
    // CLEAN (identical binning expression order)
    "arch_histogram" ->
      s"""WITH $SAMPLES,
         |$CLEAN
         |SELECT channel,
         |  least(19, greatest(0,
         |    CAST(floor((value - 0.0) * 20 / 500.0) AS INT))) AS bin,
         |  0.0 + CAST(least(19, greatest(0,
         |    CAST(floor((value - 0.0) * 20 / 500.0) AS INT))) AS DOUBLE)
         |    * 25.0 AS bin_lo,
         |  count(*) AS n
         |FROM clean WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY 1, 2, 3 ORDER BY channel, bin""".stripMargin,

    // per-channel percentile panel: quantile_cont ≡ Spark's exact
    // interpolated percentile, 6dp scale-rounded at the edge
    "arch_value_percentiles" -> {
      def sq(x: String) =
        s"CAST(CAST(round(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
      s"""WITH $SAMPLES,
         |$CLEAN
         |SELECT channel, count(*) AS n_samples,
         |  min(value) AS v_min,
         |  ${sq("quantile_cont(value, 0.5)")} AS p50,
         |  ${sq("quantile_cont(value, 0.9)")} AS p90,
         |  ${sq("quantile_cont(value, 0.99)")} AS p99,
         |  max(value) AS v_max
         |FROM clean WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY 1 ORDER BY channel""".stripMargin
    },

    // parallel LTTB: neighbor-bucket-average anchors, 48 buckets,
    // integer `//` bucketing ((ts−LO)·48 overflows the double grid),
    // DECIMAL-routed anchor averages, the area expression mirrored
    // op-for-op against Analytics.lttb
    "arch_lttb" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |pts AS (
         |  SELECT channel, ts, value,
         |         least(47, CAST((CAST(ts - $LO AS HUGEINT) * 48)
         |           // ${HI - LO} AS BIGINT)) AS bucket
         |  FROM clean
         |  WHERE ts >= $LO AND ts < $HI AND value IS NOT NULL),
         |summ AS (
         |  SELECT channel, bucket,
         |    -- VARCHAR-routed decimal→double: DuckDB's direct
         |    -- hugeint cast double-rounds (see spectrumChain)
         |    CAST(CAST(sum(CAST(ts AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
         |      / count(*) AS avg_ts,
         |    CAST(CAST(sum(CAST(value AS DECIMAL(38,12))) AS VARCHAR)
         |      AS DOUBLE) / count(*) AS avg_v
         |  FROM pts GROUP BY 1, 2),
         |anch AS (
         |  SELECT channel, bucket,
         |    lag(avg_ts) OVER w AS prev_ts, lag(avg_v) OVER w AS prev_v,
         |    lead(avg_ts) OVER w AS next_ts, lead(avg_v) OVER w AS next_v
         |  FROM summ WINDOW w AS (PARTITION BY channel ORDER BY bucket)),
         |scored AS (
         |  SELECT p.channel, p.bucket, p.ts, p.value,
         |    abs((a.prev_ts - a.next_ts) * (p.value - a.prev_v)
         |      - (a.prev_ts - CAST(p.ts AS DOUBLE))
         |        * (a.next_v - a.prev_v)) AS area,
         |    p.bucket > 0 AND p.bucket < 47
         |      AND a.prev_ts IS NOT NULL AND a.next_ts IS NOT NULL AS mid
         |  FROM pts p JOIN anch a USING (channel, bucket)),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY channel, bucket
         |    ORDER BY CASE WHEN mid THEN -area ELSE 0.0 END ASC,
         |             CASE WHEN bucket = 47 THEN -ts ELSE ts END ASC) AS rn
         |  FROM scored)
         |SELECT channel, bucket, ts, value FROM ranked
         |WHERE rn = 1 ORDER BY channel, bucket""".stripMargin,

    // alarm dwell rollup: sample-and-hold severity intervals capped at
    // HI, entries = transitions (first sample counts), exact integers
    "arch_alarm_stats" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |iv AS (
         |  SELECT channel, ts, severity,
         |    lag(severity) OVER w AS prev_sev,
         |    coalesce(lead(ts) OVER w, $HI) - ts AS dur
         |  FROM clean WHERE ts >= $LO AND ts < $HI
         |  WINDOW w AS (PARTITION BY channel ORDER BY ts))
         |SELECT channel, severity, CAST(sum(dur) AS BIGINT) AS total_ns,
         |  CAST(sum(CASE WHEN prev_sev IS NULL OR prev_sev <> severity
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_entries,
         |  count(*) AS n_samples
         |FROM iv GROUP BY 1, 2 ORDER BY channel, severity""".stripMargin,

    "arch_decimate_severity" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |${validity("clean")},
         |${slices(P1H)}
         |SELECT channel, win AS win_start, max(severity) AS max_severity,
         |  (max(struct_pack(sev := severity, nts := -ts, st := status))).st AS status_at_max
         |FROM sl GROUP BY 1, 2 ORDER BY channel, win_start""".stripMargin,

    "arch_pick_first" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |${validity("clean")},
         |${slices(P1H)}
         |SELECT channel, win AS win_start, str_value AS first_value, ts AS source_ts
         |FROM sl WHERE lo = win ORDER BY channel, win_start""".stripMargin,

    // Engine-exact mirror of Decimation.reAggregateExact: fine values
    // quantized to the 6dp grid (proven identical cross-engine by the
    // arch_decimate_1h gate), mean/covered_fraction via integer
    // half-up division (bit-identical on any engine), std via IEEE
    // double ops on the same integers.
    "arch_reagg_6h" ->
      s"""${decPrelude(P1H)},
         |q AS (
         |  SELECT channel, win_start,
         |    CAST(round(mean * 1000000.0) AS BIGINT) AS m6,
         |    CAST(round(std * 1000000.0) AS BIGINT) AS s6,
         |    CAST(round(covered_fraction * 1000000.0) AS BIGINT) AS cf6,
         |    min_value, max_value, n_samples
         |  FROM dec),
         |re AS (
         |  SELECT channel, win_start - (win_start % $P6H) AS win_start,
         |    sum(cf6 * m6) AS num_m,
         |    sum(cf6) AS den,
         |    sum(CAST(cf6 AS HUGEINT) * (CAST(s6 AS HUGEINT) * s6 + CAST(m6 AS HUGEINT) * m6)) AS num_v,
         |    min(min_value) AS min_value, max(max_value) AS max_value,
         |    CAST(sum(n_samples) AS BIGINT) AS n_samples
         |  FROM q GROUP BY 1, 2)
         |SELECT channel, win_start,
         |  CASE WHEN den = 0 THEN NULL
         |       WHEN num_m >= 0 THEN CAST((num_m * 2 + den) // (den * 2) AS DOUBLE) / 1000000.0
         |       ELSE -CAST((-(num_m * 2) + den) // (den * 2) AS DOUBLE) / 1000000.0 END AS mean,
         |  CASE WHEN den = 0 THEN NULL ELSE
         |    CAST(round((CASE WHEN (CAST(num_v AS DOUBLE) / (CAST(den AS DOUBLE) * 1000000000000.0)
         |                     - (CAST(num_m AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0)
         |                     * (CAST(num_m AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0)) < 1e-9
         |          THEN 0.0
         |          ELSE sqrt(CAST(num_v AS DOUBLE) / (CAST(den AS DOUBLE) * 1000000000000.0)
         |                     - (CAST(num_m AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0)
         |                     * (CAST(num_m AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0)) END) * 1000000.0) AS BIGINT) / 1000000.0 END AS std,
         |  min_value, max_value,
         |  CAST((den * 2 + 6) // 12 AS DOUBLE) / 1000000.0 AS covered_fraction,
         |  n_samples
         |FROM re ORDER BY channel, win_start""".stripMargin,

    // inter-sample gaps strictly over 15 min (gap_end - gap_start in
    // exact integer ns on both sides)
    "arch_gap_report" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |g AS (
         |  SELECT channel,
         |         lag(ts) OVER (PARTITION BY channel ORDER BY ts) AS gap_start,
         |         ts AS gap_end
         |  FROM clean)
         |SELECT channel, gap_start, gap_end, gap_end - gap_start AS gap_ns
         |FROM g
         |WHERE gap_start IS NOT NULL AND gap_end - gap_start > ${900L * NS}
         |ORDER BY channel, gap_start""".stripMargin,

    // the cross-family health composition: gaps + worst slew rate +
    // trailing-window anomaly count per channel, each family's CTE
    // reusing its standalone oracle's arithmetic verbatim
    "arch_health_report" -> {
      def sq(x: String) =
        s"CAST(CAST(round(($x) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
      s"""WITH $SAMPLES,
         |$CLEAN,
         |b AS (
         |  SELECT channel, count(*) AS n_samples, max(ts) AS last_ts
         |  FROM clean GROUP BY 1),
         |gp AS (
         |  SELECT channel, count(*) AS n_gaps FROM (
         |    SELECT channel, ts,
         |           lag(ts) OVER (PARTITION BY channel ORDER BY ts) AS p
         |    FROM clean)
         |  WHERE p IS NOT NULL AND ts - p > ${900L * NS} GROUP BY 1),
         |rt AS (
         |  SELECT channel,
         |         max(abs((value - pv) * 1000000000.0 /
         |             CAST(ts - pt AS DOUBLE))) AS mar
         |  FROM (
         |    SELECT channel, ts, value,
         |           lag(ts) OVER w AS pt, lag(value) OVER w AS pv
         |    FROM clean
         |    WINDOW w AS (PARTITION BY channel ORDER BY ts))
         |  WHERE pt IS NOT NULL GROUP BY 1),
         |roll AS (
         |  SELECT channel, ts, value,
         |    CAST(sum(CAST(value AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sx,
         |    CAST(sum(CAST(value * value AS DECIMAL(38,12))) OVER w AS DOUBLE)
         |      AS sxx,
         |    count(value) OVER w AS n
         |  FROM clean
         |  WINDOW w AS (PARTITION BY channel ORDER BY ts
         |    RANGE BETWEEN ${3600L * NS} PRECEDING AND CURRENT ROW)),
         |z AS (
         |  SELECT channel, ts, value,
         |    sx / n AS zmean_raw,
         |    CASE WHEN n >= 2 THEN
         |      sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0))
         |    END AS zstd_raw
         |  FROM roll),
         |an AS (
         |  SELECT channel, count(*) AS n_anomalies
         |  FROM z
         |  WHERE zstd_raw > 0
         |    AND abs(${sq("(value - zmean_raw) / zstd_raw")}) > 3.0
         |  GROUP BY 1)
         |SELECT b.channel, b.n_samples, b.last_ts,
         |  coalesce(gp.n_gaps, 0) AS n_gaps,
         |  ${sq("rt.mar")} AS max_abs_rate,
         |  coalesce(an.n_anomalies, 0) AS n_anomalies
         |FROM b
         |LEFT JOIN gp USING (channel)
         |LEFT JOIN rt USING (channel)
         |LEFT JOIN an USING (channel)
         |ORDER BY b.channel""".stripMargin
    },

    // dv/dt per sample: double value delta times 1e9 over the exact
    // integer ns delta, the Spark op order verbatim
    "arch_rate_of_change" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |g AS (
         |  SELECT channel, ts, value,
         |         lag(ts) OVER (PARTITION BY channel ORDER BY ts) AS pt,
         |         lag(value) OVER (PARTITION BY channel ORDER BY ts) AS pv
         |  FROM clean)
         |SELECT channel, ts, value,
         |  CAST(CAST(round(((value - pv) * 1000000000.0 /
         |       CAST(ts - pt AS DOUBLE)) * 1000000.0) AS BIGINT) AS DOUBLE)
         |    / 1e6 AS rate_per_sec
         |FROM g WHERE pt IS NOT NULL
         |ORDER BY channel, ts""".stripMargin,

    // M4 downsampling: first/min/max/last per (channel, bucket) with
    // the EARLIEST ts attaining each extreme — the min/max window CTE
    // + conditional min(ts) mirrors Spark's min_by over (value, ts)
    "arch_m4" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |pts AS (
         |  SELECT channel, ts, value,
         |         least(47, CAST((CAST(ts - $LO AS HUGEINT) * 48)
         |           // ${HI - LO} AS BIGINT)) AS bucket
         |  FROM clean
         |  WHERE ts >= $LO AND ts < $HI AND value IS NOT NULL),
         |x AS (
         |  SELECT *,
         |    min(value) OVER (PARTITION BY channel, bucket) AS bv_min,
         |    max(value) OVER (PARTITION BY channel, bucket) AS bv_max
         |  FROM pts)
         |SELECT channel, bucket,
         |  min(ts) AS t_first, arg_min(value, ts) AS v_first,
         |  min(CASE WHEN value = bv_min THEN ts END) AS t_min,
         |  min(value) AS v_min,
         |  min(CASE WHEN value = bv_max THEN ts END) AS t_max,
         |  max(value) AS v_max,
         |  max(ts) AS t_last, arg_max(value, ts) AS v_last
         |FROM x GROUP BY 1, 2 ORDER BY channel, bucket""".stripMargin,

    // hour-of-day profile: pure integer ns hour (no calendar), DECIMAL
    // sum / count, scaled 6dp round — op order mirrors seasonalProfile
    "arch_seasonal_profile" ->
      s"""WITH $SAMPLES,
         |$CLEAN
         |SELECT channel,
         |  CAST((ts // 3600000000000) % 24 AS INT) AS hour,
         |  count(*) AS n,
         |  CAST(CAST(round((CAST(sum(CAST(value AS DECIMAL(38,12)))
         |      AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE)
         |    / 1e6 AS mean,
         |  min(value) AS v_min,
         |  max(value) AS v_max
         |FROM clean WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY 1, 2 ORDER BY channel, hour""".stripMargin,

    // seasonal anomalies: per-(channel, hour) bands on the 6dp integer
    // grid, exact-Long squared-term flag — mirrors seasonalAnomalies
    "arch_seasonal_anomalies" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |b AS (
         |  SELECT channel, ts,
         |    CAST((ts // 3600000000000) % 24 AS INT) AS hour,
         |    CAST(round(value * 1000000.0) AS BIGINT) AS q
         |  FROM clean WHERE value IS NOT NULL AND NOT isnan(value)),
         |prof AS (
         |  SELECT channel, hour,
         |    CAST(round(CAST(sum(CAST(q AS DECIMAL(19,0))) AS DOUBLE)
         |      / count(*)) AS BIGINT) AS bmean_q,
         |    CAST(round(CAST(sum(CAST(q AS DECIMAL(19,0))
         |        * CAST(q AS DECIMAL(19,0))) AS DOUBLE)
         |      / count(*)) AS BIGINT) AS bm2_q
         |  FROM b GROUP BY 1, 2),
         |p2 AS (
         |  SELECT *, greatest(CAST(0 AS DECIMAL(38,0)),
         |    CAST(bm2_q AS DECIMAL(38,0))
         |      - CAST(bmean_q AS DECIMAL(19,0))
         |        * CAST(bmean_q AS DECIMAL(19,0))) AS bvar_q
         |  FROM prof),
         |f AS (
         |  SELECT b.channel, b.ts,
         |    p2.bvar_q > 0 AND
         |      CAST(b.q - p2.bmean_q AS DECIMAL(19,0))
         |      * CAST(b.q - p2.bmean_q AS DECIMAL(19,0))
         |      > 9 * p2.bvar_q AS is_anom
         |  FROM b JOIN p2 USING (channel, hour))
         |SELECT channel, count(*) AS n_samples,
         |  CAST(coalesce(sum(CASE WHEN is_anom THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_anomalies,
         |  min(CASE WHEN is_anom THEN ts END) AS t_first_anomaly
         |FROM f GROUP BY 1 ORDER BY channel""".stripMargin,

    // threshold crossings at 250: lag comparisons + sample-and-hold
    // time-above — every output an exact integer
    "arch_crossings" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |g AS (
         |  SELECT channel, ts, value,
         |    lag(value) OVER w AS pv,
         |    coalesce(lead(ts) OVER w, $HI) - ts AS dur
         |  FROM clean
         |  WHERE ts >= $LO AND ts < $HI AND value IS NOT NULL
         |  WINDOW w AS (PARTITION BY channel ORDER BY ts))
         |SELECT channel, count(*) AS n_samples,
         |  CAST(coalesce(sum(CASE WHEN pv < 250.0 AND value >= 250.0
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_up,
         |  CAST(coalesce(sum(CASE WHEN pv >= 250.0 AND value < 250.0
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_down,
         |  min(CASE WHEN pv < 250.0 AND value >= 250.0 THEN ts END)
         |    AS t_first_up,
         |  max(CASE WHEN pv < 250.0 AND value >= 250.0 THEN ts END)
         |    AS t_last_up,
         |  CAST(coalesce(sum(CASE WHEN value >= 250.0 THEN dur ELSE 0 END),
         |    0) AS BIGINT) AS above_ns
         |FROM g GROUP BY 1 ORDER BY channel""".stripMargin,

    // spectral power at the candidate-period grid: demeaned 6dp-grid
    // projection against the SHARED quantized cos/sin table, exact
    // DECIMAL sums, fixed-order double power — mirrors Analytics.spectrum
    "arch_spectrum" ->
      (spectrumSql + "\nSELECT * FROM spec ORDER BY channel, period_s"),

    // resolution-aware spectrum: the identical projection chain over
    // the 1 h DECIMATED level's means (quantized like every other
    // decimated consumer) — the cheap path when the suspect periods
    // are all ≫ the level period
    "arch_spectrum_decimated" ->
      s"""${decPrelude(P1H)},
         |b AS (
         |  SELECT channel, win_start AS ts,
         |    CAST(round(mean * 1000000.0) AS BIGINT) AS q
         |  FROM dec
         |  WHERE win_start >= $LO AND win_start < $HI
         |    AND mean IS NOT NULL AND NOT isnan(mean)),
         |${spectrumChain(LO, DecSpectrumPeriods)}
         |SELECT * FROM spec ORDER BY channel, period_s""".stripMargin,

    // cross-spectral density vs the 'click' probe: fixed-order double
    // products of the exact projection casts — mirrors crossSpectrum
    "arch_cross_spectrum" ->
      (spectrumSql + "," +
        s"""
           |a AS (SELECT period_s, n AS n_a, sc AS sc_a, ss AS ss_a,
           |             power AS power_a
           |      FROM spec WHERE channel = 'click'),
           |bb AS (SELECT channel, period_s, n, sc, ss, power FROM spec
           |       WHERE channel <> 'click')
           |SELECT bb.channel, bb.period_s,
           |  (a.sc_a * bb.sc + a.ss_a * bb.ss)
           |    / (CAST(a.n_a AS DOUBLE) * CAST(bb.n AS DOUBLE))
           |    / 1e24 AS cross_re,
           |  (a.ss_a * bb.sc - a.sc_a * bb.ss)
           |    / (CAST(a.n_a AS DOUBLE) * CAST(bb.n AS DOUBLE))
           |    / 1e24 AS cross_im,
           |  a.power_a, bb.power AS power_b
           |FROM bb JOIN a USING (period_s)
           |ORDER BY channel, period_s""".stripMargin),

    // per-channel argmax of the spectrum; power share from 6dp-
    // quantized per-period powers (exact integer total)
    "arch_dominant_period" ->
      (spectrumSql + "," +
        s"""
           |d AS (SELECT *, CAST(round(power * 1000000.0) AS BIGINT) AS pq
           |      FROM spec),
           |t AS (
           |  SELECT channel, period_s, n, power, pq,
           |    sum(pq) OVER (PARTITION BY channel) AS total_q,
           |    row_number() OVER (PARTITION BY channel
           |      ORDER BY power DESC, period_s) AS rn
           |  FROM d)
           |SELECT channel, period_s, n, power,
           |  CASE WHEN total_q > 0
           |    THEN CAST(pq AS DOUBLE) / CAST(total_q AS DOUBLE)
           |    ELSE 0.0 END AS power_share
           |FROM t WHERE rn = 1 ORDER BY channel""".stripMargin),

    // day-cohort retention: exact integer day indices, distinct
    // (user, day) activity, scale-rounded rate — mirrors retentionCohorts
    "events_retention_cohorts" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
         |  FROM events),
         |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
         |a AS (SELECT DISTINCT f.cohort_day, e.day - f.cohort_day AS day_offset,
         |             e.user_id
         |      FROM e JOIN f ON e.user_id = f.user_id),
         |c AS (SELECT cohort_day, day_offset, count(*) AS users
         |      FROM a GROUP BY 1, 2),
         |z AS (SELECT cohort_day, users AS cohort_size FROM c
         |      WHERE day_offset = 0)
         |SELECT c.cohort_day, c.day_offset, CAST(c.users AS BIGINT) AS users,
         |  CAST(CAST(round(CAST(c.users AS DOUBLE)
         |    / CAST(z.cohort_size AS DOUBLE) * 1000000.0) AS BIGINT)
         |    AS DOUBLE) / 1000000.0 AS retention
         |FROM c JOIN z ON c.cohort_day = z.cohort_day
         |ORDER BY c.cohort_day, c.day_offset""".stripMargin,

    // ordered funnel: chained conditional-min CTEs (the sequential
    // form of the Spark side's greedy sorted fold — equal because the
    // first qualifying event in ascending order IS the minimum)
    "events_funnel" -> {
      val W = 3L * 86400L * NS
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events
         |  WHERE event_type IN ('view', 'click', 'purchase')),
         |s0 AS (SELECT user_id, min(ts) AS t0 FROM e
         |       WHERE event_type = 'view' GROUP BY 1),
         |s1 AS (SELECT e.user_id, min(e.ts) AS t1
         |       FROM e JOIN s0 ON e.user_id = s0.user_id
         |       WHERE e.event_type = 'click' AND e.ts > s0.t0
         |         AND e.ts - s0.t0 <= $W GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t2
         |       FROM e JOIN s0 ON e.user_id = s0.user_id
         |            JOIN s1 ON e.user_id = s1.user_id
         |       WHERE e.event_type = 'purchase' AND e.ts > s1.t1
         |         AND e.ts - s0.t0 <= $W GROUP BY 1),
         |c AS (
         |  SELECT 0 AS step, 'view' AS step_name,
         |         (SELECT count(*) FROM s0) AS users
         |  UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
         |  UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2))
         |SELECT CAST(step AS INT) AS step, step_name,
         |  CAST(users AS BIGINT) AS users,
         |  CASE WHEN (SELECT count(*) FROM s0) > 0
         |    THEN CAST(CAST(round(CAST(users AS DOUBLE)
         |      / (SELECT count(*) FROM s0) * 1000000.0) AS BIGINT)
         |      AS DOUBLE) / 1000000.0
         |    ELSE 0.0 END AS conversion
         |FROM c ORDER BY step""".stripMargin
    },

    // staleness report as of HI: median inter-arrival gap (exact
    // interpolated percentile ≡ quantile_cont on integer deltas),
    // expected next arrival, integer-exact overdue flag
    "arch_staleness_report" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |g AS (
         |  SELECT channel, ts,
         |    ts - lag(ts) OVER (PARTITION BY channel ORDER BY ts) AS gap
         |  FROM clean WHERE ts <= $HI),
         |a AS (
         |  SELECT channel, count(*) AS n_samples, max(ts) AS t_last,
         |    CAST(round(quantile_cont(gap, 0.5)) AS BIGINT) AS median_gap_ns
         |  FROM g GROUP BY 1)
         |SELECT channel, n_samples, t_last, median_gap_ns,
         |  CASE WHEN median_gap_ns IS NOT NULL
         |    THEN t_last + median_gap_ns END AS expected_next,
         |  CASE WHEN median_gap_ns IS NOT NULL
         |    THEN $HI > t_last + 3 * median_gap_ns
         |    ELSE true END AS stale
         |FROM a ORDER BY channel""".stripMargin,

    // two-sided CUSUM mean shifts: prefix sums minus running extrema
    // in DECIMAL(38,0), exact integer flags — mirrors cusumShifts
    "arch_cusum_shifts" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |b AS (
         |  SELECT channel, ts, CAST(round(value * 1000000.0) AS BIGINT) AS q
         |  FROM clean
         |  WHERE ts >= $LO AND ts < $HI AND value IS NOT NULL
         |    AND NOT isnan(value)),
         |m AS (
         |  SELECT channel,
         |    CAST(round(CAST(sum(CAST(q AS DECIMAL(19,0))) AS DOUBLE)
         |      / count(*)) AS BIGINT) AS mq
         |  FROM b GROUP BY 1),
         |j AS (
         |  SELECT b.channel, b.ts,
         |    CAST(b.q - m.mq - ${math.round(CusumSlack * 1e6)} AS DECIMAL(38,0)) AS dhi,
         |    CAST(b.q - m.mq + ${math.round(CusumSlack * 1e6)} AS DECIMAL(38,0)) AS dlo
         |  FROM b JOIN m USING (channel)),
         |w AS (
         |  SELECT channel, ts,
         |    sum(dhi) OVER win AS p_hi,
         |    sum(dlo) OVER win AS p_lo
         |  FROM j WINDOW win AS (PARTITION BY channel ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |c AS (
         |  SELECT channel, ts,
         |    p_hi - least(CAST(0 AS DECIMAL(38,0)), min(p_hi) OVER win)
         |      AS cusum_hi,
         |    greatest(CAST(0 AS DECIMAL(38,0)), max(p_lo) OVER win) - p_lo
         |      AS cusum_lo
         |  FROM w WINDOW win AS (PARTITION BY channel ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT channel, count(*) AS n_samples,
         |  CAST(coalesce(sum(CASE WHEN cusum_hi > ${math.round(CusumThreshold * 1e6)}
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hi,
         |  CAST(coalesce(sum(CASE WHEN cusum_lo > ${math.round(CusumThreshold * 1e6)}
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_lo,
         |  min(CASE WHEN cusum_hi > ${math.round(CusumThreshold * 1e6)} THEN ts END)
         |    AS t_first_hi,
         |  min(CASE WHEN cusum_lo > ${math.round(CusumThreshold * 1e6)} THEN ts END)
         |    AS t_first_lo,
         |  CAST(max(cusum_hi) AS DOUBLE) / 1000000.0 AS peak_hi,
         |  CAST(max(cusum_lo) AS DOUBLE) / 1000000.0 AS peak_lo
         |FROM c GROUP BY 1 ORDER BY channel""".stripMargin,

    // top movers: 6dp-quantized half means, exact integer-grid delta,
    // rank by |Δq| desc then channel, top 5
    "arch_top_movers" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |a AS (
         |  SELECT channel,
         |    count(CASE WHEN ts < ${LO + (HI - LO) / 2} THEN 1 END) AS n_a,
         |    count(CASE WHEN ts >= ${LO + (HI - LO) / 2} THEN 1 END) AS n_b,
         |    CAST(sum(CASE WHEN ts < ${LO + (HI - LO) / 2}
         |      THEN CAST(value AS DECIMAL(38,12)) END) AS DOUBLE) AS s_a,
         |    CAST(sum(CASE WHEN ts >= ${LO + (HI - LO) / 2}
         |      THEN CAST(value AS DECIMAL(38,12)) END) AS DOUBLE) AS s_b
         |  FROM clean
         |  WHERE ts >= $LO AND ts < $HI AND value IS NOT NULL
         |  GROUP BY 1),
         |qq AS (
         |  SELECT channel, n_a, n_b,
         |    CAST(round(s_a / CAST(n_a AS DOUBLE) * 1000000.0) AS BIGINT)
         |      AS qa,
         |    CAST(round(s_b / CAST(n_b AS DOUBLE) * 1000000.0) AS BIGINT)
         |      AS qb
         |  FROM a WHERE n_a > 0 AND n_b > 0)
         |SELECT channel, n_a, n_b,
         |  CAST(qa AS DOUBLE) / 1e6 AS mean_a,
         |  CAST(qb AS DOUBLE) / 1e6 AS mean_b,
         |  CAST(qb - qa AS DOUBLE) / 1e6 AS delta
         |FROM qq ORDER BY abs(qb - qa) DESC, channel LIMIT 5""".stripMargin,

    // linear-interpolation resample: the union-merge neighbor lookup
    // (samples sort before probes at equal ts), integer ts differences
    // cast to double for the one division — op order mirrors the Spark
    // plan exactly, scaled 6dp round at the edge
    "arch_resample_linear" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |chans AS (SELECT DISTINCT channel FROM samples),
         |grid AS (SELECT channel, u.g FROM chans,
         |         UNNEST(generate_series($LO, $HI, $P6H)) AS u(g)),
         |m AS (
         |  SELECT channel, ts, value, 0 AS is_probe FROM clean
         |  WHERE value IS NOT NULL
         |  UNION ALL
         |  SELECT channel, g AS ts, NULL AS value, 1 AS is_probe FROM grid),
         |w AS (
         |  SELECT *,
         |    last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER
         |      (PARTITION BY channel ORDER BY ts, is_probe
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ts0,
         |    last_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS) OVER
         |      (PARTITION BY channel ORDER BY ts, is_probe
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
         |    first_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS) OVER
         |      (PARTITION BY channel ORDER BY ts, is_probe
         |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ts1,
         |    first_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS) OVER
         |      (PARTITION BY channel ORDER BY ts, is_probe
         |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1
         |  FROM m)
         |SELECT channel, ts,
         |  CAST(CAST(round((CASE WHEN ts0 = ts THEN v0
         |       WHEN ts0 IS NOT NULL AND ts1 IS NOT NULL
         |       THEN v0 + (v1 - v0) *
         |            (CAST(ts - ts0 AS DOUBLE) / CAST(ts1 - ts0 AS DOUBLE))
         |       END) * 1000000.0) AS BIGINT) AS DOUBLE) / 1e6 AS value
         |FROM w WHERE is_probe = 1
         |ORDER BY channel, ts""".stripMargin,

    "arch_asof_lookup" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |chans AS (SELECT DISTINCT channel FROM samples),
         |grid AS (SELECT channel, u.g FROM chans,
         |         UNNEST(generate_series($LO, $HI, $P6H)) AS u(g))
         |SELECT grid.channel, grid.g, s.value AS held_value, s.ts AS held_ts
         |FROM grid ASOF LEFT JOIN clean s
         |  ON grid.channel = s.channel AND grid.g >= s.ts
         |ORDER BY grid.channel, grid.g""".stripMargin,

    // aligned wide matrix: ASOF join per channel onto the shared 1h
    // grid, pivoted via one conditional aggregate (exactly one held
    // row per (g, channel), so max ≡ Spark's first)
    "arch_aligned_matrix" -> {
      val chans = MatrixChannels.map(c => s"('$c')").mkString(", ")
      val cols = MatrixChannels.map(c =>
        s"max(CASE WHEN channel = '$c' THEN value END) AS \"$c\"")
        .mkString(",\n         |  ")
      s"""WITH $SAMPLES,
         |$CLEAN,
         |grid AS (SELECT c.channel, u.g
         |         FROM (VALUES $chans) c(channel),
         |         UNNEST(generate_series($LO, $HI, $P1H)) AS u(g)),
         |a AS (SELECT grid.channel, grid.g, s.value
         |      FROM grid ASOF LEFT JOIN clean s
         |        ON grid.channel = s.channel AND grid.g >= s.ts)
         |SELECT g AS ts,
         |  $cols
         |FROM a GROUP BY g ORDER BY ts""".stripMargin
    },

    // derived (calculated) channel: click − view on the shared 1h
    // grid — held values are exact copies, one IEEE subtraction is
    // bit-identical across engines, no rounding
    "arch_derived_channel" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |grid AS (SELECT c.channel, u.g
         |         FROM (VALUES ('click'), ('view')) c(channel),
         |         UNNEST(generate_series($LO, $HI, $P1H)) AS u(g)),
         |a AS (SELECT grid.channel, grid.g, s.value
         |      FROM grid ASOF LEFT JOIN clean s
         |        ON grid.channel = s.channel AND grid.g >= s.ts),
         |m AS (SELECT g AS ts,
         |        max(CASE WHEN channel = 'click' THEN value END) AS av,
         |        max(CASE WHEN channel = 'view' THEN value END) AS bv
         |      FROM a GROUP BY g)
         |SELECT 'calc:click-view' AS channel, ts, av - bv AS value
         |FROM m WHERE av IS NOT NULL AND bv IS NOT NULL
         |ORDER BY ts""".stripMargin,

    // config-governed calculated channel: click − view on the 1h grid
    // over the sources' span INTERSECTION (ceil-aligned lo, floor-
    // aligned hi), archived, then the widened serve (inner rows +
    // at-or-before-LO + at-or-after-HI boundaries)
    "arch_calc_configured" -> CalcConfiguredOracle,

    // calc catch-up parity: the incremental build must serve the
    // EXACT all-at-once bytes, so the oracle IS arch_calc_configured's
    "arch_calc_catchup" -> CalcConfiguredOracle,

    // the streaming calc record drained: the batch span-intersection
    // derive (the arch_calc_configured grid WITHOUT the serve step)
    "stream_derived" ->
      s"""WITH $CalcGridCtes
         |SELECT 'calc:cv' AS channel, ts, value FROM d
         |ORDER BY ts""".stripMargin,

    // the streaming calc record over MARKER-BEARING input: a held
    // marker (disconnected source) makes the grid point undefined —
    // the drained stream must drop exactly the points the batch
    // null-hold drops
    "stream_derived_marked" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |$MARKED,
         |${calcGridCtes("marked")}
         |SELECT 'calc:cv' AS channel, ts, value FROM d
         |ORDER BY ts""".stripMargin,

    // lead/lag scan: click held at t vs view held at t + ℓ·1h, ℓ ∈ ±6
    // — 6dp-quantized held values, exact DECIMAL moment sums, the
    // correlatedChannels closed form per lag
    "arch_lag_correlation" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |grid AS (SELECT c.channel, u.g
         |         FROM (VALUES ('click'), ('view')) c(channel),
         |         UNNEST(generate_series($LO, $HI, $P1H)) AS u(g)),
         |h AS (SELECT grid.channel, grid.g, s.value
         |      FROM grid ASOF LEFT JOIN clean s
         |        ON grid.channel = s.channel AND grid.g >= s.ts),
         |m AS (SELECT g AS ts,
         |        max(CASE WHEN channel = 'click' THEN value END) AS av,
         |        max(CASE WHEN channel = 'view' THEN value END) AS bv
         |      FROM h GROUP BY g),
         |qa AS (SELECT ts, CAST(round(av * 1000000.0) AS BIGINT) AS qa
         |       FROM m WHERE av IS NOT NULL),
         |qb AS (SELECT ts AS ts_b, CAST(round(bv * 1000000.0) AS BIGINT) AS qb
         |       FROM m WHERE bv IS NOT NULL),
         |lags AS (SELECT u.l AS lag FROM UNNEST(generate_series(-6, 6)) u(l)),
         |f AS (SELECT lags.lag, qa.qa AS x, qb.qb AS y
         |      FROM lags CROSS JOIN qa
         |      JOIN qb ON qb.ts_b = qa.ts + lags.lag * ${P1H}),
         |a AS (SELECT lag, count(*) AS n,
         |        CAST(sum(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
         |        CAST(sum(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
         |        CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
         |        CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
         |        CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
         |      FROM f GROUP BY lag)
         |SELECT CAST(lag AS INT) AS lag, n AS n_points,
         |  CAST(CAST(round((CASE WHEN
         |      sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |      sqrt(CAST(n AS DOUBLE) * syy - sy * sy) = 0
         |    THEN 0.0
         |    ELSE (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |      (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |       sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) END) * 1000000.0)
         |    AS BIGINT) AS DOUBLE) / 1000000.0 AS corr
         |FROM a ORDER BY lag""".stripMargin,

    // n-ary derived channel: mean of three held sources — identical
    // left-to-right float program on both engines, no rounding
    "arch_derived_nary" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |grid AS (SELECT c.channel, u.g
         |         FROM (VALUES ('click'), ('view'), ('error')) c(channel),
         |         UNNEST(generate_series($LO, $HI, $P1H)) AS u(g)),
         |h AS (SELECT grid.channel, grid.g, s.value
         |      FROM grid ASOF LEFT JOIN clean s
         |        ON grid.channel = s.channel AND grid.g >= s.ts),
         |m AS (SELECT g AS ts,
         |        max(CASE WHEN channel = 'click' THEN value END) AS v1,
         |        max(CASE WHEN channel = 'view' THEN value END) AS v2,
         |        max(CASE WHEN channel = 'error' THEN value END) AS v3
         |      FROM h GROUP BY g)
         |SELECT 'calc:mean3' AS channel, ts,
         |  ((v1 + v2) + v3) / 3.0 AS value
         |FROM m WHERE v1 IS NOT NULL AND v2 IS NOT NULL AND v3 IS NOT NULL
         |ORDER BY ts""".stripMargin,

    // the derived series rolled into 6h epoch-aligned windows: equal
    // grid weights make the time-weighted mean the arithmetic mean
    // (DECIMAL-routed like every gated mean)
    "arch_derived_rollup" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |grid AS (SELECT c.channel, u.g
         |         FROM (VALUES ('click'), ('view')) c(channel),
         |         UNNEST(generate_series($LO, $HI, $P1H)) AS u(g)),
         |a AS (SELECT grid.channel, grid.g, s.value
         |      FROM grid ASOF LEFT JOIN clean s
         |        ON grid.channel = s.channel AND grid.g >= s.ts),
         |m AS (SELECT g AS ts,
         |        max(CASE WHEN channel = 'click' THEN value END) AS av,
         |        max(CASE WHEN channel = 'view' THEN value END) AS bv
         |      FROM a GROUP BY g),
         |d AS (SELECT ts, av - bv AS value FROM m
         |      WHERE av IS NOT NULL AND bv IS NOT NULL)
         |SELECT 'calc:click-view' AS channel,
         |  ts - (ts % ${P6H}) AS win_start,
         |  count(*) AS n,
         |  CAST(CAST(round((CAST(sum(CAST(value AS DECIMAL(38,12)))
         |      AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE)
         |    / 1e6 AS mean,
         |  min(value) AS v_min,
         |  max(value) AS v_max
         |FROM d GROUP BY 1, 2 ORDER BY win_start""".stripMargin,

    // batch form of the streaming threshold-crossing detector: one
    // lag window over value-bearing samples, raw-double comparisons
    // (no arithmetic → engines cannot disagree), threshold 250
    "stream_alerts" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |v AS (
         |  SELECT channel, ts, value,
         |    lag(value) OVER (PARTITION BY channel ORDER BY ts) AS pv
         |  FROM clean WHERE value IS NOT NULL)
         |SELECT channel, ts, value, pv AS prev_value,
         |  CASE WHEN pv <= 250.0 AND value > 250.0
         |       THEN 'rise' ELSE 'fall' END AS kind
         |FROM v
         |WHERE pv IS NOT NULL AND ((pv <= 250.0 AND value > 250.0)
         |   OR (pv > 250.0 AND value <= 250.0))
         |ORDER BY channel, ts""".stripMargin,

    "arch_multilevel_union" ->
      s"""${decPrelude(P1H)}
         |SELECT channel, ts, round(value, 6) AS value, level FROM (
         |  SELECT channel, win_start AS ts, mean AS value,
         |         CAST(${P1H / NS} AS BIGINT) AS level
         |  FROM dec WHERE win_start < $CUT
         |  UNION ALL
         |  SELECT channel, ts, value, CAST(0 AS BIGINT) AS level
         |  FROM clean WHERE ts >= $CUT) u
         |ORDER BY channel, ts, level""".stripMargin,

    "arch_retention" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |m AS (SELECT channel, max(ts) AS t_max FROM clean GROUP BY 1)
         |SELECT c.channel, count(*) AS n_kept, min(c.ts) AS first_ts,
         |       max(c.ts) AS last_ts
         |FROM clean c JOIN m ON c.channel = m.channel
         |WHERE c.ts >= m.t_max - $RET7D
         |GROUP BY c.channel ORDER BY c.channel""".stripMargin,

    // the config-governed serving stack (ConfiguredArchive): channels
    // ranked by name — rank 1 renamed AFTER the store is built, rank 2
    // disabled — each enabled channel served over [LO, HI] under its
    // CURRENT name with the widened-boundary contract: strict-inner
    // rows plus the at-or-before-LO / at-or-after-HI boundary row
    // (clean's per-channel ts are strictly monotonic, so each boundary
    // row is unique)
    "arch_configured_serve" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |chans AS (
         |  SELECT channel, row_number() OVER (ORDER BY channel) AS rn
         |  FROM (SELECT DISTINCT channel FROM samples)),
         |cfg AS (
         |  SELECT channel AS orig,
         |    CASE WHEN rn = 1 THEN channel || '#renamed' ELSE channel END AS name,
         |    (rn <> 2) AS enabled
         |  FROM chans),
         |inner_rows AS (
         |  SELECT channel, ts, value FROM clean WHERE ts > $LO AND ts < $HI),
         |lo_b AS (
         |  SELECT channel, ts, value FROM (
         |    SELECT channel, ts, value,
         |      row_number() OVER (PARTITION BY channel ORDER BY ts DESC) AS k
         |    FROM clean WHERE ts <= $LO) WHERE k = 1),
         |hi_b AS (
         |  SELECT channel, ts, value FROM (
         |    SELECT channel, ts, value,
         |      row_number() OVER (PARTITION BY channel ORDER BY ts ASC) AS k
         |    FROM clean WHERE ts >= $HI) WHERE k = 1),
         |uni AS (
         |  SELECT * FROM inner_rows
         |  UNION SELECT * FROM lo_b
         |  UNION SELECT * FROM hi_b)
         |SELECT g.name AS channel, u.ts, u.value, CAST(0 AS BIGINT) AS level
         |FROM uni u JOIN cfg g ON u.channel = g.orig
         |WHERE g.enabled
         |ORDER BY channel, ts""".stripMargin,

    // disabled-channel serving: every channel archived while enabled,
    // one disabled afterwards — retrieval ignores the enabled flag
    // (the reference's contract), so the oracle is simply the widened
    // serve over EVERY channel, no enabled filter
    "arch_disabled_serve" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |inner_rows AS (
         |  SELECT channel, ts, value FROM clean WHERE ts > $LO AND ts < $HI),
         |lo_b AS (
         |  SELECT channel, ts, value FROM (
         |    SELECT channel, ts, value,
         |      row_number() OVER (PARTITION BY channel ORDER BY ts DESC) AS k
         |    FROM clean WHERE ts <= $LO) WHERE k = 1),
         |hi_b AS (
         |  SELECT channel, ts, value FROM (
         |    SELECT channel, ts, value,
         |      row_number() OVER (PARTITION BY channel ORDER BY ts ASC) AS k
         |    FROM clean WHERE ts >= $HI) WHERE k = 1),
         |uni AS (
         |  SELECT * FROM inner_rows
         |  UNION SELECT * FROM lo_b
         |  UNION SELECT * FROM hi_b)
         |SELECT channel, ts, value, CAST(0 AS BIGINT) AS level
         |FROM uni ORDER BY channel, ts""".stripMargin,

    // the controller's count path: the 1 h decimation chain over CLEAN
    // (the configured store materializes from clean — no marker rows),
    // widened per-window boundaries on both sides. LO/HI are hour-
    // aligned, so the lo boundary is the window starting exactly AT LO
    // (a sample at the bound IS its own boundary sample) and the
    // strict inner excludes it — served once via the union dedup
    "arch_serve_decimated_widened" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |${validity("clean", "_c")},
         |${slices(P1H, "_c")},
         |${decAgg(P1H, "_c")},
         |inner_rows AS (
         |  SELECT channel, win_start AS ts, mean AS value FROM dec_c
         |  WHERE win_start > $LO AND win_start < $HI),
         |lo_b AS (
         |  SELECT channel, win_start AS ts, mean AS value FROM (
         |    SELECT channel, win_start, mean,
         |      row_number() OVER (PARTITION BY channel
         |                         ORDER BY win_start DESC) AS k
         |    FROM dec_c WHERE win_start <= $LO) WHERE k = 1),
         |hi_b AS (
         |  SELECT channel, win_start AS ts, mean AS value FROM (
         |    SELECT channel, win_start, mean,
         |      row_number() OVER (PARTITION BY channel
         |                         ORDER BY win_start ASC) AS k
         |    FROM dec_c WHERE win_start >= $HI) WHERE k = 1),
         |uni AS (
         |  SELECT * FROM inner_rows
         |  UNION SELECT * FROM lo_b
         |  UNION SELECT * FROM hi_b)
         |SELECT channel, ts, round(value, 6) AS value,
         |       CAST(3600 AS BIGINT) AS level
         |FROM uni ORDER BY channel, ts""".stripMargin,

    // explicit per-request limit modes at the serving edge: Exact
    // lower bound (inclusive range edge, NO at-or-before widening) +
    // AT_OR_AFTER upper (strict inner edge, first sample >= HI
    // appended) — all channels enabled, no rename
    "arch_serve_limit_modes" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |inner_rows AS (
         |  SELECT channel, ts, value FROM clean
         |  WHERE ts >= $LO AND ts < $HI),
         |hi_b AS (
         |  SELECT channel, ts, value FROM (
         |    SELECT channel, ts, value,
         |      row_number() OVER (PARTITION BY channel ORDER BY ts ASC) AS k
         |    FROM clean WHERE ts >= $HI) WHERE k = 1),
         |uni AS (
         |  SELECT * FROM inner_rows
         |  UNION SELECT * FROM hi_b)
         |SELECT channel, ts, value, CAST(0 AS BIGINT) AS level
         |FROM uni ORDER BY channel, ts""".stripMargin,

    "chan_registry" ->
      s"""WITH $SAMPLES
         |SELECT channel, count(*) AS n_samples, min(ts) AS first_ts,
         |       max(ts) AS last_ts, max(severity) AS max_severity
         |FROM samples GROUP BY channel ORDER BY channel""".stripMargin,

    "chan_glob" ->
      s"""WITH $SAMPLES
         |SELECT channel, count(*) AS n_samples, min(ts) AS first_ts,
         |       max(ts) AS last_ts, max(severity) AS max_severity
         |FROM samples WHERE channel ILIKE '%u%'
         |GROUP BY channel ORDER BY channel""".stripMargin,

    "arch_auto_resolution" -> {
      val segs = autoSegments
      val chains = segs.map { case (p, _, _) =>
        decChain(p * NS, s"_$p")
      }.mkString(",\n")
      val selects = segs.map { case (p, from, to) =>
        s"""SELECT channel, win_start AS ts, round(mean, 6) AS value,
           |       CAST($p AS BIGINT) AS level
           |FROM dec_$p WHERE win_start BETWEEN $from AND $to""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH $SAMPLES,
         |$CLEAN,
         |$MARKED,
         |$chains
         |SELECT * FROM (
         |  $selects) u
         |ORDER BY channel, ts, level""".stripMargin
    },

    // one-pass mapPartitions path must match the same oracle as the
    // declarative plan — same DecimatorCore math, same output
    "arch_decimate_1h_onepass" ->
      s"""${decPrelude(P1H)}
         |SELECT channel, win_start, round(mean, 6) AS mean, round(std, 6) AS std,
         |  min_value, max_value, round(covered_fraction, 6) AS covered_fraction,
         |  n_samples
         |FROM dec ORDER BY channel, win_start""".stripMargin,

    "arch_decimate_typed" ->
      s"""WITH $SAMPLES,
         |$CLEAN,
         |typed AS (
         |  SELECT channel, ts,
         |    CASE WHEN severity = 3 THEN 'disconnected'
         |         WHEN status >= 6 THEN 'string' ELSE 'double' END AS vtype,
         |    CASE WHEN severity = 3 OR status >= 6 THEN NULL ELSE value END AS value,
         |    str_value, severity, status, sample_id
         |  FROM clean),
         |v AS (
         |  SELECT *, lead(ts) OVER (PARTITION BY channel ORDER BY ts) AS next_ts,
         |         max(ts) OVER (PARTITION BY channel) AS t_max
         |  FROM typed),
         |sl AS (
         |  SELECT channel, ts, value, str_value, vtype,
         |         u.win AS win, GREATEST(ts, u.win) AS lo,
         |         LEAST(next_ts, u.win + $P1H) AS hi
         |  FROM v, UNNEST(generate_series(ts - (ts % $P1H),
         |         (next_ts - 1) - ((next_ts - 1) % $P1H), $P1H)) AS u(win)
         |  WHERE next_ts IS NOT NULL AND u.win + $P1H <= t_max
         |    AND LEAST(next_ts, u.win + $P1H) > GREATEST(ts, u.win)),
         |lvl1 AS (
         |  SELECT channel, win, vtype,
         |    CAST(sum(CAST(hi - lo AS DECIMAL(38,12))) AS DOUBLE) AS cov,
         |    CAST(sum(CAST((hi - lo) * value AS DECIMAL(38,12))) AS DOUBLE) /
         |      CAST(sum(CAST(CASE WHEN value IS NOT NULL THEN hi - lo ELSE 0 END AS DECIMAL(38,12))) AS DOUBLE) AS mean,
         |    CASE WHEN (CAST(sum(CAST((hi - lo) * value * value AS DECIMAL(38,12))) AS DOUBLE) /
         |        CAST(sum(CAST(CASE WHEN value IS NOT NULL THEN hi - lo ELSE 0 END AS DECIMAL(38,12))) AS DOUBLE)
         |      - (CAST(sum(CAST((hi - lo) * value AS DECIMAL(38,12))) AS DOUBLE) /
         |         CAST(sum(CAST(CASE WHEN value IS NOT NULL THEN hi - lo ELSE 0 END AS DECIMAL(38,12))) AS DOUBLE)) ^ 2) < 1e-9
         |      THEN 0.0
         |      ELSE sqrt(CAST(sum(CAST((hi - lo) * value * value AS DECIMAL(38,12))) AS DOUBLE) /
         |        CAST(sum(CAST(CASE WHEN value IS NOT NULL THEN hi - lo ELSE 0 END AS DECIMAL(38,12))) AS DOUBLE)
         |      - (CAST(sum(CAST((hi - lo) * value AS DECIMAL(38,12))) AS DOUBLE) /
         |         CAST(sum(CAST(CASE WHEN value IS NOT NULL THEN hi - lo ELSE 0 END AS DECIMAL(38,12))) AS DOUBLE)) ^ 2) END AS std,
         |    min(lo) AS first_lo,
         |    arg_min(str_value, lo) AS first_str
         |  FROM sl GROUP BY 1, 2, 3),
         |ann AS (
         |  SELECT l.*,
         |    max(CASE WHEN vtype = 'string' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY channel, win) AS has_string,
         |    arg_min(vtype, first_lo)
         |      OVER (PARTITION BY channel, win) AS first_vtype
         |  FROM lvl1 l),
         |sel AS (
         |  SELECT *, row_number() OVER (PARTITION BY channel, win ORDER BY
         |      (CASE WHEN has_string = 1
         |            THEN (CASE WHEN vtype = first_vtype THEN 0 ELSE 1 END)
         |            ELSE 0 END),
         |      (CASE WHEN has_string = 0 THEN -cov ELSE 0.0 END),
         |      vtype) AS rn
         |  FROM ann)
         |SELECT channel, win AS win_start, vtype AS win_type,
         |  CASE WHEN has_string = 0 AND vtype = 'double'
         |       THEN round(mean, 6) END AS mean,
         |  CASE WHEN has_string = 0 AND vtype = 'double'
         |       THEN round(std, 6) END AS std,
         |  CASE WHEN has_string = 1 OR vtype != 'double'
         |       THEN first_str END AS first_value,
         |  round(cov / $P1H.0, 6) AS covered_fraction
         |FROM sel WHERE rn = 1 ORDER BY channel, win_start""".stripMargin,

    "chan_regex" ->
      s"""WITH $SAMPLES
         |SELECT channel, count(*) AS n_samples, min(ts) AS first_ts,
         |       max(ts) AS last_ts, max(severity) AS max_severity
         |FROM samples WHERE regexp_full_match(channel, '(?:click|view)')
         |GROUP BY channel ORDER BY channel""".stripMargin,

    // mirror of ChannelRegistry.configMap's MapType surface, flattened
    // through the same element_at/map_keys accessors
    "chan_config_map" ->
      s"""WITH $SAMPLES,
         |reg AS (SELECT channel, count(*) AS n FROM samples GROUP BY 1)
         |SELECT channel, 'u_' || channel AS unit,
         |       CAST(n % 100 AS VARCHAR) AS rate,
         |       CAST(2 AS INT) AS n_options,
         |       'unit,rate' AS option_keys,
         |       CAST(7 * 86400 AS BIGINT) AS retention_1h
         |FROM reg ORDER BY channel""".stripMargin,
  )
}
