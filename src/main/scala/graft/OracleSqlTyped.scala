package graft

import graft.core.TypedSamples

/** DuckDB oracle for the 21-type value union: regenerates the typed
  * sample frame with the same engine-portable arithmetic as
  * [[graft.core.TypedSamples.fromEvents]] and mirrors
  * [[graft.archive.TypedDecimation.decimate]]'s two-level dispatch.
  * Type tables (ranks, aggregatable/blocker sets) are generated from
  * the same Scala constants the Spark plan uses — parity by
  * construction.
  */
object OracleSqlTyped {

  import OracleSql.{NS, P1H}

  private def sqlSet(s: Set[String]): String =
    s.toSeq.sorted.map(t => s"'$t'").mkString("(", ", ", ")")

  private val rankCase: String =
    "CASE vtype " + TypedSamples.TypeRank
      .map { case (t, r) => s"WHEN '$t' THEN $r" }.mkString(" ") +
      " ELSE -1 END"

  private val aggTagCase: String =
    "CASE WHEN chosen LIKE 'aggregated%' THEN chosen " +
      "ELSE 'aggregated_' || chosen END"

  /** Mirror of TypedSamples.fromEvents — same formulas, same CASE
    * ladder, over the raw events table.
    */
  val TSAMPLES: String =
    """tsrc AS (
      |  SELECT event_type AS channel, epoch_ns(ts) AS ts, value AS v, props,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |         event_id AS sample_id
      |  FROM events),
      |ttag AS (
      |  SELECT *, (k % 4) AS sev, ((k // 4) % 16) AS m,
      |    CASE
      |      WHEN k % 4 = 3 THEN (CASE WHEN k % 8 = 3 THEN 'disabled' ELSE 'disconnected' END)
      |      WHEN m <= 2 THEN 'scalar_double'
      |      WHEN m = 3 THEN 'array_enum'
      |      WHEN m = 4 THEN 'scalar_float'
      |      WHEN m = 5 THEN 'scalar_long'
      |      WHEN m = 6 THEN 'scalar_short'
      |      WHEN m = 7 THEN 'scalar_char'
      |      WHEN m = 8 THEN 'scalar_enum'
      |      WHEN m = 9 THEN 'scalar_string'
      |      WHEN m = 10 THEN 'array_double'
      |      WHEN m = 11 THEN 'array_long'
      |      WHEN m = 12 THEN 'array_string'
      |      WHEN m = 13 THEN 'aggregated_scalar_double'
      |      WHEN m = 14 THEN 'array_float'
      |      ELSE 'aggregated_scalar_long'
      |    END AS vtype
      |  FROM tsrc),
      |tsamples AS (
      |  SELECT channel, ts, vtype,
      |    CASE vtype
      |      WHEN 'scalar_double' THEN v
      |      WHEN 'scalar_float' THEN CAST(CAST(v AS REAL) AS DOUBLE)
      |      WHEN 'scalar_long' THEN CAST(CAST(round(v) AS INT) - 200 AS DOUBLE)
      |      WHEN 'scalar_short' THEN CAST((CAST(round(v) AS INT) % 100) - 50 AS DOUBLE)
      |      WHEN 'scalar_char' THEN CAST(((k * 3) % 256) - 128 AS DOUBLE)
      |    END AS value,
      |    CASE WHEN vtype = 'scalar_string' THEN substr(props, 1, 40) END AS str_value,
      |    CASE WHEN vtype = 'scalar_enum' THEN CAST(k % 3 AS INT) END AS enum_value,
      |    CASE WHEN vtype IN ('scalar_enum', 'array_enum') THEN ['Yes', 'No', 'Maybe'] END AS labels,
      |    CASE vtype
      |      WHEN 'array_double' THEN [v, v * 0.5, -v]
      |      WHEN 'array_long' THEN [CAST(k AS DOUBLE), CAST(k % 10 AS DOUBLE), round(v)]
      |      WHEN 'array_float' THEN [CAST(CAST(v AS REAL) AS DOUBLE), CAST(CAST(v * 0.25 AS REAL) AS DOUBLE)]
      |      WHEN 'array_enum' THEN [CAST(k % 3 AS DOUBLE), CAST((k + 1) % 3 AS DOUBLE), CAST((k + 2) % 3 AS DOUBLE)]
      |    END AS arr_num,
      |    CASE WHEN vtype = 'array_string' THEN [channel, CAST(k AS VARCHAR)] END AS arr_str,
      |    CASE WHEN vtype LIKE 'aggregated%' THEN v END AS agg_mean,
      |    CASE vtype
      |      WHEN 'aggregated_scalar_double' THEN v * 0.1
      |      WHEN 'aggregated_scalar_long' THEN v * 0.05
      |    END AS agg_std,
      |    CASE vtype
      |      WHEN 'aggregated_scalar_double' THEN v * 0.5
      |      WHEN 'aggregated_scalar_long' THEN round(v * 0.5)
      |    END AS agg_min,
      |    CASE vtype
      |      WHEN 'aggregated_scalar_double' THEN v * 1.5
      |      WHEN 'aggregated_scalar_long' THEN round(v * 2)
      |    END AS agg_max,
      |    CASE WHEN vtype LIKE 'aggregated%' THEN 0.5 + (k % 5) * 0.1 END AS agg_cov,
      |    CASE WHEN k % 4 <> 3 THEN CAST(k % 4 AS INT) END AS severity,
      |    CASE WHEN k % 4 <> 3 THEN CAST(k % 8 AS INT) END AS status,
      |    CASE WHEN numeric_tag THEN 'u' || CAST(k % 3 AS VARCHAR) END AS meta_units,
      |    CASE WHEN floating_tag THEN CAST(k % 4 AS INT) END AS meta_precision,
      |    CASE WHEN numeric_tag THEN -500.0 END AS meta_display_low,
      |    CASE WHEN numeric_tag THEN 500.0 END AS meta_display_high,
      |    CASE WHEN numeric_tag THEN -(CAST(k % 50 AS DOUBLE) + 100.0) END AS meta_warn_low,
      |    CASE WHEN numeric_tag THEN CAST(k % 50 AS DOUBLE) + 100.0 END AS meta_warn_high,
      |    CASE WHEN numeric_tag THEN -(CAST(k % 50 AS DOUBLE) + 200.0) END AS meta_alarm_low,
      |    CASE WHEN numeric_tag THEN CAST(k % 50 AS DOUBLE) + 200.0 END AS meta_alarm_high,
      |    CASE WHEN numeric_tag THEN CAST(k % 50 AS DOUBLE) - 500.0 END AS meta_control_low,
      |    CASE WHEN numeric_tag THEN 500.0 - CAST(k % 50 AS DOUBLE) END AS meta_control_high,
      |    sample_id
      |  FROM (
      |    SELECT *,
      |      (vtype LIKE 'scalar_%' AND vtype NOT IN ('scalar_enum', 'scalar_string'))
      |        OR vtype IN ('array_double', 'array_long', 'array_float')
      |        OR vtype LIKE 'aggregated%' AS numeric_tag,
      |      vtype IN ('scalar_double', 'scalar_float', 'array_double',
      |                'array_float', 'aggregated_scalar_double') AS floating_tag
      |    FROM ttag))""".stripMargin

  /** Dedup + validity + slices over the typed frame (SELECT * forms of
    * OracleSql.CLEAN / validity / slices so every payload column rides
    * along).
    */
  def typedSlices(p: Long): String =
    s"""tclean AS (
       |  SELECT * EXCLUDE (prev_max) FROM (
       |    SELECT s.*, max(ts) OVER (PARTITION BY channel ORDER BY sample_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |    FROM tsamples s) t
       |  WHERE prev_max IS NULL OR ts > prev_max),
       |tv AS (
       |  SELECT *, lead(ts) OVER (PARTITION BY channel ORDER BY ts) AS next_ts,
       |         max(ts) OVER (PARTITION BY channel) AS t_max
       |  FROM tclean),
       |tsl AS (
       |  SELECT tv.* EXCLUDE (next_ts, t_max), u.win AS win,
       |         GREATEST(ts, u.win) AS lo, LEAST(next_ts, u.win + $p) AS hi
       |  FROM tv, UNNEST(generate_series(ts - (ts % $p),
       |         (next_ts - 1) - ((next_ts - 1) % $p), $p)) AS u(win)
       |  WHERE next_ts IS NOT NULL AND u.win + $p <= t_max
       |    AND LEAST(next_ts, u.win + $p) > GREATEST(ts, u.win))""".stripMargin

  /** Two-level typed decimation (mirror of TypedDecimation.decimate). */
  def typedDecimation(p: Long): String = {
    val agg = sqlSet(TypedSamples.Aggregatable)
    val blk = sqlSet(TypedSamples.Blockers)
    s"""pt AS (
       |  SELECT channel, win, vtype,
       |    sum(w) AS covered_ns,
       |    CAST(sum(CAST(w * xm AS DECIMAL(38,12))) AS DOUBLE) AS sum_wx,
       |    CAST(sum(CAST(w * x2 AS DECIMAL(38,12))) AS DOUBLE) AS sum_wx2,
       |    min(minsrc) AS min_v, max(maxsrc) AS max_v,
       |    max(struct_pack(sev := severity, nts := -ts, st := status)) AS sev_struct,
       |    min(ts) AS first_ts,
       |    arg_min(value, ts) AS f_value, arg_min(str_value, ts) AS f_str,
       |    arg_min(enum_value, ts) AS f_enum, arg_min(labels, ts) AS f_labels,
       |    arg_min(arr_num, ts) AS f_arr_num, arg_min(arr_str, ts) AS f_arr_str,
       |    arg_min(severity, ts) AS f_severity, arg_min(status, ts) AS f_status,
       |    arg_min(meta_units, ts) AS f_units, arg_min(meta_precision, ts) AS f_precision,
       |    arg_min(meta_display_low, ts) AS f_display_low, arg_min(meta_display_high, ts) AS f_display_high,
       |    arg_min(meta_warn_low, ts) AS f_warn_low, arg_min(meta_warn_high, ts) AS f_warn_high,
       |    arg_min(meta_alarm_low, ts) AS f_alarm_low, arg_min(meta_alarm_high, ts) AS f_alarm_high,
       |    arg_min(meta_control_low, ts) AS f_control_low, arg_min(meta_control_high, ts) AS f_control_high,
       |    count(*) AS n_samples
       |  FROM (
       |    SELECT *,
       |      CASE WHEN vtype LIKE 'aggregated%'
       |           THEN floor(CAST(hi - lo AS DOUBLE) * agg_cov)
       |           ELSE CAST(hi - lo AS DOUBLE) END AS w,
       |      CASE WHEN vtype LIKE 'aggregated%' THEN agg_mean ELSE value END AS xm,
       |      CASE WHEN vtype LIKE 'aggregated%'
       |           THEN agg_std * agg_std + agg_mean * agg_mean
       |           ELSE value * value END AS x2,
       |      CASE WHEN vtype LIKE 'aggregated%' THEN agg_min ELSE value END AS minsrc,
       |      CASE WHEN vtype LIKE 'aggregated%' THEN agg_max ELSE value END AS maxsrc
       |    FROM tsl)
       |  GROUP BY 1, 2, 3),
       |ch AS (
       |  SELECT channel, win,
       |    count(*) AS n_types,
       |    max(CASE WHEN vtype IN $blk THEN 1 ELSE 0 END) AS has_blocker,
       |    (max(CASE WHEN vtype IN $agg AND covered_ns > 0
       |         THEN struct_pack(c := covered_ns, nr := -($rankCase), vt := vtype) END)).vt AS best_agg,
       |    arg_min(vtype, first_ts) AS first_type
       |  FROM pt GROUP BY 1, 2),
       |td AS (
       |  SELECT pt.*,
       |    CASE WHEN ch.n_types > 1 AND ch.has_blocker = 0 AND ch.best_agg IS NOT NULL
       |         THEN ch.best_agg ELSE ch.first_type END AS chosen
       |  FROM pt JOIN ch USING (channel, win)),
       |tdec AS (
       |  SELECT channel, win AS win_start,
       |    CASE WHEN is_agg THEN $aggTagCase ELSE chosen END AS vtype,
       |    CASE WHEN is_agg THEN sum_wx / covered_ns END AS mean,
       |    CASE WHEN is_agg THEN (
       |      CASE WHEN (sum_wx2 / covered_ns - (sum_wx / covered_ns) * (sum_wx / covered_ns)) < 1e-9
       |           THEN 0.0
       |           ELSE sqrt(sum_wx2 / covered_ns - (sum_wx / covered_ns) * (sum_wx / covered_ns)) END) END AS std,
       |    CASE WHEN is_agg THEN min_v END AS min_value,
       |    CASE WHEN is_agg THEN max_v END AS max_value,
       |    CASE WHEN is_agg THEN covered_ns / $p.0 END AS covered_fraction,
       |    CASE WHEN is_agg THEN (sev_struct).sev END AS max_severity,
       |    CASE WHEN is_agg THEN (sev_struct).st END AS status_at_max,
       |    CASE WHEN NOT is_agg THEN f_value END AS first_value,
       |    f_str AS first_str, f_enum AS enum_value, f_labels AS labels,
       |    f_arr_num AS arr_num, f_arr_str AS arr_str,
       |    CASE WHEN NOT is_agg THEN f_severity END AS severity,
       |    CASE WHEN NOT is_agg THEN f_status END AS status,
       |    f_units AS meta_units, f_precision AS meta_precision,
       |    f_display_low AS meta_display_low, f_display_high AS meta_display_high,
       |    f_warn_low AS meta_warn_low, f_warn_high AS meta_warn_high,
       |    f_alarm_low AS meta_alarm_low, f_alarm_high AS meta_alarm_high,
       |    f_control_low AS meta_control_low, f_control_high AS meta_control_high,
       |    n_samples
       |  FROM (SELECT *, chosen IN $agg AS is_agg FROM td WHERE vtype = chosen))""".stripMargin
  }

  private val numArrStr =
    (c: String) => s"'[' || array_to_string(list_transform($c, " +
      s"x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)), ',') || ']'"
  private val strArrStr =
    (c: String) => s"'[' || array_to_string($c, ',') || ']'"

  def prelude(p: Long): String =
    s"WITH $TSAMPLES,\n${typedSlices(p)},\n${typedDecimation(p)}"

  private val decOutCols: String =
    s"""channel, win_start, vtype, round(mean, 6) AS mean, round(std, 6) AS std,
       |  min_value, max_value, round(covered_fraction, 6) AS covered_fraction,
       |  max_severity, status_at_max, first_value, first_str, enum_value,
       |  ${strArrStr("labels")} AS labels_str,
       |  ${numArrStr("arr_num")} AS arr_num_str,
       |  ${strArrStr("arr_str")} AS arr_str_str,
       |  severity, status, meta_units, meta_precision,
       |  meta_display_low, meta_display_high, meta_warn_low, meta_warn_high,
       |  meta_alarm_low, meta_alarm_high, meta_control_low, meta_control_high,
       |  n_samples""".stripMargin

  val all: Map[String, String] = Map(
    // mirror of the EPICS Archiver Appliance JSON ingest fixture
    // (EpicsArchiverJson.writeFixture): 8 PVs x 60 samples, vtype by
    // p%8, engine-portable quarter/half arithmetic, EGU/PREC on the
    // even numeric PVs — the decoded rows must equal this regeneration
    "epics_json_ingest" ->
      s"""WITH g AS (
         |  SELECT p.p, j.j
         |  FROM generate_series(0, 7) AS p(p),
         |       generate_series(0, 59) AS j(j))
         |SELECT
         |  'epics:pv' || p AS channel,
         |  CAST((1704067200 + j*60 + p) * 1000000000 + j*1000 AS BIGINT)
         |    AS ts,
         |  CASE p % 8 WHEN 0 THEN 'scalar_double' WHEN 1 THEN 'scalar_float'
         |    WHEN 2 THEN 'scalar_long' WHEN 3 THEN 'scalar_short'
         |    WHEN 4 THEN 'scalar_char' WHEN 5 THEN 'scalar_enum'
         |    WHEN 6 THEN 'scalar_string' ELSE 'array_double' END AS vtype,
         |  CASE p % 8 WHEN 0 THEN (p*1000 + j) * 0.25
         |    WHEN 1 THEN (p*1000 + j) * 0.5
         |    WHEN 2 THEN CAST(p*1000 + j - 500 AS DOUBLE)
         |    WHEN 3 THEN CAST((p*13 + j) % 200 - 100 AS DOUBLE)
         |    WHEN 4 THEN CAST((p*7 + j) % 256 - 128 AS DOUBLE)
         |    END AS value,
         |  CASE WHEN p % 8 = 6 THEN 's' || p || '_' || j END AS str_value,
         |  CASE WHEN p % 8 = 5 THEN CAST(j % 3 AS INT) END AS enum_value,
         |  CASE WHEN p % 8 = 5 THEN '[Off,On,Fault]' END AS labels,
         |  CASE WHEN p % 8 = 7 THEN '[' ||
         |    CAST(CAST(round((p*1000 + j) * 0.25, 6) AS DECIMAL(18,6)) AS VARCHAR)
         |    || ',' ||
         |    CAST(CAST(round((p*1000 + j) * 0.125, 6) AS DECIMAL(18,6)) AS VARCHAR)
         |    || ',' ||
         |    CAST(CAST(round(-(p*1000 + j) * 0.25, 6) AS DECIMAL(18,6)) AS VARCHAR)
         |    || ']' END AS arr_num,
         |  CAST(j % 4 AS INT) AS severity,
         |  CAST(j % 8 AS INT) AS status,
         |  CASE WHEN p % 2 = 0 AND p % 8 <> 6 THEN 'mm' END AS meta_units,
         |  CASE WHEN p % 2 = 0 AND p % 8 IN (0, 1, 7) THEN CAST(2 AS INT)
         |    END AS meta_precision
         |FROM g
         |ORDER BY channel, ts""".stripMargin,

    // mirror of Analytics.waveformStats: posexplode over the array
    // vtypes (UNNEST(range) + v[i+1] — this DuckDB has no WITH
    // ORDINALITY), DECIMAL-routed means, scaled 6dp round
    "arch_waveform_stats" ->
      s"""WITH $TSAMPLES,
         |w AS (SELECT channel, vtype, arr_num FROM tsamples
         |      WHERE vtype IN ('array_double', 'array_long', 'array_float')),
         |e AS (SELECT channel, vtype, CAST(i AS INT) AS idx,
         |             arr_num[i+1] AS v
         |      FROM w, UNNEST(range(0, len(arr_num))) g(i))
         |SELECT channel, vtype, idx, count(*) AS n,
         |  CAST(CAST(round((CAST(sum(CAST(v AS DECIMAL(38,12)))
         |      AS DOUBLE) / count(*)) * 1000000.0) AS BIGINT) AS DOUBLE)
         |    / 1e6 AS mean,
         |  min(v) AS v_min,
         |  max(v) AS v_max
         |FROM e GROUP BY 1, 2, 3 ORDER BY channel, vtype, idx""".stripMargin,

    "arch_typed_roundtrip" ->
      s"""WITH $TSAMPLES
         |SELECT channel, ts, vtype, value, str_value, enum_value,
         |  ${strArrStr("labels")} AS labels_str,
         |  ${numArrStr("arr_num")} AS arr_num_str,
         |  ${strArrStr("arr_str")} AS arr_str_str,
         |  agg_mean, agg_std, agg_min, agg_max, round(agg_cov, 6) AS agg_cov,
         |  severity, status, meta_units, meta_precision,
         |  meta_display_low, meta_display_high, meta_warn_low, meta_warn_high,
         |  meta_alarm_low, meta_alarm_high, meta_control_low, meta_control_high,
         |  sample_id
         |FROM tsamples ORDER BY channel, sample_id""".stripMargin,

    "arch_decimate_typed21" ->
      s"""${prelude(P1H)}
         |SELECT $decOutCols
         |FROM tdec ORDER BY channel, win_start""".stripMargin,

    // the one-pass sorted execution must match the same dispatch
    // oracle (reduced to the columns the state machine carries)
    "arch_decimate_typed21_onepass" ->
      s"""${prelude(P1H)}
         |SELECT channel, win_start, vtype, round(mean, 6) AS mean,
         |  round(std, 6) AS std, min_value, max_value,
         |  round(covered_fraction, 6) AS covered_fraction,
         |  max_severity, status_at_max, first_value, enum_value, n_samples
         |FROM tdec ORDER BY channel, win_start""".stripMargin,

    "arch_decimate_enum" ->
      s"""${prelude(P1H)}
         |SELECT channel, win_start, vtype, enum_value, labels[enum_value + 1] AS label,
         |  ${strArrStr("labels")} AS labels_str, severity, status
         |FROM tdec WHERE vtype = 'scalar_enum'
         |ORDER BY channel, win_start""".stripMargin,

    "arch_decimate_array" ->
      s"""${prelude(P1H)}
         |SELECT channel, win_start, vtype,
         |  ${numArrStr("arr_num")} AS arr_num_str,
         |  ${strArrStr("arr_str")} AS arr_str_str,
         |  severity, status, meta_units
         |FROM tdec WHERE vtype LIKE 'array%'
         |ORDER BY channel, win_start""".stripMargin)
}
