package graft

/** DuckDB oracle that reassembles the JSON v1 wire format byte by
  * byte — the gate then checks the serializer's exact output (field
  * order, Jackson number text, escaping), not just row counts.
  *
  * One deliberate, symmetric restriction: Java prints |x| < 1e-3 in
  * scientific notation ("5.0E-4") where DuckDB prints "0.0005", so
  * rows whose only sub-milli double (agg_std of small aggregated
  * samples, ~0.04% of rows) falls in that range are filtered on BOTH
  * sides; the small-magnitude formatting itself is covered by the
  * byte-exact ScalaTest goldens.
  */
object OracleSqlJson {

  /** Rows whose serialized doubles all lie in Java's plain-notation
    * range [1e-3, 1e7). Mirrored in SparkEntry's json_v1_typed.
    */
  val PlainRange: String =
    "(agg_std IS NULL OR agg_std = 0 OR abs(agg_std) >= 0.001)"

  private val sevLevel =
    """CASE COALESCE(severity, 3) WHEN 0 THEN 'OK' WHEN 1 THEN 'MINOR'
      |     WHEN 2 THEN 'MAJOR' ELSE 'INVALID' END""".stripMargin
  private val statusName =
    """CASE status WHEN 0 THEN 'NO_ALARM' WHEN 1 THEN 'READ'
      |     WHEN 2 THEN 'WRITE' WHEN 3 THEN 'HIHI' WHEN 4 THEN 'HIGH'
      |     WHEN 5 THEN 'LOLO' WHEN 6 THEN 'LOW' ELSE 'STATE' END""".stripMargin

  private def common(status: String, hasValue: String) =
    s"""'{"time":' || ts || ',"severity":{"level":"' || $sevLevel ||
       |'","hasValue":$hasValue},"status":"' || $status || '","quality":"Original"'""".stripMargin

  private val numericMeta =
    """CASE WHEN meta_units IS NOT NULL THEN
      |  ',"metaData":{"type":"numeric","precision":' || COALESCE(meta_precision, 0) ||
      |  ',"units":"' || meta_units ||
      |  '","displayLow":' || CAST(meta_display_low AS VARCHAR) ||
      |  ',"displayHigh":' || CAST(meta_display_high AS VARCHAR) ||
      |  ',"warnLow":' || CAST(meta_warn_low AS VARCHAR) ||
      |  ',"warnHigh":' || CAST(meta_warn_high AS VARCHAR) ||
      |  ',"alarmLow":' || CAST(meta_alarm_low AS VARCHAR) ||
      |  ',"alarmHigh":' || CAST(meta_alarm_high AS VARCHAR) || '}'
      |ELSE '' END""".stripMargin

  private val enumMeta =
    """CASE WHEN labels IS NOT NULL THEN
      |  ',"metaData":{"type":"enum","states":[' ||
      |  array_to_string(list_transform(labels, x -> CAST(to_json(x) AS VARCHAR)), ',') || ']}'
      |ELSE '' END""".stripMargin

  private val longValues =
    """CASE WHEN value IS NOT NULL THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
      |ELSE array_to_string(list_transform(arr_num,
      |       x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') END""".stripMargin
  private val doubleValues =
    """CASE WHEN value IS NOT NULL THEN CAST(value AS VARCHAR)
      |ELSE array_to_string(list_transform(arr_num,
      |       x -> CAST(x AS VARCHAR)), ',') END""".stripMargin
  private val stringValues =
    """CASE WHEN str_value IS NOT NULL THEN CAST(to_json(str_value) AS VARCHAR)
      |ELSE array_to_string(list_transform(arr_str, x -> CAST(to_json(x) AS VARCHAR)), ',') END""".stripMargin

  /** The per-family JSON assembly over a `tsamples`-schema relation. */
  val JsonExpr: String =
    s"""CASE
       |WHEN vtype IN ('scalar_char', 'scalar_short', 'scalar_long',
       |               'array_char', 'array_short', 'array_long') THEN
       |  ${common(statusName, "true")} || $numericMeta ||
       |  ',"type":"long","value":[' || $longValues || ']}'
       |WHEN vtype IN ('scalar_double', 'scalar_float',
       |               'array_double', 'array_float') THEN
       |  ${common(statusName, "true")} || $numericMeta ||
       |  ',"type":"double","value":[' || $doubleValues || ']}'
       |WHEN vtype IN ('scalar_enum', 'array_enum') THEN
       |  ${common(statusName, "true")} || $enumMeta ||
       |  ',"type":"enum","value":[' ||
       |  (CASE WHEN enum_value IS NOT NULL THEN CAST(enum_value AS VARCHAR)
       |        ELSE array_to_string(list_transform(arr_num,
       |               x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') END) || ']}'
       |WHEN vtype IN ('scalar_string', 'array_string') THEN
       |  ${common(statusName, "true")} ||
       |  ',"type":"string","value":[' || $stringValues || ']}'
       |WHEN vtype LIKE 'aggregated%' THEN
       |  ${common(statusName, "true")} || $numericMeta ||
       |  ',"type":"minMaxDouble","value":[' || CAST(agg_mean AS VARCHAR) ||
       |  '],"minimum":' || CAST(agg_min AS VARCHAR) ||
       |  ',"maximum":' || CAST(agg_max AS VARCHAR) || '}'
       |ELSE
       |  '{"time":' || ts || ',"severity":{"level":"INVALID","hasValue":false},"status":"' ||
       |  (CASE vtype WHEN 'disabled' THEN 'Archive_Disabled' ELSE 'Disconnected' END) ||
       |  '","quality":"Original","type":"string","value":["' ||
       |  (CASE vtype WHEN 'disabled' THEN 'Archive_Disabled' ELSE 'Disconnected' END) ||
       |  '"]}'
       |END""".stripMargin

  val all: Map[String, String] = Map(
    "json_v1_typed" ->
      s"""WITH ${OracleSqlTyped.TSAMPLES}
         |SELECT channel, sample_id, $JsonExpr AS json
         |FROM tsamples
         |WHERE $PlainRange
         |ORDER BY channel, sample_id""".stripMargin)
}
