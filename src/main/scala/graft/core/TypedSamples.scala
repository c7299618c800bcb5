package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full 21-type sample value union of the reference
  * (ChannelAccessSampleType.java:18-128), mapped per SURVEY §1.3/§1.4:
  * a `vtype` tag column plus nullable typed payload columns — numeric
  * scalars promoted to double, numeric arrays to array<double>, plus
  * string/enum/array-string payloads, the aggregated-sample struct
  * flattened, and the per-sample numeric metadata (units, precision,
  * four limit pairs — ChannelAccessSampleValueAccess.java:86-211).
  *
  * Type tags mirror the reference enum, lowercase. `rank` is the enum
  * declaration ordinal — the reference iterates an EnumMap in this
  * order when breaking covered-period ties during mixed-type
  * decimation (ChannelAccessSampleDecimator.java:148-186), so the
  * ordinal is semantically load-bearing.
  */
object TypedSamples {

  /** Enum declaration order of ChannelAccessSampleType.java:18-128. */
  val TypeRank: Seq[(String, Int)] = Seq(
    "aggregated_scalar_char" -> 0, "aggregated_scalar_double" -> 1,
    "aggregated_scalar_float" -> 2, "aggregated_scalar_long" -> 3,
    "aggregated_scalar_short" -> 4,
    "array_char" -> 5, "array_double" -> 6, "array_enum" -> 7,
    "array_float" -> 8, "array_long" -> 9, "array_short" -> 10,
    "array_string" -> 11,
    "disabled" -> 12, "disconnected" -> 13,
    "scalar_char" -> 14, "scalar_double" -> 15, "scalar_enum" -> 16,
    "scalar_float" -> 17, "scalar_long" -> 18, "scalar_short" -> 19,
    "scalar_string" -> 20)

  /** Types whose samples can be merged into an AGGREGATED_SCALAR_*
    * output (ChannelAccessSampleDecimator.java:27-35): the five numeric
    * scalars and the five aggregated forms. Enum, string, and every
    * array type are pick-first only.
    */
  val Aggregatable: Set[String] = Set(
    "scalar_char", "scalar_double", "scalar_float", "scalar_long",
    "scalar_short",
    "aggregated_scalar_char", "aggregated_scalar_double",
    "aggregated_scalar_float", "aggregated_scalar_long",
    "aggregated_scalar_short")

  /** Marker types: occupy time, never block aggregation of the rest
    * (ChannelAccessSampleDecimator.java:169-173).
    */
  val Markers: Set[String] = Set("disabled", "disconnected")

  /** Non-aggregatable, non-marker: their presence in a mixed window
    * forces the first-type rule (ChannelAccessSampleDecimator.java:174-181).
    */
  val Blockers: Set[String] =
    TypeRank.map(_._1).toSet -- Aggregatable -- Markers

  /** Output tag of the aggregation route: scalar_X and
    * aggregated_scalar_X both produce aggregated_scalar_X.
    */
  def aggregatedTag(tag: String): String =
    if (tag.startsWith("aggregated_")) tag else s"aggregated_$tag"

  /** The element kind of a tag's min/max and value payload — "long"
    * for the integer families (char/short/long/enum), "double" for
    * float/double, "string" otherwise. JSON v1 formats per kind.
    */
  def elementKind(tag: String): String = {
    val t = tag.stripPrefix("aggregated_").stripPrefix("array_")
      .stripPrefix("scalar_")
    t match {
      case "char" | "short" | "long" | "enum" => "long"
      case "double" | "float" => "double"
      case _ => "string"
    }
  }

  /** Deterministic typed sample frame from the synthetic events table —
    * the typed analog of [[Samples.fromEvents]]. The tag and every
    * payload derive from `k` (the json props payload) and `value`
    * with engine-portable arithmetic, so the DuckDB oracle regenerates
    * the identical frame (OracleSqlTyped mirrors each formula).
    *
    * Tag selector m = (k div 4) mod 16 is decoupled from the
    * severity selector (k mod 4) so every tag family appears both with
    * and without marker interleaving. Covers 15 of the 21 tags as
    * inputs (plus both markers); the remaining aggregated/array
    * element-width variants share their family's code path exactly as
    * in the reference's own tests
    * (ChannelAccessSampleDecimatorTest.java:838-842).
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // Two-stage projection, deliberately: k (a JSON parse) and the
    // 16-branch vtype CASE are materialized as columns first, so the
    // payload CASEs below reference plain attributes. Inlining them
    // would copy the whole vtype tree (and its JSON parse) into every
    // payload column — an expression blow-up that measured 5× slower.
    // CollapseProject keeps the stage split because the staged
    // expressions are non-cheap and multiply referenced.
    // The synthetic events file is a single parquet row group, so the
    // scan is one task no matter what maxPartitionBytes says; spread
    // the raw rows BEFORE the 20-column typed projection or the JSON
    // parse below runs serially (and twice, when a downstream orderBy
    // samples for its range partitioner). Generator-only concern: real
    // ingest arrives pre-partitioned.
    val ev0 = Tables.events(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    // The parse is staged in its OWN projection and FENCED (a value-
    // preserving nondeterministic identity: shuffle of a 1-element
    // array). Without the fence, a consumer's filter on any derived
    // column (vtype, agg_std, ...) is pushed back through the staging
    // projections, inlining the 16-branch CASE — and its JSON parse —
    // once per conjunct into a Filter BELOW the spread repartition,
    // where it runs serially on the single-row-group scan task;
    // FilterExec does no common-subexpression elimination across an
    // inlined predicate tree, so the pushed-down form re-parses the
    // JSON ~6-20× per row (measured: 3.1 s of arch_waveform_stats'
    // sf0.1 gate). PushPredicateThroughNonJoin refuses to cross a
    // projection with a nondeterministic field, so predicates now
    // evaluate right above this projection — over the materialized _k
    // attribute, one parse per row, in parallel. The parse must sit
    // ALONE in this stage: the dispatch columns derive from the _k
    // attribute one stage up, because codegen subexpression
    // elimination skips nondeterministic trees and would otherwise
    // re-evaluate the fenced parse per staged column. Derived-column
    // predicates could never reach the parquet scan anyway (pushable
    // raw-column predicates ride ts_raw / channel via
    // ArchiveReader.pushdownHint on the store path).
    val rawTs0 =
      if (ev0.columns.contains("ts_src")) col("ts_src") else col("ts")
    val evK = ev0.select(col("event_type"), col("ts"), col("value"),
      col("props"), col("event_id"), rawTs0.as("_ts_src"),
      element_at(shuffle(array(
        get_json_object(col("props"), "$.k").cast("int"))), 1).as("_k"))
    val k0 = col("_k")
    val sev0 = pmod(k0, lit(4)).cast("int")
    val m0 = (k0 / 4).cast("int") % 16
    val marker0 = sev0 === 3
    val vtype0 =
      when(marker0, when(pmod(k0, lit(8)) === 3, lit("disabled"))
        .otherwise(lit("disconnected")))
        .when(m0 <= 2, lit("scalar_double"))
        .when(m0 === 3, lit("array_enum"))
        .when(m0 === 4, lit("scalar_float"))
        .when(m0 === 5, lit("scalar_long"))
        .when(m0 === 6, lit("scalar_short"))
        .when(m0 === 7, lit("scalar_char"))
        .when(m0 === 8, lit("scalar_enum"))
        .when(m0 === 9, lit("scalar_string"))
        .when(m0 === 10, lit("array_double"))
        .when(m0 === 11, lit("array_long"))
        .when(m0 === 12, lit("array_string"))
        .when(m0 === 13, lit("aggregated_scalar_double"))
        .when(m0 === 14, lit("array_float"))
        .otherwise(lit("aggregated_scalar_long"))
    // _ts_src: the untruncated source timestamp in its parquet-native
    // type (Long ns legacy, timestamp µs current) — kept for ts_raw so
    // range predicates stay pushable (ArchiveReader.pushdownHint)
    val ev = evK.select(col("event_type"), col("ts"), col("value"),
      col("props"), col("event_id"), col("_ts_src"),
      col("_k"), sev0.as("_sev"), marker0.as("_marker"),
      vtype0.as("_vtype"))

    val k = col("_k")
    val v = col("value")
    val sev = col("_sev")
    val marker = col("_marker")
    val vtype = col("_vtype")

    // numeric scalar payload, promoted to double with the element
    // type's rounding applied at generation time (float via a float
    // round-trip; integer families via round)
    val longVal = round(v, 0).cast("int") - 200
    val shortVal = pmod(round(v, 0).cast("int"), lit(100)) - 50
    val charVal = pmod(k * 3, lit(256)) - 128
    val value =
      when(vtype === "scalar_double", v)
        .when(vtype === "scalar_float", v.cast("float").cast("double"))
        .when(vtype === "scalar_long", longVal.cast("double"))
        .when(vtype === "scalar_short", shortVal.cast("double"))
        .when(vtype === "scalar_char", charVal.cast("double"))

    val enumValue = when(vtype === "scalar_enum", pmod(k, lit(3)).cast("int"))
    // both enum families carry the state labels; the array variant's
    // element indices ride arr_num (the long-element payload family)
    val labels = when(vtype.isin("scalar_enum", "array_enum"),
      array(lit("Yes"), lit("No"), lit("Maybe")))
    val strValue = when(vtype === "scalar_string", substring(col("props"), 1, 40))

    val arrNum =
      when(vtype === "array_double", array(v, v * 0.5, -v))
        .when(vtype === "array_long", array(k.cast("double"),
          pmod(k, lit(10)).cast("double"), round(v, 0)))
        .when(vtype === "array_float",
          array(v.cast("float").cast("double"),
            (v * 0.25).cast("float").cast("double")))
        .when(vtype === "array_enum",
          array(pmod(k, lit(3)).cast("double"),
            pmod(k + 1, lit(3)).cast("double"),
            pmod(k + 2, lit(3)).cast("double")))
    val arrStr = when(vtype === "array_string",
      array(col("event_type"), k.cast("string")))

    val isAggIn = vtype.startsWith("aggregated_")
    val aggMean = when(isAggIn, v)
    val aggStd = when(vtype === "aggregated_scalar_double", v * 0.1)
      .when(vtype === "aggregated_scalar_long", v * 0.05)
    val aggMin = when(vtype === "aggregated_scalar_double", v * 0.5)
      .when(vtype === "aggregated_scalar_long", round(v * 0.5, 0))
    val aggMax = when(vtype === "aggregated_scalar_double", v * 1.5)
      .when(vtype === "aggregated_scalar_long", round(v * 2, 0))
    val aggCov = when(isAggIn, lit(0.5) + pmod(k, lit(5)) * 0.1)

    // numeric metadata travels with every numeric-valued tag
    // (ChannelAccessSampleValueAccess.java:119-176); precision only for
    // the float/double families; enums carry labels instead.
    // enums (scalar and array) carry enum metadata (labels), never the
    // numeric block, per JsonV1SampleSerializer.java:373,451
    val numericTag = value.isNotNull ||
      (arrNum.isNotNull && vtype =!= "array_enum") || isAggIn
    val floatingTag = vtype.isin("scalar_double", "scalar_float",
      "array_double", "array_float", "aggregated_scalar_double")
    val lim = pmod(k, lit(50)).cast("double")

    ev.select(
      col("event_type").as("channel"),
      (col("ts") - pmod(col("ts"), lit(1000L))).as("ts"),
      vtype.as("vtype"),
      value.as("value"),
      strValue.as("str_value"),
      enumValue.as("enum_value"),
      labels.as("labels"),
      arrNum.as("arr_num"),
      arrStr.as("arr_str"),
      aggMean.as("agg_mean"), aggStd.as("agg_std"),
      aggMin.as("agg_min"), aggMax.as("agg_max"), aggCov.as("agg_cov"),
      when(!marker, sev).as("severity"),
      when(!marker, pmod(k, lit(8)).cast("int")).as("status"),
      when(numericTag, concat(lit("u"), pmod(k, lit(3)))).as("meta_units"),
      when(floatingTag, pmod(k, lit(4)).cast("int")).as("meta_precision"),
      when(numericTag, lit(-500.0)).as("meta_display_low"),
      when(numericTag, lit(500.0)).as("meta_display_high"),
      when(numericTag, -(lim + 100.0)).as("meta_warn_low"),
      when(numericTag, lim + 100.0).as("meta_warn_high"),
      when(numericTag, -(lim + 200.0)).as("meta_alarm_low"),
      when(numericTag, lim + 200.0).as("meta_alarm_high"),
      when(numericTag, lim - 500.0).as("meta_control_low"),
      when(numericTag, lit(500.0) - lim).as("meta_control_high"),
      col("event_id").as("sample_id"),
      col("_ts_src").as("ts_raw"))
  }

  /** Canonical array-free rendering of an array<double> column for
    * oracle-gated output: each element rounded to 6dp and rendered
    * through DECIMAL(18,6) so Spark and DuckDB print identical digits.
    */
  def numArrayToString(c: Column): Column =
    when(c.isNotNull, concat(lit("["),
      array_join(transform(c,
        x => round(x, 6).cast("decimal(18,6)").cast("string")), ","),
      lit("]")))

  /** Same for array<string>. */
  def strArrayToString(c: Column): Column =
    when(c.isNotNull, concat(lit("["), array_join(c, ","), lit("]")))
}
