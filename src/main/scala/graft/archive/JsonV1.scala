package graft.archive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S11 — the "JSON archive proxy v1" wire format: one JSON object per
  * sample, streamed at the serving edge. Fresh implementation of the
  * format documented by the reference's serializer
  * (JsonV1SampleSerializer.java: time / severity{level,hasValue} /
  * status / quality / type / value[], aggregates add minimum+maximum),
  * expressed as a codegen'd `to_json(struct(...))` — no per-row Scala.
  */
object JsonV1 {

  private def severityName(level: Column): Column =
    when(level === 0, "OK")
      .when(level === 1, "MINOR")
      .when(level === 2, "MAJOR")
      .otherwise("INVALID")

  /** Serialize raw samples (quality "Original"). Numeric samples emit
    * `type: "double"`; rows with a null value but a string payload emit
    * `type: "string"` with the payload (the reference's string/enum
    * family); pure markers emit no value (hasValue false).
    */
  def serializeRaw(samples: DataFrame): DataFrame = {
    val hasStr = samples.columns.contains("str_value")
    val isString = if (hasStr) col("value").isNull && col("str_value").isNotNull
                   else lit(false)
    val fields = Seq(
      col("ts").as("time"),
      struct(
        severityName(col("severity")).as("level"),
        (col("value").isNotNull || isString).as("hasValue")).as("severity"),
      col("status").cast("string").as("status"),
      lit("Original").as("quality"),
      when(isString, "string").otherwise("double").as("type"),
      array(col("value")).as("value")) ++
      (if (hasStr) Seq(when(isString, array(col("str_value"))).as("strValue"))
       else Nil)
    samples.withColumn("json", to_json(struct(fields: _*)))
  }

  /** Serialize decimated samples (quality "Interpolated", adds
    * minimum/maximum like the reference's aggregated-sample shape).
    */
  def serializeDecimated(decimated: DataFrame): DataFrame =
    decimated.withColumn("json", to_json(struct(
      col("win_start").as("time"),
      struct(
        lit("OK").as("level"),
        col("mean").isNotNull.as("hasValue")).as("severity"),
      lit("Interpolated").as("quality"),
      lit("double").as("type"),
      array(col("mean")).as("value"),
      col("min_value").as("minimum"),
      col("max_value").as("maximum"))))
}
