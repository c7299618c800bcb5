package graft.archive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Samples

/** Trailing (sliding) time-window aggregates over the canonical sample
  * frame — the analytics companion to the tumbling decimation family
  * (SURVEY.md W1): for every sample, the mean/min/max/count of the
  * channel's samples in the trailing `windowSec` seconds, inclusive on
  * both ends (`[ts - W, ts]`).
  *
  * The reference serves only epoch-aligned tumbling levels
  * (ArchivedChannelDecimationLevel.java); a trailing window is the
  * "smoothed trend at full resolution" its users compute downstream of
  * the sample API. Plan shape at 100 TB: ONE shuffle on channel, then
  * a RANGE frame walked in ts order inside each partition — no
  * self-join, no slice explosion, and the frame buffer is bounded by
  * the densest `windowSec` span, not the channel.
  *
  * The mean's sum is DECIMAL(38,12)-routed like every gated
  * aggregation: window frames are re-aggregated in engine-specific
  * order, and decimal sums are order-exact, so the result is
  * bit-stable across engines and partition topologies.
  */
object Rolling {

  /** One row per input sample: trailing-window mean/min/max/count of
    * `value` per channel. Marker rows (`value IS NULL`) pass through
    * the frame without contributing (count/avg skip nulls in Spark
    * and ANSI SQL alike).
    */
  def trailing(samples: DataFrame, windowSec: Long): DataFrame = {
    val w = Window.partitionBy("channel").orderBy(col("ts"))
      .rangeBetween(-windowSec * Samples.NS, 0L)
    samples.select(col("channel"), col("ts"),
      (sum(col("value").cast("decimal(38,12)")).over(w).cast("double") /
        count(col("value")).over(w)).as("roll_mean"),
      min(col("value")).over(w).as("roll_min"),
      max(col("value")).over(w).as("roll_max"),
      count(col("value")).over(w).as("roll_n"))
  }
}
