package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of the events stream — the session-window
  * family the reference does not have (SURVEY.md ST7 "n/a"), provided
  * both as a deterministic batch operator and as Spark's native
  * `session_window` aggregation so the streaming path computes the
  * same sessions.
  *
  * Session semantics match `session_window(ts, gap)`: an event at `t`
  * extends its session to `t + gap`, and a successor whose own window
  * TOUCHES that bound still merges — i.e. merge iff `diff <= gap`, a
  * successor strictly more than `gap` later starts a new session
  * (pinned against the native aggregation in SessionizeSpec's
  * exactly-at-gap case).
  *
  * Scale shape of [[sessions]]: the lag/cumsum windows and the final
  * per-session aggregation all cluster on `user_id` — Spark's
  * `EnsureRequirements` accepts the window's `HashPartitioning(user_id)`
  * as satisfying the aggregation's clustered distribution over
  * `(user_id, session_seq)` (subset rule), so the whole operator runs
  * on ONE shuffle, with the per-session aggregation partially
  * combined map-side to session-count-sized traffic.
  */
object Sessionize {

  /** Batch sessionization over the NORMALIZED events frame
    * (graft.core.Tables.events — `ts` is epoch nanoseconds as a
    * Long): one row per (user_id, session) with start/end ns, event
    * count, and a DECIMAL-routed value sum. Deterministic: events are
    * ordered by (ts, event_id), so ties in `ts` cannot flip session
    * boundaries between runs or engines.
    */
  def sessions(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(byUser)
    val isNew = when(prev.isNull ||
      col("ts") - prev > gapSec * 1000000000L, 1L).otherwise(0L)
    events
      .withColumn("_new", isNew)
      .withColumn("session_seq",
        sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("start_ns"),
        max(col("ts")).as("end_ns"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,12)")).cast("double").as("sum_value"))
      .drop("session_seq")
  }

  /** Tumbling-window event statistics: per epoch-aligned window,
    * event count, EXACT distinct users, and a DECIMAL-routed value
    * sum. The gate uses exact `count(DISTINCT)` (Spark plans the
    * two-phase expand — correct but a second shuffle keyed on
    * (window, user)); at 100 TB swap in `approx_count_distinct`
    * (HyperLogLog++: one map-side-combinable pass, mergeable sketches,
    * ~2% error) — the same exact/approx switch corpusStats documents
    * for percentiles.
    */
  def windowedUserStats(events: DataFrame, windowSec: Long): DataFrame =
    events
      .groupBy(graft.core.Samples.windowStart(col("ts"),
        windowSec * 1000000000L).as("win_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(38,12)")).cast("double")
          .as("sum_value"))

  /** The same sessions via Spark's native `session_window` — the
    * formulation that runs unchanged under Structured Streaming
    * (watermark-driven state cleanup, merging session state).
    * `SessionizeSpec` pins `sessions ≡ sessionWindowAgg` in batch and
    * over a drained stream.
    */
  def sessionWindowAgg(events: DataFrame, gapSec: Long,
                       watermark: Option[String] = None): DataFrame = {
    val withTs = events
      // ns → µs → TimestampType via DECIMAL (exact: the canonical ts
      // is µs-truncated; double division would round at 2024-epoch
      // magnitudes — see Samples.rawTsFromNs)
      .withColumn("_ts", timestamp_micros(
        (col("ts").cast("decimal(20,0)") / 1000L).cast("long")))
    // the watermark must attach to the session_window's event-time
    // column itself, AFTER it exists — a caller-side withWatermark
    // would be severed by the _ts projection
    watermark.fold(withTs)(w => withTs.withWatermark("_ts", w))
      .groupBy(col("user_id"), session_window(col("_ts"), s"$gapSec seconds"))
      .agg(
        min(col("ts")).as("start_ns"),
        max(col("ts")).as("end_ns"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,12)")).cast("double").as("sum_value"))
      .drop("session_window", "_ts")
  }
}
