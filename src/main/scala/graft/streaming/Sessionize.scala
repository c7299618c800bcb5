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

  /** Day-cohort retention over the events frame — the classic "of the
    * users first seen on day D, how many came back on day D+k" matrix:
    * one row per (cohort day, day offset) with distinct active users
    * and the retention rate against the cohort's size.
    *
    * Scale shape: one user-keyed aggregation (first day), one
    * distinct over (user, day) that rides the same user_id shuffle,
    * one cohort-keyed rollup whose output is cohorts × horizon rows;
    * cohort sizes (day-offset-0 rows) broadcast back for the rate.
    * Day indices are exact integer ns division; the rate scale-rounds
    * at the edge.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val e = events.select(col("user_id"),
      expr(s"ts div ${dayNs}L").as("day"))
    val firstDay = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val activity = e.join(firstDay, Seq("user_id"))
      .select(col("cohort_day"), (col("day") - col("cohort_day"))
        .as("day_offset"), col("user_id"))
      .distinct()
    // the sizes branch re-reads counts: truncate the lineage so the
    // user-scale subtree (two scans + three shuffles) runs ONCE and
    // both consumers read the cohorts × horizon result (the same lazy
    // localCheckpoint pattern as the curation flagships)
    val counts = activity.groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("users"))
      .localCheckpoint(false)
    val sizes = counts.where(col("day_offset") === 0L)
      .select(col("cohort_day"), col("users").as("cohort_size"))
    counts.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("users"),
        (round(col("users").cast("double") /
            col("cohort_size").cast("double") * lit(1e6))
          .cast("long").cast("double") / lit(1e6)).as("retention"))
  }

  /** Ordered-funnel analysis over the events frame — "of the users who
    * did step 1, how many went on to step 2 … within `windowNs` of the
    * first step": per step the distinct users whose earliest
    * STRICTLY-ORDERED completion exists, with the conversion rate
    * against step 1.
    *
    * Earliest-completion semantics: t₀ = the user's first step-1
    * event; tᵢ = the first step-(i+1) event with ts > tᵢ₋₁ and
    * ts − t₀ ≤ windowNs. The implementation is a greedy fold over the
    * user's time-sorted events (a codegen'd `aggregate` whose state is
    * the k reached-times), which equals the sequential conditional
    * minima because the first qualifying event in ascending order IS
    * the minimum — the DuckDB oracle computes it the other way
    * (chained conditional-min CTEs) precisely to pin that equivalence.
    *
    * Scale shape: ONE shuffle on user_id; the per-user array is
    * bounded by that user's event count (the [[sessions]]
    * justification) and the fold is O(events · k) with k tiny; the
    * final frame is k rows. All comparisons are exact integers; the
    * conversion ratio is scale-rounded at the edge.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             windowNs: Long): DataFrame = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      "funnel needs at least two distinct steps")
    // the names are interpolated into a SQL string literal below: a
    // quote would break out of it, and a backslash acts as an escape
    // (\t silently becomes a tab and never matches event_type)
    require(steps.forall(s => !s.contains("'") && !s.contains("\\")),
      "step names must be free of quotes and backslashes")
    val k = steps.size
    val stepArr = steps.map(s => s"'$s'").mkString("array(", ", ", ")")
    val ev = events.where(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_type"))
    // state = k reached-times; CASE branches keep every element_at
    // lazily guarded (ANSI mode throws on an out-of-range index)
    val walked = ev.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"))))
        .as("seq"))
      .withColumn("reached", expr(
        s"""aggregate(seq,
           |  array_repeat(cast(null as bigint), $k),
           |  (st, e) -> transform(st, (t, i) ->
           |    CASE WHEN t IS NOT NULL THEN t
           |         WHEN e.event_type != element_at($stepArr, i + 1)
           |           THEN CAST(NULL AS BIGINT)
           |         WHEN i = 0 THEN e.ts
           |         WHEN element_at(st, i) IS NOT NULL
           |              AND e.ts > element_at(st, i)
           |              AND e.ts - element_at(st, 1) <= ${windowNs}L
           |           THEN e.ts
           |         END))""".stripMargin))
    funnelSummary(walked
      .select(posexplode(col("reached")).as(Seq("step", "t")))
      .where(col("t").isNotNull)
      .select(col("step")), steps)
  }

  /** The funnel's counting tail over one row per (user, reached step):
    * per-step user counts on a k-row skeleton (a corpus with NO
    * matching events still reports every step at zero — the oracle's
    * UNION of scalar counts always emits k rows) and the scale-rounded
    * conversion against step 1. Shared by the batch fold and the
    * drained streaming detector so the two paths cannot drift.
    */
  def funnelSummary(stepRows: DataFrame, steps: Seq[String]): DataFrame = {
    val counted = stepRows.groupBy("step").agg(count(lit(1)).as("users"))
    val spark = stepRows.sparkSession
    import spark.implicits._
    val counts = steps.indices.toDF("step")
      .join(counted, Seq("step"), "left")
      .withColumn("users", coalesce(col("users"), lit(0L)))
    val w = Window.orderBy("step")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("step_name",
        element_at(typedLit(steps), col("step") + 1))
      .withColumn("u0", first(col("users")).over(w))
      .select(col("step"), col("step_name"), col("users"),
        when(col("u0") > 0L,
          round(col("users").cast("double") / col("u0").cast("double")
            * lit(1e6)).cast("long").cast("double") / lit(1e6))
          .otherwise(lit(0.0)).as("conversion"))
  }
}
