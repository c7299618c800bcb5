package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.archive.DecimatorCore

/** Structured-Streaming re-expression of the reference's continuous
  * ingest + decimation cascade (SURVEY.md §2.9):
  *
  *  - ST1 continuous ingestion: `readStream` → per-channel ordering
  *    from the keyed state operator (the reference's single-writer-
  *    per-channel queue);
  *  - ST2 tumbling stateful aggregation: [[decimateStream]] keeps one
  *    open window per channel and flushes on crossing — exactly the
  *    reference's live `SampleDecimator`;
  *  - ST3 late data: `withWatermark` 30 s mirrors the reference's
  *    30,000 ms bounded queue (MAX_QUEUE_TIME_MILLISECONDS);
  *  - ST5 out-of-order rejection: the keyed state drops any sample at
  *    or before the last accepted ts (F6), across micro-batches;
  *  - ST4 catch-up/replay: checkpointing + the batch decimation job
  *    over the same store (identical results by construction — see
  *    StreamingSpec's stream-equals-batch test).
  */
object StreamingDecimation {

  /** `seq` is the arrival sequence (source offset / queue position):
    * the F6 monotonicity rule drops by *arrival* order, not timestamp
    * order, so the intra-batch order must be the source's.
    */
  case class InSample(channel: String, ts: Long, value: Option[Double],
                      seq: Long = 0L)

  case class AggOut(channel: String, win_start: Long, mean: Option[Double],
                    std: Option[Double], min_value: Option[Double],
                    max_value: Option[Double], covered_fraction: Double,
                    n_samples: Long)

  /** 30 s — the reference's in-memory queue bound. */
  val WatermarkDelay = "30 seconds"

  /** Process one channel's micro-batch with the shared
    * [[graft.archive.DecimatorCore]] state machine. Samples inside a
    * batch replay in arrival (`seq`) order; monotonicity across
    * batches comes from the persisted lastTs (F6).
    */
  def processChannel(periodNs: Long)(
      channel: String, it: Iterator[InSample],
      state: GroupState[DecimatorCore.State]): Iterator[AggOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[DecimatorCore.Out]
    var st = state.getOption.orNull
    for (s <- it.toSeq.sortBy(_.seq)) {
      if (st == null) st = DecimatorCore.init(s.ts, s.value, periodNs)
      else if (s.ts > st.lastTs) { // ST5: drop out-of-order/duplicate
        val (emitted, next) = DecimatorCore.advance(channel, st, s.ts, s.value, periodNs)
        out ++= emitted
        st = next
      }
    }
    if (st != null) state.update(st)
    out.iterator.map(o => AggOut(o.channel, o.win_start, o.mean, o.std,
      o.min_value, o.max_value, o.covered_fraction, o.n_samples))
  }

  /** ST2 — streaming decimation: one flatMapGroupsWithState over the
    * channel key. Output mode Append; emitted rows are final (a window
    * is only emitted once crossed, the same flush rule as batch
    * decimation, so streaming output == batch output on the same
    * data — tested).
    */
  def decimateStream(samples: Dataset[InSample], periodNs: Long)
                    (implicit spark: SparkSession): Dataset[AggOut] = {
    import spark.implicits._
    samples
      .groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processChannel(periodNs))
  }

  /** ST1/ST3 — ingest shaping: event-time column, watermark, and the
    * windowed pre-aggregation a monitoring sink consumes. (The raw
    * append path writes `samples` to ArchiveStore unchanged.)
    */
  def windowedCounts(stream: DataFrame, window: String = "1 minute"): DataFrame =
    stream
      .withColumn("event_time", timestamp_micros((col("ts") / 1000L).cast("long")))
      .withWatermark("event_time", WatermarkDelay)
      .groupBy(col("channel"), org.apache.spark.sql.functions.window(
        col("event_time"), window))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("channel"), col("window.start").as("win_start"),
        col("n"), col("avg_value"))
}
