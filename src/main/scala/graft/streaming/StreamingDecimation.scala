package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Open-window accumulator + held sample — the streaming decimator's
    * whole per-channel state (a few dozen bytes; state store size is
    * O(#channels), never O(#samples)).
    */
  case class DecimState(lastTs: Long, lastValue: Option[Double],
                        winStart: Long, sumW: Double, sumWX: Double,
                        sumWX2: Double, minV: Option[Double],
                        maxV: Option[Double], n: Long)

  /** 30 s — the reference's in-memory queue bound. */
  val WatermarkDelay = "30 seconds"

  private def emit(ch: String, st: DecimState, winEnd: Long,
                   periodNs: Long): AggOut = {
    // close the open window: held tail [lastTs (clamped), winEnd)
    val tail = (winEnd - math.max(st.lastTs, st.winStart)).toDouble
    val (w, wx, wx2, n2) = st.lastValue match {
      case Some(v) =>
        // the held sample's open slice closes at winEnd and counts once
        (st.sumW + tail, st.sumWX + tail * v, st.sumWX2 + tail * v * v,
          st.n + 1)
      case None => (st.sumW, st.sumWX, st.sumWX2, st.n)
    }
    val minV = (st.minV, st.lastValue) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, b) => a.orElse(b)
    }
    val maxV = (st.maxV, st.lastValue) match {
      case (Some(a), Some(b)) => Some(math.max(a, b))
      case (a, b) => a.orElse(b)
    }
    if (w > 0) {
      val mean = wx / w
      val variance = wx2 / w - mean * mean
      val std = if (variance < 1e-9) 0.0 else math.sqrt(variance)
      AggOut(ch, st.winStart, Some(mean), Some(std), minV, maxV,
        w / periodNs, n2)
    } else AggOut(ch, st.winStart, None, None, minV, maxV, 0.0, 0)
  }

  /** Process one channel's micro-batch. Samples inside a batch are
    * sorted by ts (the batch is bounded); monotonicity across batches
    * comes from the persisted lastTs (F6).
    */
  def processChannel(periodNs: Long)(
      channel: String, it: Iterator[InSample],
      state: GroupState[DecimState]): Iterator[AggOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AggOut]
    var st = state.getOption.orNull
    for (s <- it.toSeq.sortBy(_.seq)) {
      if (st == null) {
        st = DecimState(s.ts, s.value, s.ts - math.floorMod(s.ts, periodNs),
          0.0, 0.0, 0.0, None, None, 0)
      } else if (s.ts > st.lastTs) { // ST5: drop out-of-order/duplicate
        // flush every window the new sample crosses (incl. gap windows)
        while (s.ts >= st.winStart + periodNs) {
          out += emit(channel, st, st.winStart + periodNs, periodNs)
          st = st.copy(winStart = st.winStart + periodNs,
            sumW = 0.0, sumWX = 0.0, sumWX2 = 0.0,
            minV = None, maxV = None, n = 0)
        }
        // accumulate the now-closed validity of the held sample
        val from = math.max(st.lastTs, st.winStart)
        val dur = (s.ts - from).toDouble
        st.lastValue match {
          case Some(v) if dur > 0 =>
            st = st.copy(
              sumW = st.sumW + dur, sumWX = st.sumWX + dur * v,
              sumWX2 = st.sumWX2 + dur * v * v,
              minV = Some(st.minV.fold(v)(math.min(_, v))),
              maxV = Some(st.maxV.fold(v)(math.max(_, v))),
              n = st.n + 1)
          case _ => ()
        }
        st = st.copy(lastTs = s.ts, lastValue = s.value)
      }
    }
    if (st != null) state.update(st)
    out.iterator
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
