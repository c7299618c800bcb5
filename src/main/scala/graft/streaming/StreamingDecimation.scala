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
  // seq has NO default: the arrival-order sort is what implements the
  // reference's in-order drop rule (ST5) inside a micro-batch — an
  // all-zero seq would silently fall back to shuffle order
  case class InSample(channel: String, ts: Long, value: Option[Double],
                      seq: Long)

  case class AggOut(channel: String, win_start: Long, mean: Option[Double],
                    std: Option[Double], min_value: Option[Double],
                    max_value: Option[Double], covered_fraction: Double,
                    n_samples: Long)

  /** 30 s — the reference's in-memory queue bound. */
  val WatermarkDelay = "30 seconds"

  /** Re-aggregation contract violation, surfaced LOUDLY: per-channel
    * fine windows must arrive in `win_start` order (the upstream
    * decimation stream emits them that way; a multi-file replay that
    * reorders slices does not). A fine window whose coarse target is
    * older than the open coarse window used to match neither the flush
    * nor the merge branch and was DROPPED silently — quietly-wrong
    * coarse aggregates. Killing the query is the honest behavior: the
    * caller must replay the fine stream in order.
    */
  private def orderViolation(op: String, channel: String, winStart: Long,
                             target: Long, openTarget: Long): Exception =
    new IllegalStateException(
      s"$op: fine window win_start=$winStart (coarse target=$target) for " +
        s"channel '$channel' arrived after coarse window $openTarget was " +
        "opened — per-channel win_start arrival order is violated; " +
        "replay the fine stream in order")

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

  /** Typed streaming input: the full 21-type payload union. */
  case class TypedIn(channel: String, ts: Long,
                     v: graft.archive.TypedDecimatorCore.TValue,
                     seq: Long)

  /** ST2 over the full 21-type value union: the same keyed-state shape
    * as [[decimateStream]], running the
    * [[graft.archive.TypedDecimatorCore]] dispatch state machine so
    * mixed-type windows, markers, and pick-first semantics stream
    * exactly like the batch [[graft.archive.TypedDecimation]] plan
    * (property-tested equal).
    */
  def decimateTypedStream(samples: Dataset[TypedIn], periodNs: Long)
                         (implicit spark: SparkSession)
      : Dataset[graft.archive.TypedDecimatorCore.Out] = {
    import spark.implicits._
    import graft.archive.TypedDecimatorCore
    def process(channel: String, it: Iterator[TypedIn],
                state: GroupState[TypedDecimatorCore.State])
        : Iterator[TypedDecimatorCore.Out] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[TypedDecimatorCore.Out]
      var st = state.getOption.orNull
      for (s <- it.toSeq.sortBy(_.seq)) {
        if (st == null) st = TypedDecimatorCore.init(s.ts, s.v, periodNs)
        else if (s.ts > st.lastTs) { // ST5 across micro-batches
          val (emitted, next) =
            TypedDecimatorCore.advance(channel, st, s.ts, s.v, periodNs)
          out ++= emitted
          st = next
        }
      }
      if (st != null) state.update(st)
      out.iterator
    }
    samples.groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }

  /** Accumulator for the streaming cascade stage (A2/A8 live form):
    * merges finished fine windows into an open coarse window.
    */
  case class ReAggState(winStart: Long, sumW: Double, sumWM: Double,
                        sumWM2: Double, minV: Option[Double],
                        maxV: Option[Double], n: Long)

  /** ST2/A8 — second cascade hop as a stream: consume the finalized
    * fine-window aggregates emitted by [[decimateStream]] and merge
    * them into coarser windows with the A2 weights
    * (w = sourcePeriod × coveredFraction), flushing a coarse window
    * when a fine window at-or-after its end arrives. Chaining these
    * stages is the reference's live decimation cascade; each stage's
    * state is O(#channels).
    */
  def reAggregateStream(fine: Dataset[AggOut], sourcePeriodNs: Long,
                        targetPeriodNs: Long)
                       (implicit spark: SparkSession): Dataset[AggOut] = {
    import spark.implicits._
    require(targetPeriodNs % sourcePeriodNs == 0)

    def emit(ch: String, st: ReAggState): AggOut =
      if (st.sumW > 0) {
        val mean = st.sumWM / st.sumW
        val variance = st.sumWM2 / st.sumW - mean * mean
        val std = if (variance < 1e-9) 0.0 else math.sqrt(variance)
        AggOut(ch, st.winStart, Some(mean), Some(std), st.minV, st.maxV,
          st.sumW / targetPeriodNs, st.n)
      } else AggOut(ch, st.winStart, None, None, st.minV, st.maxV, 0.0, st.n)

    def process(channel: String, it: Iterator[AggOut],
                state: GroupState[ReAggState]): Iterator[AggOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AggOut]
      var st = state.getOption.orNull
      for (a <- it.toSeq.sortBy(_.win_start)) {
        val target = a.win_start - math.floorMod(a.win_start, targetPeriodNs)
        if (st == null) st = ReAggState(target, 0.0, 0.0, 0.0, None, None, 0)
        else if (target > st.winStart) { out += emit(channel, st)
          st = ReAggState(target, 0.0, 0.0, 0.0, None, None, 0)
        }
        else if (target < st.winStart)
          throw orderViolation("reAggregateStream", channel,
            a.win_start, target, st.winStart)
        if (target == st.winStart) {
          val w = sourcePeriodNs.toDouble * a.covered_fraction
          (a.mean, a.std) match {
            case (Some(m), Some(s)) =>
              st = st.copy(sumW = st.sumW + w, sumWM = st.sumWM + w * m,
                sumWM2 = st.sumWM2 + w * (s * s + m * m),
                minV = (st.minV.toSeq ++ a.min_value.toSeq)
                  .reduceOption((x: Double, y: Double) => math.min(x, y)),
                maxV = (st.maxV.toSeq ++ a.max_value.toSeq)
                  .reduceOption((x: Double, y: Double) => math.max(x, y)),
                n = st.n + a.n_samples)
            case _ =>
              st = st.copy(n = st.n + a.n_samples)
          }
        }
      }
      if (st != null) state.update(st)
      out.iterator
    }

    fine.groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }

  /** Engine-exact accumulator for [[reAggregateExactStream]]: the
    * integer sums of [[graft.archive.Decimation.reAggregateExact]],
    * exact at any magnitude (BigInt on the String fields — Spark's
    * Decimal(38,18) state encoder could overflow what decimal(38,0)
    * sums hold).
    */
  case class ReAggExactState(winStart: Long, numM: String, den: Long,
                             numV: String, minV: Option[Double],
                             maxV: Option[Double], n: Long)

  /** [[reAggregateStream]] through the engine-exact integer merge of
    * [[graft.archive.Decimation.reAggregateExact]] — the streaming
    * cascade hop that serves the same oracle bytes as the batch hop:
    * fine means/stds/coverages quantize to the 6dp grid on entry
    * (proven cross-engine-identical by the decimation gates), the
    * merge runs in exact integers, and the output edge repeats the
    * batch half-up division verbatim. StreamingCascadeSpec pins
    * stream ≡ batch; the `stream_reagg_6h` gate hashes it against the
    * `arch_reagg_6h` DuckDB oracle.
    *
    * Fine windows must arrive per channel in win_start order (the
    * [[decimateStream]] emission order); a coarse window flushes when
    * a fine window at-or-after its end arrives, so a bounded drain
    * needs one sentinel fine window per channel past the last real
    * coarse window (the gate's drain pattern — sentinels flush state
    * and never emit themselves).
    */
  def reAggregateExactStream(fine: Dataset[AggOut], sourcePeriodNs: Long,
                             targetPeriodNs: Long)
                            (implicit spark: SparkSession): Dataset[AggOut] = {
    import spark.implicits._
    require(targetPeriodNs % sourcePeriodNs == 0)
    val k = targetPeriodNs / sourcePeriodNs

    // Spark's round(double) at scale 0: BigDecimal.valueOf (shortest
    // decimal repr) + HALF_UP — the same sequence Decimation's
    // micro(c) compiles to, so the quantization grid is identical
    def micro(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

    // round-half-away-from-zero of n/d as an integer, d > 0 — the
    // batch halfUp(n, d) in exact BigInt arithmetic
    def halfUp(n: BigInt, d: BigInt): BigInt =
      if (n >= 0) (n * 2 + d) / (d * 2) else -((-(n * 2) + d) / (d * 2))

    def emit(ch: String, st: ReAggExactState): AggOut = {
      val den = st.den
      if (den > 0) {
        val numM = BigInt(st.numM); val numV = BigInt(st.numV)
        val mean = halfUp(numM, BigInt(den)).toDouble / 1e6
        val md = numM.toDouble / den.toDouble / 1e6
        val varr = numV.toDouble / (den.toDouble * 1e12) - md * md
        val std0 = if (varr < 1e-9) 0.0 else math.sqrt(varr)
        val std = java.math.BigDecimal.valueOf(std0 * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue() / 1e6
        AggOut(ch, st.winStart, Some(mean), Some(std), st.minV, st.maxV,
          halfUp(BigInt(den), BigInt(k)).toDouble / 1e6, st.n)
      } else
        AggOut(ch, st.winStart, None, None, st.minV, st.maxV, 0.0, st.n)
    }

    def fresh(target: Long) =
      ReAggExactState(target, "0", 0L, "0", None, None, 0L)

    def process(channel: String, it: Iterator[AggOut],
                state: GroupState[ReAggExactState]): Iterator[AggOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AggOut]
      var st = state.getOption.orNull
      for (a <- it.toSeq.sortBy(_.win_start)) {
        val target = a.win_start - math.floorMod(a.win_start, targetPeriodNs)
        if (st == null) st = fresh(target)
        else if (target > st.winStart) {
          out += emit(channel, st); st = fresh(target)
        }
        else if (target < st.winStart)
          throw orderViolation("reAggregateExactStream", channel,
            a.win_start, target, st.winStart)
        if (target == st.winStart) {
          // min/max/n merge unconditionally (batch min()/max()/sum()
          // over the group, null-skipping); the integer moment sums
          // only when the fine window carries a mean (cf6 = 0 rows
          // contribute nothing to num/den anyway)
          val merged = st.copy(
            minV = (st.minV.toSeq ++ a.min_value.toSeq)
              .reduceOption((x: Double, y: Double) => math.min(x, y)),
            maxV = (st.maxV.toSeq ++ a.max_value.toSeq)
              .reduceOption((x: Double, y: Double) => math.max(x, y)),
            n = st.n + a.n_samples)
          st = (a.mean, a.std) match {
            case (Some(m), Some(s)) =>
              val m6 = BigInt(micro(m)); val s6 = BigInt(micro(s))
              val cf6 = BigInt(micro(a.covered_fraction))
              merged.copy(
                numM = (BigInt(merged.numM) + cf6 * m6).toString,
                den = merged.den + cf6.toLong,
                numV = (BigInt(merged.numV) + cf6 * (s6 * s6 + m6 * m6))
                  .toString)
            case _ => merged
          }
        }
      }
      if (st != null) state.update(st)
      out.iterator
    }

    fine.groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }

  /** One detected inter-sample gap ([[gapStream]] output — the
    * streaming twin of `ArchiveReader.gapReport`'s row).
    */
  case class GapOut(channel: String, gap_start: Long, gap_end: Long,
                    gap_ns: Long)

  /** Streaming gap detection — the live form of
    * `ArchiveReader.gapReport`: per-channel keyed state holds only the
    * last accepted timestamp (8 bytes per channel — the smallest state
    * in the engine), and a sample arriving more than `thresholdNs`
    * after it emits the gap ONCE, the moment it closes. The same
    * F6/ST5 arrival-order contract as [[decimateStream]]: in-batch
    * replay by `seq`, out-of-order/duplicate arrivals dropped across
    * batches, so a monotonic drain is byte-identical to the batch
    * operator (the `stream_gap_report` gate serves the
    * `arch_gap_report` oracle).
    *
    * An OPEN gap (silence continuing right now) is invisible until a
    * sample closes it — by design, matching the batch lag semantics; a
    * monitoring deployment pairs this with a timeout-based alarm
    * (GroupStateTimeout) if it needs open-ended silence alerts.
    */
  def gapStream(samples: Dataset[InSample], thresholdNs: Long)
               (implicit spark: SparkSession): Dataset[GapOut] = {
    import spark.implicits._
    def process(channel: String, it: Iterator[InSample],
                state: GroupState[Long]): Iterator[GapOut] = {
      var last = state.getOption.getOrElse(Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[GapOut]
      for (s <- it.toSeq.sortBy(_.seq)) {
        if (last == Long.MinValue || s.ts > last) { // F6/ST5
          if (last != Long.MinValue && s.ts - last > thresholdNs)
            out += GapOut(channel, last, s.ts, s.ts - last)
          last = s.ts
        }
      }
      state.update(last)
      out.iterator
    }
    samples.groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }

  /** One threshold-crossing alert ([[alertStream]] output). */
  case class AlertOut(channel: String, ts: Long, value: Double,
                      prev_value: Double, kind: String)

  /** Streaming threshold-crossing alerts — the live alarm-edge
    * detector (the reference archives per-sample alarm SEVERITY but
    * leaves value-threshold alarming to the EPICS layer; a monitoring
    * deployment on this engine wants it at the ingest edge): emit
    * `rise` when a channel's value crosses from ≤ threshold to >
    * threshold, `fall` on the way back, each transition exactly once.
    * Per-channel keyed state is (last accepted ts, last value) — 16
    * bytes per channel, constant forever. Value-less marker samples
    * advance the dedup clock but not the value chain. Same F6/ST5
    * arrival contract as [[gapStream]] (in-batch replay by `seq`,
    * cross-batch out-of-order/duplicate drops), so a monotonic drain
    * is byte-identical to the batch lag-window form (the
    * `stream_alerts` gate's DuckDB oracle).
    */
  def alertStream(samples: Dataset[InSample], threshold: Double)
                 (implicit spark: SparkSession): Dataset[AlertOut] = {
    import spark.implicits._
    def process(channel: String, it: Iterator[InSample],
                state: GroupState[(Long, Option[Double])])
        : Iterator[AlertOut] = {
      var (last, held) =
        state.getOption.getOrElse((Long.MinValue, Option.empty[Double]))
      val out = scala.collection.mutable.ArrayBuffer.empty[AlertOut]
      for (s <- it.toSeq.sortBy(_.seq)) {
        if (last == Long.MinValue || s.ts > last) { // F6/ST5
          last = s.ts
          s.value.foreach { v =>
            held.foreach { pv =>
              if (pv <= threshold && v > threshold)
                out += AlertOut(channel, s.ts, v, pv, "rise")
              else if (pv > threshold && v <= threshold)
                out += AlertOut(channel, s.ts, v, pv, "fall")
            }
            held = Some(v)
          }
        }
      }
      state.update((last, held))
      out.iterator
    }
    samples.groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }

  /** S9 streaming form — the continuous raw-append path: watermark the
    * stream and append it into the [[graft.archive.ArchiveStore]]
    * layout (level/day hive partitions). Exactly-once via the
    * checkpoint + file-sink manifest; the compaction job
    * (ArchiveStore.compact) right-sizes the small streamed files
    * behind the ingest edge.
    */
  def writeRawStream(samples: DataFrame, storePath: String,
                     checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    samples
      .withColumn("event_time",
        timestamp_micros(graft.archive.ArchiveStore.microsCol(col("ts"))))
      .withWatermark("event_time", WatermarkDelay)
      // the one shared day-bucketing contract (exact integer µs)
      .withColumn("bucket_date",
        graft.archive.ArchiveStore.bucketDateCol(col("ts")))
      .drop("event_time")
      .withColumn("level", lit(0L))
      .writeStream
      .partitionBy("level", "bucket_date")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", storePath)
      .outputMode("append")
      .start()

  /** Streaming ingest into the manifest-committed store: each
    * micro-batch is ONE atomic manifest commit, so any reader — not
    * just Spark streaming-aware ones honoring a `_spark_metadata` log —
    * sees whole batches or nothing. Replayed batches (foreachBatch is
    * at-least-once) are no-ops via the manifest's per-writer txn
    * watermark, so table contents stay exactly-once; the writer
    * identity is the checkpoint dir, which is what survives restarts.
    */
  def writeRawStreamManifest(samples: DataFrame, storePath: String,
                             checkpointDir: String, levelSec: Long = 0L,
                             retentionSec: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    samples.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.archive.ManifestStore.commitIdempotent(
          batch.toDF(), storePath, levelSec,
          writerId = s"stream:$checkpointDir", batchId = batchId)
        // write-triggered retention, like the reference's delete-after-
        // every-successful-write (ArchivedChannelDecimationLevel.java:
        // 602-640): a manifest swap per expired day, bytes go at vacuum
        if (retentionSec > 0L)
          graft.archive.ManifestStore.applyRetention(
            batch.sparkSession, storePath, levelSec,
            retentionSec * graft.core.Samples.NS)
        ()
      }
      .start()

  /** Config-GOVERNED streaming ingest ([[writeRawStreamManifest]] with
    * the [[graft.archive.ConfigCommands]] log in charge): every
    * micro-batch re-reads the committed configuration, so an operator's
    * config commit takes effect on the NEXT batch of a running stream —
    * no restart. Per batch:
    *
    *  1. resolve names → rename-stable data ids against the enabled
    *     channel set (unknown/disabled channels dropped, exactly like
    *     the reference's refusal to archive unconfigured channels);
    *  2. one atomic idempotent manifest commit (exactly-once);
    *  3. the config's retention for this level — the reference's
    *     delete-after-every-successful-write rule
    *     (ArchivedChannelDecimationLevel.java:602-640), with the
    *     horizon map coming from configuration instead of a caller
    *     argument, so expired windows vanish DURING the stream.
    */
  def writeRawStreamConfigured(samples: DataFrame, storePath: String,
                               checkpointDir: String, configPath: String,
                               levelSec: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    samples.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val st = graft.archive.ConfigCommands.state(spark, configPath)
        // the one shared name→id keying (ConfiguredArchive.idKeyed).
        // NOTE this sink deliberately does NOT monotonicDedup (it
        // preserves arrival order across batches — cross-batch F6
        // would need keyed state); dedup happens at decimation /
        // catch-up read time, exactly like writeRawStream
        val keyed = graft.archive.ConfiguredArchive
          .idKeyed(batch.toDF(), st.enabledConfigs)
        graft.archive.ManifestStore.commitIdempotent(
          keyed, storePath, levelSec,
          writerId = s"stream:$checkpointDir", batchId = batchId)
        st.retentionSec.get(levelSec).filter(_ > 0L).foreach { sec =>
          graft.archive.ManifestStore.applyRetention(
            spark, storePath, levelSec, sec * graft.core.Samples.NS)
        }
        ()
      }
      .start()

  /** ST1 over a real NETWORK source — the live-monitor ingest edge the
    * reference implements as EPICS Channel Access subscriptions
    * (ChannelAccessControlSystemSupport.java: a CA monitor callback
    * per channel feeding the archiver's queue). Protocol-level CA is
    * out of scope; the transport contract it proves — samples arriving
    * over a socket, parsed, and committed exactly like any other
    * stream — is this source: Spark's TCP text source plus the wire
    * format below, returning the canonical sample frame every sink in
    * this engine accepts ([[writeRawStream]],
    * [[writeRawStreamManifest]], [[writeRawStreamConfigured]],
    * [[decimateStream]] after `.as[InSample]`).
    *
    * Wire format: one sample per line, TAB-separated
    * `channel <TAB> ts_ns <TAB> value <TAB> sample_id` — an empty
    * value field is a MARKER row (disconnected/disabled, value NULL),
    * matching the reference's special sample types. Malformed lines
    * are dropped, not poison: a flaky feeder must not kill the ingest
    * query (the reference logs and continues on a bad CA event).
    *
    * Note Spark's socket source is at-most-once on reconnect (no
    * offsets to replay) — the downstream manifest commit is still
    * idempotent per micro-batch, so a restart never duplicates what
    * it did receive. A production deployment needing replay puts a
    * log (e.g. Kafka) between the control system and this edge; the
    * parse/commit path is identical.
    */
  def socketSamples(spark: SparkSession, host: String, port: Int): DataFrame =
    parseSampleLines(spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load())

  /** High-rate network ingest: [[socketSamples]] rides Spark's
    * built-in TCP text source, which is a TEST transport — per-line
    * driver-side buffering under a lock caps it around 10k lines/s.
    * This is the production shape instead: a SPOOLING receiver thread
    * drains the socket in bulk and publishes atomic chunk files
    * (temp-write + rename) into a directory the file source streams —
    * the classic write-ahead spool every real archiver puts between
    * the control system and the store. Beyond rate (the file source
    * scans at parquet-class throughput), the spool upgrades the
    * transport from the socket source's at-most-once to REPLAYABLE:
    * the chunk files are the log, and the file source's checkpointed
    * offsets resume through them exactly-once.
    *
    * Returns the receiver thread (daemon, already started); it exits
    * when the peer closes the connection. Compose with
    * [[spooledSamples]] for the query side.
    */
  def spoolSocket(host: String, port: Int, spoolDir: String,
                  linesPerChunk: Int = 100000): Thread = {
    val dir = java.nio.file.Paths.get(spoolDir)
    java.nio.file.Files.createDirectories(dir)
    val t = new Thread(() => {
      val sock = new java.net.Socket(host, port)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8),
        1 << 20)
      var chunk = 0L
      var buf = new java.lang.StringBuilder(1 << 22)
      var n = 0
      def flush(): Unit = if (n > 0) {
        val tmp = dir.resolve(s".spool-$chunk.txt.tmp")
        java.nio.file.Files.write(tmp, buf.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // rename = atomic publish: the file source must never list a
        // half-written chunk
        java.nio.file.Files.move(tmp, dir.resolve(s"spool-$chunk.txt"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        chunk += 1; n = 0; buf = new java.lang.StringBuilder(1 << 22)
      }
      var line = in.readLine()
      while (line != null) {
        buf.append(line).append('\n')
        n += 1
        if (n >= linesPerChunk) flush()
        line = if (in.ready()) in.readLine()
               else { flush(); in.readLine() } // idle → publish partial
      }
      flush()
      sock.close()
    })
    t.setDaemon(true)
    t.start()
    t
  }

  /** The query side of [[spoolSocket]]: stream the spool directory
    * through the shared wire-format parser. `cleanProcessed = true`
    * turns on the file source's `cleanSource=delete` — processed chunk
    * files are removed after their batch commits, so a continuous
    * ingest's spool stays bounded by in-flight data instead of growing
    * into a second copy of the archive (deletion is the source's
    * post-commit best effort; exactly-once is the checkpoint's job
    * either way, so a chunk deleted late is only disk, never dupes).
    */
  def spooledSamples(spark: SparkSession, spoolDir: String,
                     cleanProcessed: Boolean = false): DataFrame = {
    val r = spark.readStream
    parseSampleLines(
      (if (cleanProcessed) r.option("cleanSource", "delete") else r)
        .text(spoolDir))
  }

  /** The wire-format parser, shared by [[socketSamples]] and any
    * line-transport source (Kafka value column, file tail): expects a
    * single string column `value`.
    */
  def parseSampleLines(lines: DataFrame): DataFrame = {
    val f = split(col("value"), "\t")
    lines
      .select(f.as("f"))
      .where(size(col("f")) >= 4)
      .select(
        element_at(col("f"), 1).as("channel"),
        // try_cast, not cast: ANSI mode THROWS on a malformed number,
        // and one bad line must not kill the ingest query
        expr("try_cast(element_at(f, 2) AS LONG)").as("ts"),
        // empty string → NULL double = marker row; a garbage number
        // casts to NULL and the row drops below
        expr("try_cast(nullif(element_at(f, 3), '') AS DOUBLE)")
          .as("value"),
        element_at(col("f"), 3).as("_rawv"),
        expr("try_cast(element_at(f, 4) AS LONG)").as("sample_id"))
      .where(col("channel").isNotNull && length(col("channel")) > 0 &&
        col("ts").isNotNull && col("sample_id").isNotNull &&
        // value parsed, or was genuinely empty (marker)
        (col("value").isNotNull || col("_rawv") === ""))
      .drop("_rawv")
      .withColumn("str_value", lit(""))
      .withColumn("severity", lit(0))
      .withColumn("status", lit(0))
      .select("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
  }

  /** One emitted point of the streaming calc record. */
  case class DerivedOut(channel: String, ts: Long, value: Double)

  /** Per-source cursor of the streaming calc record: first/last
    * accepted ts, the hold at the consumed grid frontier (`holdValued`
    * false = the hold is a marker — the source is disconnected and the
    * grid point is undefined), and the pending samples not yet
    * consumed by it (`valued` false = marker).
    */
  case class SrcCursor(first: Long, last: Long, hasHold: Boolean,
                       hold: Double, holdValued: Boolean,
                       pending: List[(Long, Double, Boolean)])

  case class DerivedState(a: Option[SrcCursor], b: Option[SrcCursor],
                          nextG: Long, started: Boolean)

  /** Streaming derived ("calculated") channel — the CROSS-CHANNEL
    * keyed-state op (every other streaming core here is per-channel):
    * both sources' samples route to ONE key, the state keeps a cursor
    * per source, and a grid point `g` (epoch-aligned multiples of
    * `stepNs`, starting at the ceil of the LATER source's first
    * sample) is emitted as soon as BOTH sources have advanced past it
    * — per-source monotonic arrival makes the hold at `g` (the last
    * sample ≤ g) final exactly then. A drained bounded stream
    * therefore emits precisely the batch grid over the sources' span
    * intersection ([[graft.archive.ConfiguredArchive]]'s calc-channel
    * rule), with no end-of-stream sentinel: the last grid point
    * finalizes when the slower source reaches it, exactly like batch.
    *
    * State size: each cursor buffers only samples newer than the grid
    * frontier, so the buffer is bounded by the TIME SKEW between the
    * two sources (the same bound a watermarked stream-stream join
    * buffer has) — two in-sync 1 Hz sources at a 10 s step hold ≤ ~10
    * samples each. Value-less marker samples BREAK the hold exactly
    * like batch ([[graft.archive.ArchiveReader.asOfLookup]] holds the
    * marker's null): a grid point whose held sample on either side is
    * a marker is undefined and NOT emitted — a calc record is
    * undefined while an input is disconnected. Markers also define
    * the span and advance the per-source dedup clock (F6/ST5 drops
    * apply per SOURCE), keeping stream ≡ batch on marker-bearing
    * inputs too.
    */
  def derivedStream(samples: Dataset[InSample], outName: String,
                    chanA: String, chanB: String, op: String,
                    stepNs: Long)
                   (implicit spark: SparkSession): Dataset[DerivedOut] = {
    import spark.implicits._
    require(stepNs > 0L, "step must be positive")
    require(chanA != chanB, "derived channel needs two distinct sources")
    val f: (Double, Double) => Double = op match {
      case "add" => _ + _
      case "sub" => _ - _
      case "mul" => _ * _
      case "div" => _ / _
      case other =>
        throw new IllegalArgumentException(s"unknown derived op '$other'")
    }
    // mutable in-batch mirror of SrcCursor: appends are amortized O(1)
    // and grid consumption walks an index instead of re-building the
    // list — the immutable `pending :+ x` form was O(n) PER SAMPLE and
    // went quadratic the moment one source lagged (caught by the
    // derived_stream skew probe, not by correctness: bytes identical)
    final class Cur(var first: Long, var last: Long, var hasHold: Boolean,
                    var hold: Double, var holdValued: Boolean,
                    val pending: scala.collection.mutable.ArrayBuffer[(Long, Double, Boolean)],
                    var pi: Int)
    def consume(c: Cur, g: Long): Unit =
      while (c.pi < c.pending.length && c.pending(c.pi)._1 <= g) {
        c.hasHold = true
        c.hold = c.pending(c.pi)._2
        c.holdValued = c.pending(c.pi)._3
        c.pi += 1
      }
    def process(key: String, it: Iterator[InSample],
                state: GroupState[DerivedState]): Iterator[DerivedOut] = {
      val st0 = state.getOption.getOrElse(
        DerivedState(None, None, 0L, started = false))
      def thaw(o: Option[SrcCursor]): Cur = o match {
        case Some(c) => new Cur(c.first, c.last, c.hasHold, c.hold,
          c.holdValued,
          scala.collection.mutable.ArrayBuffer.from(c.pending), 0)
        case None => null
      }
      var a = thaw(st0.a); var b = thaw(st0.b)
      var nextG = st0.nextG; var started = st0.started
      val out = scala.collection.mutable.ArrayBuffer.empty[DerivedOut]
      for (s <- it.toSeq.sortBy(_.seq)) {
        val isA = s.channel == chanA
        val cur = if (isA) a else b
        val fresh = cur == null || s.ts > cur.last // F6/ST5 per source
        if (fresh) {
          val entry = (s.ts, s.value.getOrElse(0.0), s.value.isDefined)
          if (cur == null) {
            // markers define the span too (batch spans are min/max ts
            // over ALL rows) and start the dedup clock
            val c = new Cur(s.ts, s.ts, hasHold = false, 0.0,
              holdValued = false,
              scala.collection.mutable.ArrayBuffer(entry), 0)
            if (isA) a = c else b = c
          } else {
            cur.last = s.ts
            cur.pending += entry
          }
          if (a != null && b != null) {
            if (!started) {
              val lo = math.max(a.first, b.first)
              nextG = ((lo + stepNs - 1L) / stepNs) * stepNs
              started = true
            }
            while (nextG <= math.min(a.last, b.last)) {
              consume(a, nextG); consume(b, nextG)
              // both holds exist (nextG >= max firsts); a point whose
              // held sample on either side is a MARKER is undefined
              // and skipped — exactly the batch null-hold drop
              if (a.holdValued && b.holdValued)
                out += DerivedOut(outName, nextG, f(a.hold, b.hold))
              nextG += stepNs
            }
          }
        }
      }
      def freeze(c: Cur): Option[SrcCursor] =
        Option(c).map(c => SrcCursor(c.first, c.last, c.hasHold, c.hold,
          c.holdValued, c.pending.drop(c.pi).toList))
      state.update(DerivedState(freeze(a), freeze(b), nextG, started))
      out.iterator
    }
    samples
      .filter(s => s.channel == chanA || s.channel == chanB)
      .groupByKey(_ => outName)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(process)
  }

  /** ST1/ST3 — ingest shaping: event-time column, watermark, and the
    * windowed pre-aggregation a monitoring sink consumes. (The raw
    * append path writes `samples` to ArchiveStore unchanged.)
    */
  def windowedCounts(stream: DataFrame, window: String = "1 minute"): DataFrame =
    stream
      .withColumn("event_time",
        timestamp_micros(graft.archive.ArchiveStore.microsCol(col("ts"))))
      .withWatermark("event_time", WatermarkDelay)
      .groupBy(col("channel"), org.apache.spark.sql.functions.window(
        col("event_time"), window))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("channel"), col("window.start").as("win_start"),
        col("n"), col("avg_value"))
}
