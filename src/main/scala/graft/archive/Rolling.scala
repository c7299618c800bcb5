package graft.archive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Samples

/** Output row of the rolling operators. */
case class RollOut(channel: String, ts: Long, roll_mean: Option[Double],
                   roll_min: Option[Double], roll_max: Option[Double],
                   roll_n: Long)

/** Output row of the z-score operators. */
case class ZOut(channel: String, ts: Long, value: Option[Double],
                zmean: Option[Double], zstd: Option[Double],
                zscore: Option[Double])

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
    * `value` per channel. THE obvious-name API is the linear-time
    * walker ([[trailingFast]]) — Spark's bounded RANGE frame
    * re-evaluates the aggregate per row (O(n·frame) on dense
    * channels), so the declarative form lives under
    * [[trailingReference]] as the equivalence oracle, unreachable by
    * the name a caller picks without reading the docs.
    */
  def trailing(samples: DataFrame, windowSec: Long): DataFrame =
    trailingFast(samples, windowSec)

  /** Per-sample anomaly score, obvious name = linear path
    * ([[zscoreFast]]); the RANGE-frame form is [[zscoreReference]].
    */
  def zscore(samples: DataFrame, windowSec: Long): DataFrame =
    zscoreFast(samples, windowSec)

  /** The declarative RANGE-frame form of [[trailing]] — kept as the
    * equivalence REFERENCE (RollingSpec pins the walker byte-identical
    * to this plan; the gate serves either path from the same oracle).
    * Marker rows (`value IS NULL`) pass through the frame without
    * contributing (count/avg skip nulls in Spark and ANSI SQL alike).
    * O(n·frame): do not call on dense channels — use [[trailing]].
    */
  def trailingReference(samples: DataFrame, windowSec: Long): DataFrame = {
    val w = Window.partitionBy("channel").orderBy(col("ts"))
      .rangeBetween(-windowSec * Samples.NS, 0L)
    samples.select(col("channel"), col("ts"),
      (sum(col("value").cast("decimal(38,12)")).over(w).cast("double") /
        count(col("value")).over(w)).as("roll_mean"),
      min(col("value")).over(w).as("roll_min"),
      max(col("value")).over(w).as("roll_max"),
      count(col("value")).over(w).as("roll_n"))
  }

  /** Per-sample anomaly score against the channel's own trailing
    * window: z = (value − mean)/std over `[ts − W, ts]` — the
    * "deviation alarm" analytic an archiver's users run downstream of
    * the sample API. One channel-clustered shuffle; mean and variance
    * come from exact DECIMAL Σx / Σx² window sums (order-exact across
    * partition topologies and engines), combined in one shared
    * double parenthesization:
    *
    *   var = max( (Σx² − (Σx)²/n) / (n−1), 0 )    (sample variance,
    *   clamped — cancellation can leave a tiny negative)
    *
    * Degenerate frames are NULL, not garbage: n < 2 → no std, std = 0
    * (constant window) → no z. The current sample is part of its own
    * window (self-inclusive baseline — an isolated spike still scores,
    * capped near √n by construction).
    *
    * Scale note: this declarative form inherits the sliding-frame
    * re-evaluation cost ([[trailingFast]]'s doc — O(n·frame) on dense
    * channels); it is the equivalence REFERENCE for the linear
    * [[zscoreFast]] (same bytes, same oracle), which the obvious-name
    * [[zscore]] delegates to.
    */
  def zscoreReference(samples: DataFrame, windowSec: Long): DataFrame = {
    val w = Window.partitionBy("channel").orderBy(col("ts"))
      .rangeBetween(-windowSec * Samples.NS, 0L)
    val sx = sum(col("value").cast("decimal(38,12)")).over(w).cast("double")
    val sxx = sum((col("value") * col("value")).cast("decimal(38,12)"))
      .over(w).cast("double")
    val n = count(col("value")).over(w)
    val staged = samples.select(col("channel"), col("ts"), col("value"),
      sx.as("sx"), sxx.as("sxx"), n.as("n"))
    val mean = col("sx") / col("n")
    val variance = greatest(
      (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1),
      lit(0.0))
    val std = when(col("n") >= 2, sqrt(variance))
    staged.select(col("channel"), col("ts"), col("value"),
      mean.as("zmean"), std.as("zstd"),
      when(std > 0, (col("value") - mean) / std).as("zscore"))
  }

  /** [[zscore]] in linear time — the deque walker's sibling carrying
    * Σx AND Σx² as exact decimals (add/subtract order-exact, so
    * incremental ≡ the RANGE window's re-aggregated sums bit for bit;
    * each x² term is the double product cast to DECIMAL(38,12) exactly
    * as the declarative plan casts it). Same one shuffle + sort; the
    * mean/variance double math repeats [[zscore]]'s parenthesization
    * verbatim, so both paths serve the same oracle bytes.
    */
  def zscoreFast(samples: DataFrame, windowSec: Long): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val w = windowSec * Samples.NS
    samples.select(col("channel"), lit(0L).as("_ck"), col("ts"),
        col("value"), lit(true).as("_emit"))
      .as[(String, Long, Long, Option[Double], Boolean)]
      .repartition(col("channel"))
      .sortWithinPartitions(col("channel"), col("ts"))
      .mapPartitions(zwalk(_, w))
      .toDF()
  }

  /** [[zscoreFast]] with the chunk-parallel skew treatment of
    * [[trailingFastChunked]]: tumbling chunks with non-emitted
    * look-back context rows, one shuffle on (channel, chunk), a hot
    * channel becomes parallel chunk tasks at ≤ 2× shuffled rows.
    */
  def zscoreFastChunked(samples: DataFrame, windowSec: Long,
                        chunkSec: Long): DataFrame = {
    require(chunkSec >= windowSec,
      s"chunkSec ($chunkSec) must be >= windowSec ($windowSec)")
    val spark = samples.sparkSession
    import spark.implicits._
    val w = windowSec * Samples.NS
    val c = chunkSec * Samples.NS
    val base = samples.select(col("channel"), col("ts"), col("value"))
    val own = base
      .select(col("channel"), Samples.windowStart(col("ts"), c).as("_ck"),
        col("ts"), col("value"), lit(true).as("_emit"))
    val ctx = base
      .select(col("channel"),
        (Samples.windowStart(col("ts"), c) + lit(c)).as("_ck"),
        col("ts"), col("value"), lit(false).as("_emit"))
      .where(col("ts") >= col("_ck") - lit(w))
    own.unionByName(ctx)
      .as[(String, Long, Long, Option[Double], Boolean)]
      .repartition(col("channel"), col("_ck"))
      .sortWithinPartitions(col("channel"), col("_ck"), col("ts"))
      .mapPartitions(zwalk(_, w))
      .toDF()
  }

  /** The z-score walker over one sorted partition — the [[walk]]
    * shape carrying Σx AND Σx² as exact decimals (add/subtract
    * order-exact, so incremental ≡ the RANGE window's re-aggregated
    * sums bit for bit; each x² term is the double product cast to
    * DECIMAL(38,12) exactly as the declarative plan casts it). The
    * mean/variance double math repeats [[zscore]]'s parenthesization
    * verbatim, so every path serves the same oracle bytes.
    */
  private def zwalk(it: Iterator[(String, Long, Long, Option[Double], Boolean)],
                    w: Long): Iterator[ZOut] = {
    val buf = it.buffered
    new Iterator[ZOut] {
      var ch: String = null
      var ck: Long = Long.MinValue
      val ring = scala.collection.mutable.ArrayDeque.empty[(Long, Option[Double])]
      var sx = java.math.BigDecimal.ZERO
      var sxx = java.math.BigDecimal.ZERO
      var cnt = 0L
      val pending = scala.collection.mutable.Queue.empty[ZOut]

      // non-finite x: the declarative plan's double→DECIMAL cast yields
      // NULL (non-ANSI), so sum() skips the term while count(value)
      // still counts the non-null double — mirror that here instead of
      // letting BigDecimal.valueOf throw on NaN/Infinity (the walkers
      // and the RANGE path are gated as byte-identical, so their
      // failure modes must match too)
      private def dec(x: Double): java.math.BigDecimal =
        if (java.lang.Double.isFinite(x))
          java.math.BigDecimal.valueOf(x)
            .setScale(12, java.math.RoundingMode.HALF_UP)
        else null

      private def add(acc: java.math.BigDecimal, d: java.math.BigDecimal) =
        if (d == null) acc else acc.add(d)
      private def sub(acc: java.math.BigDecimal, d: java.math.BigDecimal) =
        if (d == null) acc else acc.subtract(d)

      private def push(ts: Long, v: Option[Double]): Unit = {
        ring.append((ts, v))
        v.foreach { x =>
          sx = add(sx, dec(x)); sxx = add(sxx, dec(x * x)); cnt += 1
        }
      }

      private def evict(lo: Long): Unit =
        while (ring.nonEmpty && ring.head._1 < lo) {
          val (_, ev) = ring.removeHead()
          ev.foreach { x =>
            sx = sub(sx, dec(x)); sxx = sub(sxx, dec(x * x))
            cnt -= 1
          }
        }

      private def refill(): Unit = {
        if (buf.isEmpty) return
        val (c, k, ts, _, _) = buf.head
        if (c != ch || k != ck) {
          ch = c; ck = k; ring.clear()
          sx = java.math.BigDecimal.ZERO; sxx = java.math.BigDecimal.ZERO
          cnt = 0L
        }
        val peers = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Double], Boolean)]
        while (buf.hasNext && buf.head._1 == ch && buf.head._2 == ck &&
               buf.head._3 == ts) {
          val r = buf.next(); peers += ((r._3, r._4, r._5))
        }
        peers.foreach { case (t, v, _) => push(t, v) }
        evict(ts - w)
        // the zscore() parenthesization, verbatim
        val sxd = sx.doubleValue(); val sxxd = sxx.doubleValue()
        val mean = if (cnt == 0) None else Some(sxd / cnt)
        val std = if (cnt >= 2)
          Some(math.sqrt(math.max((sxxd - sxd * sxd / cnt) / (cnt - 1), 0.0)))
        else None
        peers.foreach { case (t, v, emit) =>
          if (emit) {
            val z = for (x <- v; s <- std if s > 0; m <- mean)
              yield (x - m) / s
            pending.enqueue(ZOut(ch, t, v, mean, std, z))
          }
        }
      }

      def hasNext: Boolean = {
        while (pending.isEmpty && buf.hasNext) refill()
        pending.nonEmpty
      }
      def next(): ZOut = { hasNext; pending.dequeue() }
    }
  }

  /** The shared linear-time frame walker over one sorted partition:
    * rows are (group channel, group chunk, ts, value, emit). State
    * resets on (channel, chunk) change; an exact DECIMAL running sum
    * (decimal add/subtract is order-exact, so incremental ≡
    * re-aggregated — the same reason the gated mean is DECIMAL-routed)
    * and monotonic deques for min/max give amortized-O(1) maintenance.
    * RANGE-frame peer semantics are preserved: all rows sharing a ts
    * enter the frame before any of them emits. Rows with emit = false
    * are look-back context only (the chunked path's warm-up prefix).
    */
  private def walk(it: Iterator[(String, Long, Long, Option[Double], Boolean)],
                   w: Long): Iterator[RollOut] = {
    val buf = it.buffered
    new Iterator[RollOut] {
      var ch: String = null
      var ck: Long = Long.MinValue
      val ring = scala.collection.mutable.ArrayDeque.empty[(Long, Option[Double])]
      val minDq = scala.collection.mutable.ArrayDeque.empty[(Long, Double)]
      val maxDq = scala.collection.mutable.ArrayDeque.empty[(Long, Double)]
      var sum = java.math.BigDecimal.ZERO
      var cnt = 0L
      val pending = scala.collection.mutable.Queue.empty[RollOut]

      // cast double→DECIMAL(38,12), Spark's way — including the
      // non-ANSI NaN/Infinity → NULL rule (sum skips the term,
      // count(value) still counts it), so a non-finite sample degrades
      // identically to the declarative RANGE path instead of throwing
      private def dec(x: Double): java.math.BigDecimal =
        if (java.lang.Double.isFinite(x))
          java.math.BigDecimal.valueOf(x)
            .setScale(12, java.math.RoundingMode.HALF_UP)
        else null

      private def push(ts: Long, v: Option[Double]): Unit = {
        ring.append((ts, v))
        v.foreach { x =>
          val d = dec(x); if (d != null) sum = sum.add(d); cnt += 1
          // Double.compare ordering = Spark's: NaN greater than
          // everything (so a window holding a NaN reports max = NaN,
          // min = smallest finite, like the declarative min/max)
          while (minDq.nonEmpty &&
            java.lang.Double.compare(minDq.last._2, x) >= 0)
            minDq.removeLast()
          minDq.append((ts, x))
          while (maxDq.nonEmpty &&
            java.lang.Double.compare(maxDq.last._2, x) <= 0)
            maxDq.removeLast()
          maxDq.append((ts, x))
        }
      }

      private def evict(lo: Long): Unit = {
        while (ring.nonEmpty && ring.head._1 < lo) {
          val (_, ev) = ring.removeHead()
          ev.foreach { x =>
            val d = dec(x); if (d != null) sum = sum.subtract(d); cnt -= 1
          }
        }
        while (minDq.nonEmpty && minDq.head._1 < lo) minDq.removeHead()
        while (maxDq.nonEmpty && maxDq.head._1 < lo) maxDq.removeHead()
      }

      private def refill(): Unit = {
        if (buf.isEmpty) return
        val (c, k, ts, _, _) = buf.head
        if (c != ch || k != ck) {
          ch = c; ck = k; ring.clear(); minDq.clear(); maxDq.clear()
          sum = java.math.BigDecimal.ZERO; cnt = 0L
        }
        // absorb the whole ts-peer group before emitting any of it
        // (RANGE frames include peers on both sides of the order)
        val peers = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Double], Boolean)]
        while (buf.hasNext && buf.head._1 == ch && buf.head._2 == ck &&
               buf.head._3 == ts) {
          val r = buf.next(); peers += ((r._3, r._4, r._5))
        }
        peers.foreach { case (t, v, _) => push(t, v) }
        evict(ts - w)
        val mean = if (cnt == 0) None else Some(sum.doubleValue() / cnt)
        val mn = minDq.headOption.map(_._2)
        val mx = maxDq.headOption.map(_._2)
        peers.foreach { case (t, _, emit) =>
          if (emit) pending.enqueue(RollOut(ch, t, mean, mn, mx, cnt))
        }
      }

      def hasNext: Boolean = {
        while (pending.isEmpty && buf.hasNext) refill()
        pending.nonEmpty
      }
      def next(): RollOut = { hasNext; pending.dequeue() }
    }
  }

  /** Same result as [[trailing]], linear time. Spark's
    * `SlidingWindowFunctionFrame` re-evaluates a bounded frame's
    * aggregate buffer from scratch every time the frame slides (no
    * retraction), so [[trailing]] is O(n·frame) — on a dense channel
    * (1 Hz samples, 1 h window → 3600-row frames) the per-row rescan
    * dominates. This variant keeps the one channel-clustered shuffle +
    * in-partition sort, then walks each channel once with the
    * amortized-O(1) [[walk]] core. Equivalence to [[trailing]] (incl.
    * nulls and ts ties) is pinned in RollingSpec; the gate serves
    * either path from the same oracle.
    */
  def trailingFast(samples: DataFrame, windowSec: Long): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val w = windowSec * Samples.NS
    samples.select(col("channel"), lit(0L).as("_ck"), col("ts"),
        col("value"), lit(true).as("_emit"))
      .as[(String, Long, Long, Option[Double], Boolean)]
      .repartition(col("channel"))
      .sortWithinPartitions(col("channel"), col("ts"))
      .mapPartitions(walk(_, w))
      .toDF()
  }

  /** [[trailingFast]] with bounded per-task work under hot-channel
    * skew: the time axis splits into `chunkSec` tumbling chunks that
    * process in PARALLEL (the rolling analog of
    * `Samples.monotonicDedupChunked`). Every row is shipped once to
    * its own chunk and once more as look-back CONTEXT to the next
    * chunk when a trailing window starting there can still reach it
    * (`ts ≥ nextChunkStart − W`; at most one extra copy since
    * `chunkSec ≥ windowSec` is required) — context rows prime the
    * frame and are not emitted. One shuffle on (channel, chunk): a
    * 1 Hz mega-channel at chunkSec = 86400 becomes ~86k-row tasks
    * spread across the cluster instead of one straggler, at ≤ 2×
    * shuffled rows. Chunked ≡ plain pinned in RollingSpec.
    */
  def trailingFastChunked(samples: DataFrame, windowSec: Long,
                          chunkSec: Long): DataFrame = {
    require(chunkSec >= windowSec,
      s"chunkSec ($chunkSec) must be >= windowSec ($windowSec)")
    val spark = samples.sparkSession
    import spark.implicits._
    val w = windowSec * Samples.NS
    val c = chunkSec * Samples.NS
    val base = samples.select(col("channel"), col("ts"), col("value"))
    val own = base
      .select(col("channel"), Samples.windowStart(col("ts"), c).as("_ck"),
        col("ts"), col("value"), lit(true).as("_emit"))
    val ctx = base
      .select(col("channel"),
        (Samples.windowStart(col("ts"), c) + lit(c)).as("_ck"),
        col("ts"), col("value"), lit(false).as("_emit"))
      .where(col("ts") >= col("_ck") - lit(w))
    own.unionByName(ctx)
      .as[(String, Long, Long, Option[Double], Boolean)]
      .repartition(col("channel"), col("_ck"))
      .sortWithinPartitions(col("channel"), col("_ck"), col("ts"))
      .mapPartitions(walk(_, w))
      .toDF()
  }
}
