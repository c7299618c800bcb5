package graft.archive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Samples

/** Output row of the rolling operators. */
case class RollOut(channel: String, ts: Long, roll_mean: Option[Double],
                   roll_min: Option[Double], roll_max: Option[Double],
                   roll_n: Long)

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

  /** Same result as [[trailing]], linear time. Spark's
    * `SlidingWindowFunctionFrame` re-evaluates a bounded frame's
    * aggregate buffer from scratch every time the frame slides (no
    * retraction), so [[trailing]] is O(n·frame) — on a dense channel
    * (1 Hz samples, 1 h window → 3600-row frames) the per-row rescan
    * dominates. This variant keeps the one channel-clustered shuffle +
    * in-partition sort, then walks each channel once with
    * amortized-O(1) frame maintenance: an exact DECIMAL running sum
    * (decimal add/subtract is order-exact, so incremental ≡
    * re-aggregated — the same reason the gated mean is DECIMAL-routed)
    * and monotonic deques for min/max (the classic sliding-window-
    * minimum structure). RANGE-frame peer semantics are preserved:
    * all rows sharing a ts enter the frame before any of them emits.
    * Equivalence to [[trailing]] (incl. nulls and ts ties) is pinned
    * in RollingSpec; the gate serves either path from the same oracle.
    */
  def trailingFast(samples: DataFrame, windowSec: Long): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val w = windowSec * Samples.NS
    samples.select(col("channel"), col("ts"), col("value"))
      .as[(String, Long, Option[Double])]
      .repartition(col("channel"))
      .sortWithinPartitions(col("channel"), col("ts"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[RollOut] {
          // per-channel frame state, reset on channel change
          var ch: String = null
          val ring = scala.collection.mutable.ArrayDeque.empty[(Long, Option[Double])]
          val minDq = scala.collection.mutable.ArrayDeque.empty[(Long, Double)]
          val maxDq = scala.collection.mutable.ArrayDeque.empty[(Long, Double)]
          var sum = java.math.BigDecimal.ZERO
          var cnt = 0L
          val pending = scala.collection.mutable.Queue.empty[RollOut]

          private def push(ts: Long, v: Option[Double]): Unit = {
            ring.append((ts, v))
            v.foreach { x =>
              // cast double→DECIMAL(38,12) the way Spark's cast does
              sum = sum.add(java.math.BigDecimal.valueOf(x)
                .setScale(12, java.math.RoundingMode.HALF_UP))
              cnt += 1
              while (minDq.nonEmpty && minDq.last._2 >= x) minDq.removeLast()
              minDq.append((ts, x))
              while (maxDq.nonEmpty && maxDq.last._2 <= x) maxDq.removeLast()
              maxDq.append((ts, x))
            }
          }

          private def evict(lo: Long): Unit = {
            while (ring.nonEmpty && ring.head._1 < lo) {
              val (_, ev) = ring.removeHead()
              ev.foreach { x =>
                sum = sum.subtract(java.math.BigDecimal.valueOf(x)
                  .setScale(12, java.math.RoundingMode.HALF_UP))
                cnt -= 1
              }
            }
            while (minDq.nonEmpty && minDq.head._1 < lo) minDq.removeHead()
            while (maxDq.nonEmpty && maxDq.head._1 < lo) maxDq.removeHead()
          }

          private def refill(): Unit = {
            if (buf.isEmpty) return
            val (c, ts, _) = buf.head
            if (c != ch) {
              ch = c; ring.clear(); minDq.clear(); maxDq.clear()
              sum = java.math.BigDecimal.ZERO; cnt = 0L
            }
            // absorb the whole ts-peer group before emitting any of it
            // (RANGE frames include peers on both sides of the order)
            val peers = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Double])]
            while (buf.hasNext && buf.head._1 == ch && buf.head._2 == ts) {
              val r = buf.next(); peers += ((r._2, r._3))
            }
            peers.foreach { case (t, v) => push(t, v) }
            evict(ts - w)
            val mean = if (cnt == 0) None
              else Some(sum.doubleValue() / cnt)
            val mn = minDq.headOption.map(_._2)
            val mx = maxDq.headOption.map(_._2)
            peers.foreach { case (t, _) =>
              pending.enqueue(RollOut(ch, t, mean, mn, mx, cnt))
            }
          }

          def hasNext: Boolean = { if (pending.isEmpty) refill(); pending.nonEmpty }
          def next(): RollOut = { if (pending.isEmpty) refill(); pending.dequeue() }
        }
      }
      .toDF()
  }
}
