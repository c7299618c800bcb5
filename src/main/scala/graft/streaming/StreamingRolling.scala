package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.archive.RollOut
import StreamingDecimation.InSample

/** ST-side trailing-window analytics: the streaming form of
  * [[graft.archive.Rolling.trailingFast]]. Per-channel keyed state
  * holds the trailing `windowSec` span of samples (a ring bounded by
  * the densest window, the same bound as the batch walker's frame);
  * every arriving sample emits its trailing mean/min/max/count ONCE.
  *
  * Ordering contract matches [[StreamingDecimation.decimateStream]]:
  * samples replay in arrival (`seq`) order inside a micro-batch and
  * the persisted lastTs drops out-of-order/duplicate arrivals across
  * batches (F6) — so on a monotonic input the streamed output is
  * byte-identical to the batch operator (pinned in RollingSpec and
  * hash-gated by `stream_rolling_window` against the same DuckDB
  * oracle as the batch RANGE frame).
  *
  * The mean is recomputed from the ring per emission through the same
  * DECIMAL(38,12) casts as the batch path — decimal sums are
  * order-exact, so stream ≡ batch bit-for-bit. Per-record cost is
  * O(frame) (vs the batch walker's amortized O(1)); at streaming
  * rates the frame bound, not throughput, is what matters.
  */
object StreamingRolling {

  case class RollState(lastTs: Long, ring: List[(Long, Option[Double])])

  private def dec(x: Double) =
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)

  def processChannel(windowNs: Long)(
      channel: String, it: Iterator[InSample],
      state: GroupState[RollState]): Iterator[RollOut] = {
    var st = state.getOption.getOrElse(RollState(Long.MinValue, Nil))
    val out = scala.collection.mutable.ArrayBuffer.empty[RollOut]
    for (s <- it.toSeq.sortBy(_.seq)) {
      if (st.lastTs == Long.MinValue || s.ts > st.lastTs) { // F6
        val ring = (st.ring :+ ((s.ts, s.value)))
          .dropWhile(_._1 < s.ts - windowNs)
        st = RollState(s.ts, ring)
        val vs = ring.flatMap(_._2)
        val mean =
          if (vs.isEmpty) None
          else Some(vs.map(dec).reduce(_.add(_)).doubleValue() / vs.size)
        out += RollOut(channel, s.ts, mean,
          if (vs.isEmpty) None else Some(vs.min),
          if (vs.isEmpty) None else Some(vs.max), vs.size.toLong)
      }
    }
    state.update(st)
    out.iterator
  }

  /** One `flatMapGroupsWithState` over the channel key, Append mode —
    * emitted rows are final the moment their sample arrives.
    */
  def trailingStream(samples: Dataset[InSample], windowSec: Long)
                    (implicit spark: SparkSession): Dataset[RollOut] = {
    import spark.implicits._
    samples
      .groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        processChannel(windowSec * 1000000000L))
  }
}
