package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StreamingDecimation.InSample

/** ST-side CUSUM mean-shift detection: the streaming form of
  * [[graft.archive.Analytics.cusumShifts]]. The batch operator's
  * closed form (prefix sum minus its running extremum) is PERFECTLY
  * incremental — per-channel keyed state carries the prefix sums and
  * their extrema, every arriving sample emits its two-sided CUSUM
  * statistic once, and the drained stream aggregates to the batch
  * summary byte for byte (hash-gated by `stream_cusum` against the
  * same DuckDB oracle as `arch_cusum_shifts`).
  *
  * Targets are the monitored baseline means (value units, 6dp grid) —
  * in production the output of a calibration pass over the baseline
  * window (exactly what the gate computes with
  * [[graft.archive.Analytics.cusumTargets]]); a channel without a
  * target is passed through silently (nothing to monitor against).
  *
  * Ordering contract matches [[StreamingRolling]]: samples replay in
  * arrival (`seq`) order inside a micro-batch, persisted lastTs drops
  * out-of-order/duplicate arrivals across batches (F6). Prefix sums
  * are unbounded over an infinite stream, so the persisted state
  * carries them as BigInt strings; the EMITTED statistic is the
  * excursion height (prefix minus running extremum), which is
  * range-bounded in practice and guarded against Long overflow.
  */
object StreamingCusum {

  /** Persisted per-channel state: prefix sums and their running
    * extrema on the 6dp integer grid, as BigInt strings (a year of a
    * drifting hot channel can outgrow a Long; the grid stays exact).
    */
  case class CusumState(lastTs: Long, pHi: String, minPHi: String,
                        pLo: String, maxPLo: String)

  case class CusumOut(channel: String, ts: Long,
                      cusum_hi_q: Long, cusum_lo_q: Long)

  def processChannel(targets: Map[String, Long], slackQ: Long)(
      channel: String, it: Iterator[InSample],
      state: GroupState[CusumState]): Iterator[CusumOut] = {
    targets.get(channel) match {
      case None => Iterator.empty
      case Some(tq) =>
        val st = state.getOption.getOrElse(
          CusumState(Long.MinValue, "0", "0", "0", "0"))
        var lastTs = st.lastTs
        var pHi = BigInt(st.pHi); var minPHi = BigInt(st.minPHi)
        var pLo = BigInt(st.pLo); var maxPLo = BigInt(st.maxPLo)
        val out = scala.collection.mutable.ArrayBuffer.empty[CusumOut]
        for (s <- it.toSeq.sortBy(_.seq)) {
          if (lastTs == Long.MinValue || s.ts > lastTs) { // F6
            lastTs = s.ts
            // match the batch filter EXACTLY: null and NaN drop; the
            // quantization replays Spark's round() (BigDecimal HALF_UP
            // on the canonical double string) — scala math.round is
            // floor(x+0.5), which differs on NEGATIVE half-grid values
            // (-2.5 → -2 vs the batch/oracle -3). An Infinity throws
            // here exactly as loudly as the batch's ANSI cast would.
            s.value.filter(v => !java.lang.Double.isNaN(v)).foreach { v =>
              val q = BigInt(java.math.BigDecimal.valueOf(v * 1e6)
                .setScale(0, java.math.RoundingMode.HALF_UP)
                .toBigInteger)
              pHi += q - tq - slackQ
              if (pHi < minPHi) minPHi = pHi
              pLo += q - tq + slackQ
              if (pLo > maxPLo) maxPLo = pLo
              val hi = pHi - minPHi.min(BigInt(0))
              val lo = maxPLo.max(BigInt(0)) - pLo
              require(hi.bitLength < 63 && lo.bitLength < 63,
                s"CUSUM excursion overflows the wire Long on $channel")
              out += CusumOut(channel, s.ts, hi.toLong, lo.toLong)
            }
          }
        }
        state.update(CusumState(lastTs, pHi.toString, minPHi.toString,
          pLo.toString, maxPLo.toString))
        out.iterator
    }
  }

  /** One `flatMapGroupsWithState` over the channel key, Append mode —
    * each sample's CUSUM statistic is final the moment it arrives.
    */
  def cusumStream(samples: Dataset[InSample], targets: Map[String, Long],
                  slack: Double)
                 (implicit spark: SparkSession): Dataset[CusumOut] = {
    import spark.implicits._
    samples
      .groupByKey(_.channel)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        processChannel(targets, math.round(slack * 1e6)))
  }
}
