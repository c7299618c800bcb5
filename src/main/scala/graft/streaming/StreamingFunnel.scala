package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST-side ordered-funnel detection: the streaming form of
  * [[Sessionize.funnel]]. The batch operator's greedy fold is
  * PERFECTLY incremental — per-user keyed state carries the k
  * reached-times, and a step completion emits ONCE, the moment its
  * qualifying event arrives (the "user just converted" signal a batch
  * funnel can only report after the fact).
  *
  * Ordering contract: events replay in (ts, event_type) order inside
  * a micro-batch — the batch fold's sort — and cross-batch order
  * comes from the replayed source being time-ordered (the drain gate
  * feeds time-sorted files; a production deployment keys this to the
  * ingest time the funnel is defined over). Each (user, step) emits
  * at most once, so the drained rows ARE the batch operator's
  * reached-set and [[Sessionize.funnelSummary]] over them serves the
  * batch bytes (hash-gated by `stream_funnel` against the same DuckDB
  * oracle as `events_funnel`).
  */
object StreamingFunnel {

  /** Per-user reached-times (Long.MinValue = step not reached) plus
    * the newest event timestamp processed — the F6-style cross-batch
    * out-of-order guard: the time-ordered-source contract is ENFORCED,
    * not just documented, by dropping any later-batch event older than
    * what this user's fold has already consumed (processing it as if
    * in order would silently diverge from the batch fold).
    */
  case class FunnelState(reached: Seq[Long],
                         lastTs: Long = Long.MinValue)

  case class InEvent(user_id: Long, ts: Long, event_type: String)

  case class FunnelHit(user_id: Long, step: Int, ts: Long)

  def processUser(steps: IndexedSeq[String], windowNs: Long)(
      user: Long, it: Iterator[InEvent],
      state: GroupState[FunnelState]): Iterator[FunnelHit] = {
    val k = steps.length
    val st = state.getOption
    val reached = st.map(_.reached.toArray)
      .getOrElse(Array.fill(k)(Long.MinValue))
    var lastTs = st.map(_.lastTs).getOrElse(Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
    for (e <- it.toSeq.sortBy(ev => (ev.ts, ev.event_type))) {
      if (e.ts < lastTs) {
        // cross-batch straggler: an earlier-ts event arriving after a
        // later one was folded — dropped (same-ts replays pass through
        // harmlessly, each (user, step) emits at most once)
      } else {
        lastTs = e.ts
        val i = steps.indexOf(e.event_type)
        if (i >= 0 && reached(i) == Long.MinValue) {
          val ok =
            if (i == 0) true
            else reached(i - 1) != Long.MinValue && e.ts > reached(i - 1) &&
              e.ts - reached(0) <= windowNs
          if (ok) { reached(i) = e.ts; out += FunnelHit(user, i, e.ts) }
        }
      }
    }
    state.update(FunnelState(reached.toSeq, lastTs))
    out.iterator
  }

  /** One `flatMapGroupsWithState` over the user key, Append mode —
    * each step completion is final the moment it happens.
    */
  def funnelStream(events: Dataset[InEvent], steps: Seq[String],
                   windowNs: Long)
                  (implicit spark: SparkSession): Dataset[FunnelHit] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      "funnel needs at least two distinct steps")
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        processUser(steps.toIndexedSeq, windowNs))
  }
}
