package graft.archive

import graft.core.TypedSamples

/** The 21-type tumbling-window decimator as a pure state machine —
  * the typed sibling of [[DecimatorCore]], shared by the streaming
  * path ([[graft.streaming.StreamingDecimation.decimateTypedStream]])
  * and testable against the declarative
  * [[TypedDecimation.decimate]] plan so stream ≡ batch holds for the
  * full type-dispatch semantics
  * (ChannelAccessSampleDecimator.java:124-296), not just the scalar
  * path.
  */
object TypedDecimatorCore {

  /** One sample's typed payload (the value union minus key columns). */
  case class TValue(vtype: String,
                    value: Option[Double] = None,
                    strValue: Option[String] = None,
                    enumValue: Option[Int] = None,
                    labels: Option[Seq[String]] = None,
                    arrNum: Option[Seq[Double]] = None,
                    arrStr: Option[Seq[String]] = None,
                    aggMean: Option[Double] = None,
                    aggStd: Option[Double] = None,
                    aggMin: Option[Double] = None,
                    aggMax: Option[Double] = None,
                    aggCov: Option[Double] = None,
                    severity: Option[Int] = None,
                    status: Option[Int] = None)

  /** Per-type aggregator state within the open window — the
    * reference's one-aggregator-per-type EnumMap
    * (ChannelAccessSampleDecimator.java:77-79).
    */
  case class TypeAgg(coveredNs: Double, sumWx: Double, sumWx2: Double,
                     minV: Option[Double], maxV: Option[Double],
                     maxSev: Option[Int], statusAtMax: Option[Int],
                     firstTs: Long, first: TValue, n: Long)

  case class State(lastTs: Long, last: TValue, winStart: Long,
                   aggs: Map[String, TypeAgg])

  case class Out(channel: String, win_start: Long, vtype: String,
                 mean: Option[Double], std: Option[Double],
                 min_value: Option[Double], max_value: Option[Double],
                 covered_fraction: Option[Double],
                 max_severity: Option[Int], status_at_max: Option[Int],
                 first: TValue, n_samples: Long)

  private def isAggregated(tag: String) = tag.startsWith("aggregated_")

  /** Accumulate one validity slice [from, to) of sample `v` into the
    * type map (AveragingSampleAggregator.java:114-141 semantics:
    * aggregated inputs weigh duration × their covered fraction,
    * ns-truncated; severity propagates to the earliest sample
    * attaining the max).
    */
  private def accumulate(aggs: Map[String, TypeAgg], ts: Long, v: TValue,
                         from: Long, to: Long): Map[String, TypeAgg] = {
    if (to <= from) return aggs
    val dur = (to - from).toDouble
    val w = if (isAggregated(v.vtype)) math.floor(dur * v.aggCov.getOrElse(0.0))
            else dur
    val x = if (isAggregated(v.vtype)) v.aggMean else v.value
    val x2 = if (isAggregated(v.vtype))
      for (m <- v.aggMean; s <- v.aggStd) yield s * s + m * m
    else v.value.map(d => d * d)
    val mn = if (isAggregated(v.vtype)) v.aggMin else v.value
    val mx = if (isAggregated(v.vtype)) v.aggMax else v.value
    val cur = aggs.get(v.vtype)
    val next = cur match {
      case None =>
        TypeAgg(w, x.map(_ * w).getOrElse(0.0), x2.map(_ * w).getOrElse(0.0),
          mn, mx, v.severity, v.status, ts, v, 1)
      case Some(a) =>
        val sevBeats = (v.severity, a.maxSev) match {
          case (Some(s), Some(m)) => s > m
          case (Some(_), None) => true
          case _ => false
        }
        a.copy(
          coveredNs = a.coveredNs + w,
          sumWx = a.sumWx + x.map(_ * w).getOrElse(0.0),
          sumWx2 = a.sumWx2 + x2.map(_ * w).getOrElse(0.0),
          minV = (a.minV.toSeq ++ mn.toSeq)
            .reduceOption((p: Double, q: Double) => math.min(p, q)),
          maxV = (a.maxV.toSeq ++ mx.toSeq)
            .reduceOption((p: Double, q: Double) => math.max(p, q)),
          maxSev = if (sevBeats) v.severity else a.maxSev,
          statusAtMax = if (sevBeats) v.status else a.statusAtMax,
          n = a.n + 1)
    }
    aggs + (v.vtype -> next)
  }

  /** Close the open window: add the held sample's tail slice, run the
    * type dispatch (ChannelAccessSampleDecimator.java:127-190), emit.
    */
  def emit(channel: String, st: State, periodNs: Long): Out = {
    val winEnd = st.winStart + periodNs
    val aggs = accumulate(st.aggs, st.lastTs, st.last,
      math.max(st.lastTs, st.winStart), winEnd)
    val rank = TypedSamples.TypeRank.toMap
    val firstType = aggs.minBy(_._2.firstTs)._1
    val hasBlocker = aggs.keys.exists(TypedSamples.Blockers)
    val bestAgg = aggs
      .filter { case (t, a) => TypedSamples.Aggregatable(t) && a.coveredNs > 0 }
      .toSeq
      .sortBy { case (t, a) => (-a.coveredNs, rank(t)) }
      .headOption.map(_._1)
    val chosen =
      if (aggs.size > 1 && !hasBlocker && bestAgg.isDefined) bestAgg.get
      else firstType
    val a = aggs(chosen)
    if (TypedSamples.Aggregatable(chosen)) {
      val mean = a.sumWx / a.coveredNs
      val variance = a.sumWx2 / a.coveredNs - mean * mean
      val std = if (variance < 1e-9) 0.0 else math.sqrt(variance)
      Out(channel, st.winStart, TypedSamples.aggregatedTag(chosen),
        Some(mean), Some(std), a.minV, a.maxV,
        Some(a.coveredNs / periodNs), a.maxSev, a.statusAtMax, a.first, a.n)
    } else
      Out(channel, st.winStart, chosen, None, None, None, None, None,
        None, None, a.first, a.n)
  }

  def init(ts: Long, v: TValue, periodNs: Long): State =
    State(ts, v, ts - math.floorMod(ts, periodNs), Map.empty)

  /** Feed one sample (already monotone: ts > state.lastTs). */
  def advance(channel: String, st: State, ts: Long, v: TValue,
              periodNs: Long): (Seq[Out], State) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]
    var s = st
    while (ts >= s.winStart + periodNs) {
      out += emit(channel, s, periodNs)
      s = s.copy(winStart = s.winStart + periodNs, aggs = Map.empty)
    }
    val from = math.max(s.lastTs, s.winStart)
    val aggs = accumulate(s.aggs, s.lastTs, s.last, from, ts)
    (out.toSeq, State(ts, v, s.winStart, aggs))
  }

  /** Re-enter a decimated window into a coarser decimation stage —
    * the typed cascade hop (A8): aggregated outputs become
    * aggregated_* input samples (their covered fraction weights the
    * next merge), pick-first outputs re-enter as their first sample's
    * payload re-stamped to the window start. Chaining
    * decimateTypedStream stages with this conversion is the live
    * typed cascade.
    */
  def asInput(o: Out): TValue =
    if (o.vtype.startsWith("aggregated_"))
      TValue(o.vtype, aggMean = o.mean, aggStd = o.std, aggMin = o.min_value,
        aggMax = o.max_value, aggCov = o.covered_fraction,
        severity = o.max_severity, status = o.status_at_max)
    else o.first.copy(vtype = o.vtype)

  /** Batch driver over one channel's ts-ordered samples (flush rule:
    * only windows with end <= last ts emit).
    */
  def run(channel: String, samples: Iterator[(Long, TValue)],
          periodNs: Long): Iterator[Out] = {
    var st: State = null
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]
    for ((ts, v) <- samples) {
      if (st == null) st = init(ts, v, periodNs)
      else if (ts > st.lastTs) {
        val (emitted, next) = advance(channel, st, ts, v, periodNs)
        out ++= emitted
        st = next
      }
    }
    out.iterator
  }
}
