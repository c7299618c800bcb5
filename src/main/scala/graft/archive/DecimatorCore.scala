package graft.archive

/** The tumbling-window time-weighted decimator as a pure state
  * machine — one implementation of the reference's SampleDecimator
  * semantics shared by every execution path:
  *
  *  - [[Decimation.decimate]]: declarative Catalyst plan (explode);
  *  - [[Decimation.decimateSorted]]: sorted mapPartitions one-pass;
  *  - [[graft.streaming.StreamingDecimation]]: keyed streaming state.
  *
  * Paths differ only in how rows reach the machine; the math is here
  * once, so stream ≡ batch ≡ one-pass by construction.
  */
object DecimatorCore {

  /** Held sample + open-window accumulator. */
  case class State(lastTs: Long, lastValue: Option[Double], winStart: Long,
                   sumW: Double, sumWX: Double, sumWX2: Double,
                   minV: Option[Double], maxV: Option[Double], n: Long)

  case class Out(channel: String, win_start: Long, mean: Option[Double],
                 std: Option[Double], min_value: Option[Double],
                 max_value: Option[Double], covered_fraction: Double,
                 n_samples: Long)

  def init(ts: Long, value: Option[Double], periodNs: Long): State =
    State(ts, value, ts - math.floorMod(ts, periodNs),
      0.0, 0.0, 0.0, None, None, 0)

  /** Close the open window at `winEnd` and emit its aggregate. */
  def emit(channel: String, st: State, periodNs: Long): Out = {
    val winEnd = st.winStart + periodNs
    val tail = (winEnd - math.max(st.lastTs, st.winStart)).toDouble
    val (w, wx, wx2, n2) = st.lastValue match {
      case Some(v) =>
        (st.sumW + tail, st.sumWX + tail * v, st.sumWX2 + tail * v * v, st.n + 1)
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
      Out(channel, st.winStart, Some(mean), Some(std), minV, maxV,
        w / periodNs, n2)
    } else Out(channel, st.winStart, None, None, minV, maxV, 0.0, 0)
  }

  /** Feed one sample (already monotone: ts > state.lastTs). Returns
    * the windows it flushed (incl. gap windows) and the new state.
    */
  def advance(channel: String, st: State, ts: Long, value: Option[Double],
              periodNs: Long): (Seq[Out], State) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]
    var s = st
    while (ts >= s.winStart + periodNs) {
      out += emit(channel, s, periodNs)
      s = s.copy(winStart = s.winStart + periodNs,
        sumW = 0.0, sumWX = 0.0, sumWX2 = 0.0, minV = None, maxV = None, n = 0)
    }
    // close the held sample's validity inside the (now current) window
    val from = math.max(s.lastTs, s.winStart)
    val dur = (ts - from).toDouble
    s.lastValue match {
      case Some(v) if dur > 0 =>
        s = s.copy(sumW = s.sumW + dur, sumWX = s.sumWX + dur * v,
          sumWX2 = s.sumWX2 + dur * v * v,
          minV = Some(s.minV.fold(v)(math.min(_, v))),
          maxV = Some(s.maxV.fold(v)(math.max(_, v))),
          n = s.n + 1)
      case _ => ()
    }
    (out.toSeq, s.copy(lastTs = ts, lastValue = value))
  }

  /** Run the machine over one channel's ts-ordered, deduplicated
    * samples (batch path). Emits exactly the windows with end <= the
    * channel's last ts — the flush-on-crossing rule.
    */
  def run(channel: String, samples: Iterator[(Long, Option[Double])],
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
