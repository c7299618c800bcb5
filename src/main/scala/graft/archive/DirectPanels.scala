package graft.archive

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import scala.collection.mutable

/** Driver-side replicas of the single-channel analytic panels — the
  * latency companion to [[DirectServe]]: a dashboard's M4/LTTB
  * downsample, stats, spectrum, CUSUM and derived-channel requests
  * over one channel's window are folds over the rows the manifest
  * prunes to, and replaying them on the driver removes every Spark
  * job from the panel's cold path (measured 0.4–0.7 s → ms).
  *
  * Every function here reproduces its engine twin's arithmetic
  * EXACTLY — same quantization (HALF_UP decimal rounds), same exact
  * integer/decimal accumulation (BigInteger / BigDecimal where the
  * engine routes through DECIMAL), same fixed-order double
  * expressions, same tie rules (Spark's total double order:
  * Double.compare — NaN greatest, −0.0 < 0.0) — so the HTTP byte-
  * parity specs hold bit-for-bit whichever path answered.
  * DirectPanelsSpec holds each against its engine twin over NaN,
  * null, duplicate-ts and empty-bucket shapes.
  */
object DirectPanels {

  private type Row = (Long, java.lang.Double) // (ts, value | null)

  /** Spark's `round(x)` on a double: BigDecimal HALF_UP at scale 0. */
  private def roundHalfUp(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).doubleValue

  /** The engine's ANSI double→long cast: non-finite or out-of-range
    * values REFUSE instead of saturating — a fold must refuse exactly
    * where its engine twin does (DirectParityFuzzSpec: a finite
    * 1.5e300 sample made the engine quantization throw CAST_OVERFLOW
    * while `Double.toLong` silently saturated). The 1-ulp fringe at
    * exactly 2^63 is accepted like `toLong` — unreachable from the
    * *1e6 grids these folds quantize on.
    */
  private def ansiToLong(d: Double): Long = {
    if (d.isNaN || d.isInfinite || d < Long.MinValue.toDouble ||
        d > Long.MaxValue.toDouble)
      throw new ArithmeticException(
        s"[CAST_OVERFLOW] $d cannot be cast to BIGINT")
    d.toLong
  }

  /** Spark's scaled 6dp round: round(x*1e6) cast long cast double /1e6.
    * A non-finite product (x infinite, or |x| ≥ ~1.8e302 overflowing
    * the *1e6) bypasses BigDecimal — `BigDecimal.valueOf(Infinity)`
    * would throw NumberFormatException where the engine's ANSI cast
    * refuses with CAST_OVERFLOW; feeding it straight to [[ansiToLong]]
    * keeps the refusal class engine-exact (same guard as the
    * spectrum/rate call sites).
    */
  private def sr6(x: Double): Double = {
    val scaled = x * 1e6
    if (scaled.isInfinite || scaled.isNaN) ansiToLong(scaled).toDouble / 1e6
    else ansiToLong(JBigDecimal.valueOf(scaled)
      .setScale(0, RoundingMode.HALF_UP).doubleValue).toDouble / 1e6
  }

  /** Spark's double ordering (Double.compare: NaN greatest). */
  private def dlt(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) < 0

  /** Analytics.bucketId: min(k-1, (ts-lo)*k div (hi-lo)), exact. */
  private def bucketOf(ts: Long, lo: Long, hi: Long, k: Long): Long =
    math.min(k - 1,
      (BigInt(ts - lo) * k / BigInt(hi - lo)).toLong)

  // ---- M4 ------------------------------------------------------------

  /** [[Analytics.m4]] + [[Analytics.m4Points]]: the distinct,
    * time-ordered corner points of k buckets over [lo, hi).
    */
  def m4Points(rows: IndexedSeq[Row], lo: Long, hi: Long, k: Int)
      : Vector[(Long, Double)] = {
    require(k >= 1, "m4 needs at least 1 bucket")
    // per bucket: (tFirst, vFirst, tMin, vMin, tMax, vMax, tLast, vLast)
    final case class B(var tFirst: Long, var vFirst: Double,
                       var tMin: Long, var vMin: Double,
                       var tMax: Long, var vMax: Double,
                       var tLast: Long, var vLast: Double)
    val buckets = mutable.LongMap.empty[B]
    rows.foreach { case (ts, v) =>
      if (v != null && ts >= lo && ts < hi) {
        val d = v.doubleValue
        val b = bucketOf(ts, lo, hi, k.toLong)
        buckets.get(b) match {
          case None => buckets(b) = B(ts, d, ts, d, ts, d, ts, d)
          case Some(s) =>
            if (ts < s.tFirst) { s.tFirst = ts; s.vFirst = d }
            if (ts > s.tLast) { s.tLast = ts; s.vLast = d }
            // min: smallest (value, ts) pair
            if (dlt(d, s.vMin) ||
                (java.lang.Double.compare(d, s.vMin) == 0 && ts < s.tMin)) {
              s.vMin = d; s.tMin = ts
            }
            // max: greatest value, earliest ts on ties
            if (dlt(s.vMax, d)) { s.vMax = d; s.tMax = ts }
            else if (java.lang.Double.compare(d, s.vMax) == 0 &&
                ts < s.tMax) s.tMax = ts
        }
      }
    }
    val seen = mutable.HashSet.empty[Long]
    val out = Vector.newBuilder[(Long, Double)]
    buckets.values.foreach { s =>
      Seq((s.tFirst, s.vFirst), (s.tMin, s.vMin), (s.tMax, s.vMax),
        (s.tLast, s.vLast)).foreach { p =>
        if (seen.add(p._1)) out += p
      }
    }
    out.result().sortBy(_._1)
  }

  // ---- LTTB ----------------------------------------------------------

  /** [[Analytics.lttb]]: the k visually dominant points over [lo, hi),
    * time-ordered. Anchor averages ride the engine's DECIMAL routes
    * (ts sums exact in BigInt; values decimal(38,12) HALF_UP), the
    * triangle area is the identical fixed-order double expression,
    * and the per-bucket pick minimizes the same (o1, o2) key.
    */
  def lttb(rows: IndexedSeq[Row], lo: Long, hi: Long, k: Int)
      : Vector[(Long, Double)] = {
    require(k >= 3, "lttb needs at least 3 buckets")
    val kL = k.toLong
    val pts = rows.collect {
      case (ts, v) if v != null && ts >= lo && ts < hi =>
        (bucketOf(ts, lo, hi, kL), ts, v.doubleValue)
    }
    if (pts.isEmpty) return Vector.empty
    // bucket summaries: avg_ts, avg_v (exact accumulation, double at
    // the division like the engine). Spark's double→decimal cast maps
    // non-finite to NULL (even in ANSI) and sum skips nulls while
    // count(1) still counts the row — so a partially-NaN bucket's
    // anchor biases the same way, and an ALL-non-finite bucket's
    // anchor value is SQL NULL (None here), not zero.
    final case class Sum(var n: Long, var ts: BigInt, var v: JBigDecimal,
                         var vAny: Boolean)
    val sums = mutable.LongMap.empty[Sum]
    pts.foreach { case (b, ts, v) =>
      val s = sums.getOrElseUpdate(b,
        Sum(0L, BigInt(0), JBigDecimal.ZERO, vAny = false))
      s.n += 1
      s.ts += ts
      if (!v.isNaN && !v.isInfinite) {
        // the engine's per-row value cast to DECIMAL(38,12) refuses
        // finite magnitudes past its 26 integral digits (ANSI
        // NUMERIC_VALUE_OUT_OF_RANGE) — refuse identically instead of
        // accumulating in unbounded BigDecimal (DirectParityFuzzSpec)
        if (math.abs(v) >= 1e26)
          throw new ArithmeticException(
            s"[NUMERIC_VALUE_OUT_OF_RANGE] $v cannot be represented " +
              "as Decimal(38,12)")
        s.v = s.v.add(JBigDecimal.valueOf(v).setScale(12,
          RoundingMode.HALF_UP))
        s.vAny = true
      }
    }
    val order = sums.keys.toArray.sorted
    val avg: Map[Long, (Double, Option[Double])] = order.map { b =>
      val s = sums(b)
      b -> (s.ts.doubleValue / s.n.toDouble,
        if (s.vAny) Some(s.v.doubleValue / s.n.toDouble) else None)
    }.toMap
    val prevOf = order.zipWithIndex.map { case (b, i) =>
      b -> (if (i > 0) Some(avg(order(i - 1))) else None)
    }.toMap
    val nextOf = order.zipWithIndex.map { case (b, i) =>
      b -> (if (i < order.length - 1) Some(avg(order(i + 1))) else None)
    }.toMap
    // per-bucket pick: min (o1, o2); o1 = mid ? -area : 0.0, o2 =
    // last-bucket ? -ts : ts — lexicographic. o1 = None is the
    // engine's NULL area (a null anchor value propagates), and SQL
    // nulls sort FIRST ascending, below every double including -Inf.
    final case class Pick(var o1: Option[Double], var o2: Long,
                          var ts: Long, var v: Double)
    def o1Lt(a: Option[Double], b: Option[Double]): Int = (a, b) match {
      case (None, None) => 0
      case (None, _) => -1
      case (_, None) => 1
      case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
    }
    val picks = mutable.LongMap.empty[Pick]
    pts.foreach { case (b, ts, v) =>
      val mid = b > 0 && b < kL - 1 &&
        prevOf(b).isDefined && nextOf(b).isDefined
      val o1: Option[Double] =
        if (!mid) Some(0.0)
        else {
          val (pTs, pV) = prevOf(b).get
          val (nTs, nV) = nextOf(b).get
          if (pV.isEmpty || nV.isEmpty) None // NULL anchor → NULL area
          else Some(-math.abs((pTs - nTs) * (v - pV.get) -
            (pTs - ts.toDouble) * (nV.get - pV.get)))
        }
      val o2 = if (b == kL - 1) -ts else ts
      picks.get(b) match {
        case None => picks(b) = Pick(o1, o2, ts, v)
        case Some(p) =>
          val c = o1Lt(o1, p.o1)
          if (c < 0 || (c == 0 && o2 < p.o2)) {
            p.o1 = o1; p.o2 = o2; p.ts = ts; p.v = v
          }
      }
    }
    picks.values.toVector.map(p => (p.ts, p.v)).sortBy(_._1)
  }

  // ---- stats ---------------------------------------------------------

  /** [[Analytics.valuePercentiles]] for one channel: (n, min, p50,
    * p90, p99, max) over the non-null, non-NaN values; exact linear
    * interpolation with Spark's own index formula; 6dp scaled round
    * at the edge. None when no qualifying sample.
    */
  def stats(rows: IndexedSeq[Row])
      : Option[(Long, Double, Double, Double, Double, Double)] = {
    val vs = rows.collect {
      case (_, v) if v != null && !v.isNaN => v.doubleValue
    }.toArray
    if (vs.isEmpty) return None
    java.util.Arrays.sort(vs)
    def pct(p: Double): Double = {
      // Spark Percentile.getPercentile: position = p * (n-1);
      // lower*(higher-pos) + higher*(pos-lower)
      val pos = p * (vs.length - 1)
      val lower = math.floor(pos).toInt
      val higher = math.ceil(pos).toInt
      if (lower == higher) vs(lower)
      else vs(lower) * (higher - pos) + vs(higher) * (pos - lower)
    }
    Some((vs.length.toLong, vs.head, sr6(pct(0.5)), sr6(pct(0.9)),
      sr6(pct(0.99)), vs.last))
  }

  // ---- spectrum ------------------------------------------------------

  /** [[Analytics.spectrum]] for one channel over [lo, hi): per
    * candidate period (period_s, n, power) in ascending period order.
    * Same 6dp integer quantization, exact integer projection sums,
    * identical fixed-order power expression. Empty input → Nil.
    */
  def spectrum(rows: IndexedSeq[Row], lo: Long, hi: Long,
               periods: Seq[Long]): Seq[(Long, Long, Double)] = {
    require(periods.nonEmpty && periods.forall(_ > 0),
      "periods must be positive")
    require(periods.map(_ / 1000000000L).distinct.size == periods.size,
      "periods must remain distinct after truncation to whole seconds " +
        "(period_s keys the spectrum output)")
    val base = rows.collect {
      case (ts, v) if v != null && !v.isNaN && ts >= lo && ts < hi =>
        // ansiToLong: refuse where the engine's round(v*1e6) long
        // cast refuses (non-finite / out-of-range)
        (ts, ansiToLong(
          if (v.doubleValue.isInfinite) v.doubleValue
          else JBigDecimal.valueOf(v.doubleValue * 1e6)
            .setScale(0, RoundingMode.HALF_UP).doubleValue))
    }
    if (base.isEmpty) return Nil
    val n = base.length.toLong
    var qSum = BigInt(0)
    base.foreach(qSum += _._2)
    val mq = roundHalfUp(qSum.doubleValue / n.toDouble).toLong
    val cos = Analytics.spectrumCosQ
    val sin = Analytics.spectrumSinQ
    val tbl = Analytics.SpectrumTableSize.toLong
    periods.map { period =>
      var sc = BigInt(0)
      var ss = BigInt(0)
      base.foreach { case (ts, q) =>
        val qd = q - mq
        if (math.abs(qd) > Analytics.MaxSpectrumQd)
          throw new IllegalArgumentException(
            "spectrum: |value - mean| exceeds the Long-safe bound of 9.2e6")
        val idx = (((ts - lo) % period) * tbl / period).toInt
        sc += qd * cos(idx)
        ss += qd * sin(idx)
      }
      val scD = sc.doubleValue
      val ssD = ss.doubleValue
      val nD = n.toDouble
      (period / 1000000000L, n, (scD * scD + ssD * ssD) / (nD * nD) / 1e24)
    }.sortBy(_._1)
  }

  // ---- CUSUM ---------------------------------------------------------

  /** [[Analytics.cusumShifts]] for one channel over [lo, hi): (n,
    * n_hi, n_lo, t_first_hi, t_first_lo, peak_hi, peak_lo); None when
    * no qualifying sample. Exact integer fold — the engine's DECIMAL
    * prefix sums are BigInt here.
    */
  def cusum(rows: IndexedSeq[Row], lo: Long, hi: Long,
            slack: Double, threshold: Double)
      : Option[(Long, Long, Long, Option[Long], Option[Long],
        Double, Double)] = {
    val slackQ = math.round(slack * 1e6)
    val hQ = math.round(threshold * 1e6)
    val base = rows.collect {
      case (ts, v) if v != null && !v.isNaN && ts >= lo && ts < hi =>
        // ansiToLong: refuse where the engine's round(v*1e6) long
        // cast refuses (non-finite / out-of-range)
        (ts, ansiToLong(
          if (v.doubleValue.isInfinite) v.doubleValue
          else JBigDecimal.valueOf(v.doubleValue * 1e6)
            .setScale(0, RoundingMode.HALF_UP).doubleValue))
    }
    if (base.isEmpty) return None
    val n = base.length.toLong
    var qSum = BigInt(0)
    base.foreach(qSum += _._2)
    val mq = roundHalfUp(qSum.doubleValue / n.toDouble).toLong
    var pHi = BigInt(0); var pLo = BigInt(0)
    var first = true
    var runMinPHi: BigInt = null; var runMaxPLo: BigInt = null
    var nHi = 0L; var nLo = 0L
    var tHi: Option[Long] = None; var tLo: Option[Long] = None
    var peakHi = BigInt(Long.MinValue); var peakLo = BigInt(Long.MinValue)
    base.foreach { case (ts, q) =>
      pHi += q - mq - slackQ
      pLo += q - mq + slackQ
      if (first) { runMinPHi = pHi; runMaxPLo = pLo; first = false }
      else {
        if (pHi < runMinPHi) runMinPHi = pHi
        if (pLo > runMaxPLo) runMaxPLo = pLo
      }
      val cusumHi = pHi - (if (runMinPHi < 0) runMinPHi else BigInt(0))
      val cusumLo = (if (runMaxPLo > 0) runMaxPLo else BigInt(0)) - pLo
      if (cusumHi > hQ) { nHi += 1; if (tHi.isEmpty) tHi = Some(ts) }
      if (cusumLo > hQ) { nLo += 1; if (tLo.isEmpty) tLo = Some(ts) }
      if (cusumHi > peakHi) peakHi = cusumHi
      if (cusumLo > peakLo) peakLo = cusumLo
    }
    Some((n, nHi, nLo, tHi, tLo,
      peakHi.doubleValue / 1e6, peakLo.doubleValue / 1e6))
  }

  // ---- derived channel -----------------------------------------------

  /** [[Analytics.derivedChannel]] for the HTTP edge: both channels'
    * rows (ts ≤ end, ts-ascending, nulls kept — a held marker must
    * mask, not leak the stale pre-marker value) sampled-and-held onto
    * the [start, end] grid every `step`, combined pointwise; grid
    * points where either hold is missing or null are dropped.
    */
  def derived(rowsA: IndexedSeq[Row], rowsB: IndexedSeq[Row],
              op: (Double, Double) => Double,
              start: Long, end: Long, step: Long): Vector[(Long, Double)] = {
    require(step > 0, "step must be positive")
    val out = Vector.newBuilder[(Long, Double)]
    var ia = 0; var ib = 0
    var heldA: java.lang.Double = null; var anyA = false
    var heldB: java.lang.Double = null; var anyB = false
    var t = start
    while (t <= end) {
      while (ia < rowsA.length && rowsA(ia)._1 <= t) {
        heldA = rowsA(ia)._2; anyA = true; ia += 1
      }
      while (ib < rowsB.length && rowsB(ib)._1 <= t) {
        heldB = rowsB(ib)._2; anyB = true; ib += 1
      }
      if (anyA && anyB && heldA != null && heldB != null)
        out += ((t, op(heldA.doubleValue, heldB.doubleValue)))
      t += step
    }
    out.result()
  }
}
