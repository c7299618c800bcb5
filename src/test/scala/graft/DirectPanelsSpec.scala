package graft.archive

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bit-for-bit parity of the driver-side panel folds ([[DirectPanels]])
  * against their engine twins (the queryX DataFrame paths the HTTP
  * handlers previously always ran) — over the shapes that break naive
  * replicas: NaN values, null-valued samples, duplicate timestamps
  * from separate commits, value ties inside a bucket, empty buckets,
  * a held marker masking a derived grid, and division by zero.
  */
class DirectPanelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS

  private lazy val fx: (String, String) = {
    import spark.implicits._
    val cfgDir = Files.createTempDirectory("dpcfg").toString
    val store = Files.createTempDirectory("dpstore").toString
    Seq(
      ChannelConfig("pv:m", "idm", "ca", enabled = true, Map(), Map()),
      ChannelConfig("pv:b", "idb", "ca", enabled = true, Map(), Map())
    ).foreach(c => ConfigCommands.addChannel(spark, cfgDir, c))
    def row(ch: String, i: Int, v: Option[Double]) =
      (ch, T0 + i * 60L * NS, v, "", 0, 0, i.toLong)
    val m = (0 until 600).filterNot(i => i >= 200 && i < 250).map { i =>
      val v: Option[Double] = i match {
        case 5 => Some(Double.NaN)
        case 6 => None // held marker shape
        // an ALL-NaN run wide enough to own whole buckets at every
        // tested k — the engine's decimal sum of such a bucket is
        // NULL, its LTTB anchor is NULL, and neighboring buckets'
        // areas go NULL (nulls sort first): the fast path must bias
        // identically, not treat the dead bucket's anchor as zero
        case _ if i >= 300 && i < 360 => Some(Double.NaN)
        case _ =>
          val base = math.sin(i * 0.21) * 10.0 + (if (i >= 400) 15.0 else 0.0)
          // value ties inside a bucket every ~97 samples
          Some(if (i % 97 == 0) 42.0 else base)
      }
      row("pv:m", i, v)
    }
    val b = (0 until 300 by 7).map { i =>
      val v: Option[Double] =
        if (i == 140) None // marker masks the hold
        else if (i == 70) Some(0.0) // division-by-zero shape
        else Some(i * 0.3 - 20.0)
      row("pv:b", i, v)
    }
    ConfiguredArchive.materialize(spark, cfgDir, store,
      (m ++ b).toDF("channel", "ts", "value", "str_value", "severity",
        "status", "sample_id"))
    // duplicate-timestamp rows via a second commit
    ConfiguredArchive.ingestRaw(spark, cfgDir, store,
      Seq(row("pv:m", 20, Some(math.sin(20 * 0.21) * 10.0)))
        .toDF("channel", "ts", "value", "str_value", "severity",
          "status", "sample_id"))
    (cfgDir, store)
  }

  private def rowsOf(name: String, lo: Option[Long], hi: Long) = {
    val (cfg, store) = fx
    val r = DirectServe.tryRawRows(spark, cfg, store, name, lo, hi,
      ManifestBackend, refuseDisabled = false)
    assert(r.isDefined, "fast row fetch must engage on the fixture store")
    r.get
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("m4 corner points match the engine bit for bit") {
    val (cfg, store) = fx
    val lo = T0; val hi = T0 + 600L * 60L * NS
    for (k <- Seq(1, 7, 37)) {
      val eng = Analytics.m4Points(ConfiguredArchive.queryM4(spark, cfg,
          store, "pv:m", lo, hi, k))
        .orderBy("ts").collect()
        .map(r => (r.getLong(r.fieldIndex("ts")),
          bits(r.getDouble(r.fieldIndex("value"))))).toVector
      val fast = DirectPanels.m4Points(rowsOf("pv:m", Some(lo), hi),
        lo, hi, k).map(p => (p._1, bits(p._2)))
      assert(fast == eng, s"m4 k=$k diverged")
    }
  }

  test("lttb picks match the engine bit for bit") {
    val (cfg, store) = fx
    val lo = T0; val hi = T0 + 600L * 60L * NS
    for (k <- Seq(3, 12, 50)) {
      val eng = ConfiguredArchive.queryLttb(spark, cfg, store, "pv:m",
          lo, hi, k)
        .orderBy("ts").collect()
        .map(r => (r.getLong(r.fieldIndex("ts")),
          bits(r.getDouble(r.fieldIndex("value"))))).toVector
      val fast = DirectPanels.lttb(rowsOf("pv:m", Some(lo), hi),
        lo, hi, k).map(p => (p._1, bits(p._2)))
      assert(fast == eng, s"lttb k=$k diverged")
    }
  }

  test("stats matches the engine bit for bit") {
    val (cfg, store) = fx
    val lo = T0; val hi = T0 + 600L * 60L * NS
    val eng = ConfiguredArchive.queryStats(spark, cfg, store, "pv:m",
        lo, hi)
      .select("n_samples", "v_min", "p50", "p90", "p99", "v_max")
      .collect().head
    val fast = DirectPanels.stats(rowsOf("pv:m", Some(lo), hi)).get
    assert(fast._1 == eng.getLong(0))
    assert(Seq(fast._2, fast._3, fast._4, fast._5, fast._6).map(bits) ==
      (1 to 5).map(i => bits(eng.getDouble(i))))
  }

  test("spectrum matches the engine bit for bit") {
    val (cfg, store) = fx
    val lo = T0; val hi = T0 + 600L * 60L * NS - 1
    val periods = Seq(600L * NS, 1800L * NS, 7200L * NS)
    val eng = ConfiguredArchive.querySpectrum(spark, cfg, store, "pv:m",
        lo, hi, periods)
      .select("period_s", "n", "power").orderBy("period_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), bits(r.getDouble(2)))).toVector
    val fast = DirectPanels.spectrum(rowsOf("pv:m", Some(lo), hi),
      lo, hi + 1, periods).map(t => (t._1, t._2, bits(t._3))).toVector
    assert(fast == eng)
  }

  test("cusum matches the engine bit for bit") {
    val (cfg, store) = fx
    val lo = T0; val hi = T0 + 600L * 60L * NS - 1
    val eng = ConfiguredArchive.queryCusum(spark, cfg, store, "pv:m",
        lo, hi, 0.5, 3.0)
      .select("n_samples", "n_hi", "n_lo", "t_first_hi", "t_first_lo",
        "peak_hi", "peak_lo").collect().head
    val fast = DirectPanels.cusum(rowsOf("pv:m", Some(lo), hi),
      lo, hi + 1, 0.5, 3.0).get
    assert(fast._1 == eng.getLong(0) && fast._2 == eng.getLong(1) &&
      fast._3 == eng.getLong(2))
    assert(fast._4 == (if (eng.isNullAt(3)) None else Some(eng.getLong(3))))
    assert(fast._5 == (if (eng.isNullAt(4)) None else Some(eng.getLong(4))))
    assert(bits(fast._6) == bits(eng.getDouble(5)) &&
      bits(fast._7) == bits(eng.getDouble(6)))
    // the shifted tail must actually trip the detector, or this test
    // proves nothing
    assert(fast._2 > 0)
  }

  test("derived grid matches the engine bit for bit, markers mask, " +
      "division by zero flows through") {
    val (cfg, store) = fx
    val start = T0 + 10L * 60L * NS
    val end = T0 + 300L * 60L * NS
    val step = 90L * NS
    for (op <- Seq("sub", "mul")) {
      val eng = ConfiguredArchive.queryDerived(spark, cfg, store, "pv:m",
          "pv:b", op, start, end, step)
        .orderBy("ts").collect()
        .map(r => (r.getLong(r.fieldIndex("ts")),
          bits(r.getDouble(r.fieldIndex("value"))))).toVector
      val fast = DirectPanels.derived(
        rowsOf("pv:m", None, end), rowsOf("pv:b", None, end),
        ConfiguredArchive.DerivedOpsD(op), start, end, step)
        .map(p => (p._1, bits(p._2)))
      assert(fast == eng, s"derived op=$op diverged")
    }
    // a zero divisor: ANSI Spark throws even for doubles, and the
    // fast path must refuse identically rather than serve Infinity
    intercept[Exception] {
      ConfiguredArchive.queryDerived(spark, cfg, store, "pv:m", "pv:b",
        "div", start, end, step).collect()
    }
    intercept[ArithmeticException] {
      DirectPanels.derived(rowsOf("pv:m", None, end),
        rowsOf("pv:b", None, end), ConfiguredArchive.DerivedOpsD("div"),
        start, end, step)
    }
  }
}
