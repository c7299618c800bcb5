package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ArchiveReader, ChannelConfig, ChannelDisabledException,
  ConfigCommands, ConfiguredArchive, DirectServe, ManifestBackend,
  NoSuchChannelException, NoStoredDataException}

/** Byte-parity gate for the driver-side direct-read serve path
  * ([[DirectServe]]): every in-envelope request must produce EXACTLY
  * the bytes of the DataFrame path ([[ConfiguredArchive.serveJsonSpark]])
  * — across boundary modes, decimated level selection, null values,
  * non-finite doubles, duplicate timestamps from separate commits, and
  * the before-first-sample edge; out-of-envelope requests (retention
  * fallback across levels) must decline so the engine path answers.
  */
class DirectServeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS
  private val Widened = Some(ArchiveReader.AtOrWidened)

  private def row(ch: String, i: Int, v: Option[Double]) =
    (ch, T0 + i * 60L * NS, v, "", 0, 0, i.toLong)

  /** Raw-only store (no decimation level touches the non-finite
    * values): a weird-values channel, a late-data channel, and a
    * cross-commit duplicate timestamp.
    */
  private lazy val fx: (String, String) = {
    import spark.implicits._
    val cfgDir = Files.createTempDirectory("dscfg").toString
    val store = Files.createTempDirectory("dsstore").toString
    Seq(
      ChannelConfig("pv:w", "id-w", "ca", enabled = true, Map(), Map()),
      ChannelConfig("pv:late", "id-late", "ca", enabled = true, Map(), Map()),
      ChannelConfig("pv:off", "id-off", "ca", enabled = false, Map(), Map()),
      ChannelConfig("pv:empty", "id-empty", "ca", enabled = true, Map(), Map())
    ).foreach(c => ConfigCommands.addChannel(spark, cfgDir, c))
    val weird = (1 to 600).map { i =>
      val v: Option[Double] = i match {
        case 5 => Some(Double.NaN)
        case 6 => Some(Double.PositiveInfinity)
        case 7 => Some(Double.NegativeInfinity)
        case 8 => Some(-0.0)
        case 9 => Some(1e-7)
        case 10 => Some(1.5e300)
        case 11 => None
        case _ => Some(i * 1.25)
      }
      row("pv:w", i, v)
    }
    // pv:late starts five days after T0 — the before-first-sample edge
    val late = (1 to 60).map(i => row("pv:late", 7200 + i, Some(i.toDouble)))
    val df = (weird ++ late)
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.materialize(spark, cfgDir, store, df)
    // a second commit re-sends one existing timestamp (same value) —
    // dropDuplicates territory on the engine path
    ConfiguredArchive.ingestRaw(spark, cfgDir, store,
      Seq(row("pv:w", 20, Some(20 * 1.25)))
        .toDF("channel", "ts", "value", "str_value", "severity", "status",
          "sample_id"))
    (cfgDir, store)
  }

  /** Decimated store: one clean channel with a 1 h level. */
  private lazy val fxC: (String, String) = {
    import spark.implicits._
    val cfgDir = Files.createTempDirectory("dscfgc").toString
    val store = Files.createTempDirectory("dsstorec").toString
    ConfigCommands.addChannel(spark, cfgDir, ChannelConfig("pv:c", "id-c",
      "ca", enabled = true, Map(), Map(3600L -> 0L)))
    val clean = (1 to 3000).map(i => row("pv:c", i, Some(i % 97 * 0.5)))
    ConfiguredArchive.materialize(spark, cfgDir, store,
      clean.toDF("channel", "ts", "value", "str_value", "severity",
        "status", "sample_id"))
    (cfgDir, store)
  }

  private def bothIn(fix: (String, String))(name: String, lo: Long, hi: Long,
                     count: Option[Long],
                     loMode: Option[ArchiveReader.LimitMode] = Widened,
                     hiMode: Option[ArchiveReader.LimitMode] = Widened)
      : (Option[Vector[String]], Vector[String]) = {
    val (cfgDir, store) = fix
    val fast = DirectServe.tryServe(spark, cfgDir, store, name, lo, hi,
      count, ManifestBackend, loMode, hiMode, refuseDisabled = false)
      .map(_.toVector)
    val slow = ConfiguredArchive.serveJsonSpark(spark, cfgDir, store, name,
      lo, hi, count, ManifestBackend, loMode, hiMode).toVector
    (fast, slow)
  }

  private def both(name: String, lo: Long, hi: Long, count: Option[Long],
                   loMode: Option[ArchiveReader.LimitMode] = Widened,
                   hiMode: Option[ArchiveReader.LimitMode] = Widened)
      : (Option[Vector[String]], Vector[String]) =
    bothIn(fx)(name, lo, hi, count, loMode, hiMode)

  test("raw widened serve is byte-identical, including non-finite and " +
      "null values") {
    val (fast, slow) = both("pv:w", T0 + 3 * 60L * NS, T0 + 30 * 60L * NS,
      None)
    assert(fast.isDefined, "fast path must engage on a scalar manifest store")
    assert(fast.get == slow)
    assert(slow.nonEmpty)
    val all = slow.mkString("\n")
    assert(all.contains("\"NaN\"") && all.contains("\"Infinity\"") &&
      all.contains("\"-Infinity\"") && all.contains("[null]") &&
      all.contains("1.0E-7") && all.contains("1.5E300") &&
      all.contains("-0.0"))
  }

  test("exact bounds (count-driven default) are byte-identical") {
    val (fast, slow) = both("pv:w", T0 + 5 * 60L * NS, T0 + 90 * 60L * NS,
      Some(1000000L), loMode = None, hiMode = None)
    assert(fast.isDefined)
    assert(fast.get == slow)
  }

  test("count-driven serve picks the decimated level and stays " +
      "byte-identical") {
    // 3000 minutes at count 50 → perfect period 3600 s → the 1h level
    val (fast, slow) = bothIn(fxC)("pv:c", T0, T0 + 3000 * 60L * NS,
      Some(50L))
    assert(fast.isDefined)
    assert(fast.get == slow)
    assert(slow.size > 10)
  }

  test("request entirely before the first sample serves only the " +
      "at-or-after boundary sample on both paths") {
    val (fast, slow) = both("pv:late", T0, T0 + 10 * 60L * NS, None)
    assert(fast.isDefined)
    assert(fast.get == slow)
    assert(slow.size == 1)
    assert(slow.head.contains(s"\"time\":${T0 + 7201 * 60L * NS}"))
  }

  test("request entirely after the last sample serves only the " +
      "at-or-before boundary sample on both paths") {
    val farLo = T0 + 20000 * 60L * NS
    val (fast, slow) = both("pv:w", farLo, farLo + 60L * NS, None)
    assert(fast.isDefined)
    assert(fast.get == slow)
    assert(slow.size == 1)
    assert(slow.head.contains(s"\"time\":${T0 + 600 * 60L * NS}"))
  }

  test("cross-commit duplicate timestamps collapse identically") {
    val (fast, slow) = both("pv:w", T0 + 19 * 60L * NS, T0 + 21 * 60L * NS,
      None)
    assert(fast.isDefined)
    assert(fast.get == slow)
    assert(slow.count(_.contains(s"\"time\":${T0 + 20 * 60L * NS}")) == 1)
  }

  test("error signals match the engine path") {
    val (cfgDir, store) = fx
    intercept[NoSuchChannelException] {
      DirectServe.tryServe(spark, cfgDir, store, "pv:nope", T0, T0 + NS,
        None, ManifestBackend, Widened, Widened, refuseDisabled = false)
    }
    intercept[ChannelDisabledException] {
      DirectServe.tryServe(spark, cfgDir, store, "pv:off", T0, T0 + NS,
        None, ManifestBackend, Widened, Widened, refuseDisabled = true)
    }
    intercept[NoStoredDataException] {
      DirectServe.tryServe(spark, cfgDir, store, "pv:empty", T0, T0 + NS,
        None, ManifestBackend, Widened, Widened, refuseDisabled = false)
    }
  }

  test("retention fallback across levels declines the fast path and " +
      "serveJson still answers through the engine") {
    import spark.implicits._
    val cfgDir = Files.createTempDirectory("dscfg2").toString
    val store = Files.createTempDirectory("dsstore2").toString
    // raw keeps 2 days, the 1 h level keeps everything → a request
    // spanning old history plans two segments. Retention applies AFTER
    // the cascade so the 1 h level retains what raw dropped.
    ConfigCommands.addChannel(spark, cfgDir, ChannelConfig("pv:r", "id-r",
      "ca", enabled = true, Map(), Map(3600L -> 0L)))
    val df = (0 until 5 * 1440).map(i =>
        ("pv:r", T0 + i * 60L * NS, Some(i * 0.5), "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.materialize(spark, cfgDir, store, df)
    ManifestBackend.applyRetention(spark, store, 0L, 2L * 86400L * NS)
    val fast = DirectServe.tryServe(spark, cfgDir, store, "pv:r",
      T0, T0 + 5L * 86400L * NS, None, ManifestBackend, Widened, Widened,
      refuseDisabled = false)
    assert(fast.isEmpty, "multi-segment plans must fall back")
    val served = ConfiguredArchive.serveJson(spark, cfgDir, store, "pv:r",
      T0, T0 + 5L * 86400L * NS, None, ManifestBackend, Widened, Widened)
      .toVector
    val slow = ConfiguredArchive.serveJsonSpark(spark, cfgDir, store, "pv:r",
      T0, T0 + 5L * 86400L * NS, None, ManifestBackend, Widened, Widened)
      .toVector
    assert(served == slow)
    assert(served.size > 1440)
  }
}
