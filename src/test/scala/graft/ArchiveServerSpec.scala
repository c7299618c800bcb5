package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ArchiveServer, Cascade}
import graft.core.Samples

/** End-to-end serving path (SURVEY §3.1): store → level discovery →
  * resolution selection → retention fallback → widened read → JSON v1.
  */
class ArchiveServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = Samples.NS
  private lazy val store: String = {
    val dir = Files.createTempDirectory("serve").toString
    val raw = Samples.fromEvents(spark, "/root/testdata/sf0.001")
    Cascade.materialize(spark, dir, raw, Seq(3600L, 21600L))
    dir
  }

  // data spans 2024-01-01 .. 2024-01-30
  private val T0 = 1704067200L * NS
  private val T30 = T0 + 30L * 86400L * NS

  test("raw query (no count) returns raw-level samples with boundaries") {
    val lo = T0 + 10L * 86400L * NS
    val hi = lo + 86400L * NS
    val df = ArchiveServer.querySamples(spark, store, "click", lo, hi, None)
    val levels = df.select("level").distinct().collect().map(_.getLong(0)).toSet
    assert(levels == Set(0L))
    val ts = df.select("ts").collect().map(_.getLong(0))
    assert(ts.nonEmpty && ts.sorted.sameElements(ts))
    // widened: first sample at-or-before lo
    assert(ts.head <= lo)
  }

  test("counted query picks a decimated level") {
    // ~120 points over 29 days → perfect ≈ 20800 s → the 21600 s level
    val df = ArchiveServer.querySamples(spark, store, "click", T0, T30, Some(120))
    val levels = df.select("level").distinct().collect().map(_.getLong(0)).toSet
    assert(levels == Set(21600L))
    assert(df.count() > 50)
  }

  test("counted query at finer resolution uses the 1h level, with a coarse prefix for uncovered history") {
    val df = ArchiveServer.querySamples(spark, store, "click", T0, T30, Some(700))
    val byLevel = df.groupBy("level").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dominated by the 1h level; the hours before its first window are
    // served from the 6h level (retention-fallback prepend, U1)
    assert(byLevel.keySet.contains(3600L))
    assert(byLevel.getOrElse(21600L, 0L) <= 2)
    assert(byLevel(3600L) > 500)
  }

  test("serveJson streams well-formed JSON v1 objects") {
    val lo = T0 + 10L * 86400L * NS
    val it = ArchiveServer.serveJson(spark, store, "click", lo,
      lo + 86400L * NS, None)
    val first = it.next()
    assert(first.startsWith("{\"time\":"))
    assert(first.contains("\"quality\":\"Original\""))
    assert(it.hasNext)
  }

  test("serving from a manifest-backed store produces identical JSON") {
    import graft.archive.ManifestBackend
    val mdir = Files.createTempDirectory("serve_m").toString
    val raw = Samples.fromEvents(spark, "/root/testdata/sf0.001")
    Cascade.materialize(spark, mdir, raw, Seq(3600L, 21600L),
      ManifestBackend)
    val lo = T0 + 10L * 86400L * NS
    val hi = lo + 86400L * NS
    val viaManifest = ArchiveServer.serveJson(spark, mdir, "click", lo, hi,
      None, backend = ManifestBackend).toSeq
    val viaArchive = ArchiveServer.serveJson(spark, store, "click", lo, hi,
      None).toSeq
    assert(viaManifest == viaArchive)
    // the counted (decimated-level) path too
    val dm = ArchiveServer.querySamples(spark, mdir, "click", T0, T30,
      Some(120), backend = ManifestBackend)
    assert(dm.select("level").distinct().collect()
      .map(_.getLong(0)).toSet == Set(21600L))
  }

  test("unknown channel fails fast") {
    intercept[IllegalArgumentException] {
      ArchiveServer.querySamples(spark, store, "nope", T0, T30, None)
    }
  }

  test("boundary walk-back finds a sample days behind a sparse gap") {
    // channel with multi-day history and a 9-day silence before the
    // query window: the boundary must come from the partition 9 days
    // back, found by the geometric probe, not by scanning all history
    val dir = Files.createTempDirectory("walkback").toString
    import spark.implicits._
    val day = 86400L * NS
    val rows = Seq(
      ("sparse", T0 + 1 * day + 500L * NS, 1.0, 1L),
      ("sparse", T0 + 3 * day + 100L * NS, 2.0, 2L),   // the boundary
      ("sparse", T0 + 12 * day + 10L * NS, 3.0, 3L),
      ("sparse", T0 + 12 * day + 20L * NS, 4.0, 4L))
      .toDF("channel", "ts", "value", "sample_id")
    graft.archive.ArchiveStore.write(rows, dir, 0L)

    val lo = T0 + 12 * day
    val hi = T0 + 13 * day
    val got = ArchiveServer.querySamples(spark, dir, "sparse", lo, hi, None)
      .select("ts", "value").collect().sortBy(_.getLong(0))
    assert(got.map(_.getDouble(1)).toSeq == Seq(2.0, 3.0, 4.0))

    // the probe itself: first (1-day) probe at `lo` misses, the
    // widened probes find ts = T0+3d; the probe's plan stays clipped
    // to its window — partition filters on bucket_date bound the scan
    val probe = ArchiveServer.boundaryProbe(spark, dir, 0L, "sparse",
      lo, forward = false).get
    assert(probe.collect().head.getAs[Double]("value") == 2.0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("bucket_date"))
  }

  test("typed store serves the full JSON v1 union with boundary widening") {
    val dir = Files.createTempDirectory("typedserve").toString
    val typed = graft.core.TypedSamples.fromEvents(spark, "/root/testdata/sf0.001")
    graft.archive.ArchiveStore.write(typed, dir, 0L)
    val lo = T0 + 10L * 86400L * NS
    val out = ArchiveServer.serveJsonTyped(spark, dir, "click", lo,
      lo + 86400L * NS).toSeq
    assert(out.nonEmpty)
    assert(out.forall(_.startsWith("{\"time\":")))
    assert(out.forall(_.contains("\"quality\":\"Original\"")))
    // the union's families actually appear on the wire
    // top-level type = last "type" field (metaData.type precedes it)
    val types = out.flatMap(j =>
      "\"type\":\"([A-Za-z]+)\"".r.findAllMatchIn(j).map(_.group(1))
        .toSeq.lastOption).toSet
    assert(types.intersect(Set("double", "long", "enum", "string",
      "minMaxDouble")).size >= 3, s"families seen: $types")
    // boundary widening: first object at-or-before lo
    val firstTs = "\"time\":(\\d+)".r.findFirstMatchIn(out.head).get.group(1).toLong
    assert(firstTs <= lo)
  }

  test("typed decimated level serves Interpolated minMaxDouble samples") {
    val dir = Files.createTempDirectory("typedcascserve").toString
    val typed = graft.core.TypedSamples.fromEvents(spark, "/root/testdata/sf0.001")
    graft.archive.Cascade.materializeTyped(spark, dir, typed, Seq(3600L))
    val lo = T0 + 10L * 86400L * NS
    val out = ArchiveServer.serveJsonTyped(spark, dir, "click", lo,
      lo + 2L * 86400L * NS, levelSec = 3600L).toSeq
    assert(out.nonEmpty)
    assert(out.forall(_.contains("\"quality\":\"Interpolated\"")))
    assert(out.exists(_.contains("\"type\":\"minMaxDouble\"")))
    assert(out.exists(_.contains("\"minimum\":")))
  }

  test("boundary probe returns None when no history exists behind t") {
    val dir = Files.createTempDirectory("emptyprobe").toString
    import spark.implicits._
    val rows = Seq(("c", T0 + 86400L * NS, 1.0, 1L))
      .toDF("channel", "ts", "value", "sample_id")
    graft.archive.ArchiveStore.write(rows, dir, 0L)
    assert(ArchiveServer.boundaryProbe(spark, dir, 0L, "c",
      T0, forward = false).isEmpty)
    assert(ArchiveServer.boundaryProbe(spark, dir, 0L, "c",
      T0, forward = true).nonEmpty)
  }
}
