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

  test("unknown channel fails fast") {
    intercept[IllegalArgumentException] {
      ArchiveServer.querySamples(spark, store, "nope", T0, T30, None)
    }
  }
}
