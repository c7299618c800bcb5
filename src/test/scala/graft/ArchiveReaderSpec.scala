package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.ArchiveReader
import graft.archive.ArchiveReader.{AtOrWidened, Exact}

/** Limit-mode boundary semantics — the 0/1/2-sample matrix from the
  * reference's ArchiveAccessService contract (reimplemented; see
  * ArchiveAccessService.java:55-135 for the spec being matched).
  */
class ArchiveReaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  // channel "c": samples at ts 10 and 20; channel "d": sample at 15
  private def df: DataFrame = Seq(
    ("c", 10L, 1.0, "a", 0, 0, 0L),
    ("c", 20L, 2.0, "b", 0, 0, 1L),
    ("d", 15L, 3.0, "e", 0, 0, 2L)
  ).toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")

  private def ts(r: DataFrame, ch: String): Seq[Long] =
    r.where(s"channel = '$ch'").select("ts").collect().map(_.getLong(0)).sorted.toSeq

  test("widened bounds include the enclosing samples") {
    val r = ArchiveReader.getSamples(df, 12L, AtOrWidened, 18L, AtOrWidened)
    assert(ts(r, "c") == Seq(10L, 20L)) // nothing inside → both boundaries
    assert(ts(r, "d") == Seq(15L))      // inside the range
  }

  test("exact bounds return only enclosed samples") {
    val r = ArchiveReader.getSamples(df, 12L, Exact, 18L, Exact)
    assert(ts(r, "c") == Seq())
    assert(ts(r, "d") == Seq(15L))
  }

  test("lo == hi on a sample returns exactly that sample once") {
    val r = ArchiveReader.getSamples(df, 20L, AtOrWidened, 20L, AtOrWidened)
    assert(ts(r, "c") == Seq(20L))
  }

  test("lo == hi between samples returns the two neighbours") {
    val r = ArchiveReader.getSamples(df, 15L, AtOrWidened, 15L, AtOrWidened)
    assert(ts(r, "c") == Seq(10L, 20L))
    assert(ts(r, "d") == Seq(15L))
  }

  test("lo == hi before all samples, widened: only the after-boundary") {
    val r = ArchiveReader.getSamples(df, 5L, AtOrWidened, 5L, AtOrWidened)
    assert(ts(r, "c") == Seq(10L))
  }

  test("sample exactly at an exact bound is included") {
    val r = ArchiveReader.getSamples(df, 10L, Exact, 20L, Exact)
    assert(ts(r, "c") == Seq(10L, 20L))
  }

  test("as-of lookup holds the last sample at-or-before each probe") {
    val grid = Seq(("c", 5L), ("c", 10L), ("c", 15L), ("c", 25L))
      .toDF("channel", "g")
    val r = ArchiveReader.asOfLookup(df, grid).collect()
      .map(x => x.getAs[Long]("g") ->
        (if (x.isNullAt(x.fieldIndex("held_value"))) None
         else Some(x.getAs[Double]("held_value")))).toMap
    assert(r == Map(5L -> None, 10L -> Some(1.0), 15L -> Some(1.0), 25L -> Some(2.0)))
  }

  test("as-of lookup holds a marker sample, not the stale pre-marker value") {
    // sample 5.0 at ts 10, then a MARKER (disconnected, value null) at 20
    val marked = Seq(
      ("c", 10L, Some(5.0), "", 3, 0, 0L),
      ("c", 20L, None, "", 3, 0, 1L))
      .toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")
    val grid = Seq(("c", 15L), ("c", 30L)).toDF("channel", "g")
    val r = ArchiveReader.asOfLookup(marked, grid).collect()
      .map(x => x.getAs[Long]("g") ->
        ((if (x.isNullAt(x.fieldIndex("held_value"))) None
          else Some(x.getAs[Double]("held_value"))),
          x.getAs[Long]("held_ts"))).toMap
    assert(r(15L) == ((Some(5.0), 10L)))
    // after the marker: the held state IS the marker (disconnected),
    // with the marker's own timestamp
    assert(r(30L) == ((None, 20L)))
  }

  test("reverse top-k returns the newest k per channel") {
    val r = ArchiveReader.reverseTopK(df, 1)
    assert(ts(r, "c") == Seq(20L))
    assert(ts(r, "d") == Seq(15L))
  }

  test("retention keeps only the trailing window per channel") {
    val r = ArchiveReader.retain(df, 5L)
    assert(ts(r, "c") == Seq(20L)) // 10 < 20-5
    assert(ts(r, "d") == Seq(15L))
  }

  test("gapReport flags only gaps STRICTLY over the threshold, per channel") {
    val NS = 1000000000L
    val s = Seq(
      ("c", 0L * NS, 1.0, "", 0, 0, 0L),
      ("c", 10L * NS, 1.0, "", 0, 0, 1L),  // gap exactly 10 s — NOT flagged
      ("c", 25L * NS, 1.0, "", 0, 0, 2L),  // gap 15 s — flagged
      ("d", 0L * NS, 1.0, "", 0, 0, 3L),
      ("d", 11L * NS, 1.0, "", 0, 0, 4L))  // gap 11 s — flagged
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    val r = ArchiveReader.gapReport(s, 10L).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(r == Set(
      ("c", 10L * NS, 25L * NS, 15L * NS),
      ("d", 0L * NS, 11L * NS, 11L * NS)))
  }

  test("rateOfChange: dv/dt per second, first sample of a channel omitted") {
    val NS = 1000000000L
    val s = Seq(
      ("c", 0L * NS, 10.0, "", 0, 0, 0L),
      ("c", 2L * NS, 16.0, "", 0, 0, 1L),   // +6 over 2 s → 3.0/s
      ("c", 10L * NS, 12.0, "", 0, 0, 2L),  // −4 over 8 s → −0.5/s
      ("d", 5L * NS, 1.0, "", 0, 0, 3L))    // single sample: no rate
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    val r = ArchiveReader.rateOfChange(s).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(3)).toMap
    assert(r.keySet == Set(("c", 2L * NS), ("c", 10L * NS)))
    assert(r(("c", 2L * NS)) == 3.0)
    assert(r(("c", 10L * NS)) == -0.5)
  }

  test("resampleLinear: exact hit, midpoint lerp, no extrapolation") {
    val s = Seq(
      ("c", 100L, 10.0, "", 0, 0, 0L),
      ("c", 200L, 30.0, "", 0, 0, 1L))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    val grid = Seq(("c", 50L), ("c", 100L), ("c", 150L), ("c", 175L),
      ("c", 200L), ("c", 250L)).toDF("channel", "g")
    val r = ArchiveReader.resampleLinear(s, grid).collect()
      .map(x => x.getLong(1) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(r(50L).isEmpty)            // before the span: no extrapolation
    assert(r(100L).contains(10.0))    // exact sample hit
    assert(r(150L).contains(20.0))    // midpoint
    assert(r(175L).contains(25.0))    // 3/4 point
    assert(r(200L).contains(30.0))    // exact hit at span end
    assert(r(250L).isEmpty)           // after the span
  }
}
