package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ArchiveStore, Cascade, Decimation}
import graft.core.Samples

/** A8 — the multi-hop cascade must agree with direct decimation on
  * every complete window (merge law through the store round-trip).
  */
class CascadeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("cascade raw→30s→300s→3600s equals direct decimation on complete windows") {
    val raw = Samples.fromEvents(spark, "/root/testdata/sf0.001")
    val store = Files.createTempDirectory("cascade").toString
    Cascade.materialize(spark, store, raw, Seq(30L, 300L, 3600L))

    // every level materialized
    for (l <- Seq(0L, 30L, 300L, 3600L))
      assert(ArchiveStore.read(spark, store, l).count() > 0, s"level $l empty")

    val cascaded = ArchiveStore.read(spark, store, 3600)
      .select("channel", "ts", "mean").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val direct = Decimation.decimate(
        Samples.monotonicDedup(raw), 3600L * Samples.NS)
      .select("channel", "win_start", "mean").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap

    val common = cascaded.keySet.intersect(direct.keySet)
    assert(common.size > direct.size * 8 / 10, "too few common windows")
    var checked = 0
    for (k <- common) {
      val (c, d) = (cascaded(k), direct(k))
      if (!c.isNaN && !d.isNaN) {
        assert(math.abs(c - d) < 1e-6, s"mean at $k: $c vs $d")
        checked += 1
      }
    }
    assert(checked > 100)
  }
}
