package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.ManifestStore

/** The manifest delta-log protocol: commits write O(change) deltas
  * with a full checkpoint every [[ManifestStore.CheckpointInterval]]
  * versions; reads fold checkpoint + deltas; vacuum keeps the latest
  * chain assemblable. The MLOG knee (whole-log rewrite per streaming
  * micro-batch) is the thing this protocol removes — ManifestLogBench
  * measures the flatness, this spec pins the semantics.
  */
class DeltaLogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val schema = StructType.fromDDL(
    "channel STRING, ts BIGINT, value DOUBLE")

  private def entry(i: Int) = ManifestStore.FileEntry(
    s"data/f$i.parquet", 0L, "2024-01-01",
    i * 1000L, i * 1000L + 999L, 100L, 1000L, Some(s"c$i"), Some(s"c$i"))

  test("deltas fold to the full state, checkpoints land on the " +
      "interval, time travel works mid-chain") {
    val dir = Files.createTempDirectory("dlog").toString
    val k = ManifestStore.CheckpointInterval.toInt
    val n = 2 * k + 6
    (0 until n).foreach(i =>
      ManifestStore.commitEntries(spark, dir, Seq(entry(i)), schema))
    // the fold sees every entry
    val m = ManifestStore.latestManifest(spark, dir).get
    assert(m.version == n && m.files.size == n)
    assert(m.files.map(_.path).toSet == (0 until n).map(i =>
      s"data/f$i.parquet").toSet)
    // checkpoint cadence: versions k and 2k are FULL records (they
    // serialize the complete file list), neighbors are deltas — size
    // tells them apart once the list is much bigger than one entry
    def raw(v: Long): String = Files.readString(
      java.nio.file.Paths.get(f"$dir/_manifests/v$v%012d.json"))
    assert(!raw(k).contains("\"delta\""))
    assert(!raw(2L * k).contains("\"delta\""))
    assert(raw(k + 1).contains("\"delta\" : true") ||
      raw(k + 1).contains("\"delta\":true"))
    // time travel to a mid-chain version (manifest-level: the entries
    // here are synthetic, so no data read — arch_time_travel gates the
    // data path)
    val mid = k + 3
    assert(ManifestStore.readManifest(spark, dir, mid).files.size == mid)
  }

  // entry REPLACEMENT through the delta (compaction / retention
  // swapping files mid-chain) is exercised end-to-end by the
  // arch_compacted_scan / arch_retention / arch_time_travel oracle
  // gates, which run the real compact/retention paths over this log.

  test("vacuum keeps the latest chain assemblable and drops the rest") {
    val dir = Files.createTempDirectory("dlog3").toString
    val k = ManifestStore.CheckpointInterval.toInt
    val n = k + 10
    (0 until n).foreach(i =>
      ManifestStore.commitEntries(spark, dir, Seq(entry(i)), schema))
    ManifestStore.vacuum(spark, dir, graceMs = 0L)
    // the chain (checkpoint at k + deltas to n) survives; earlier
    // versions are gone
    ManifestStore.clearAssembledMemo()
    val m = ManifestStore.latestManifest(spark, dir).get
    assert(m.version == n && m.files.size == n)
    val left = new java.io.File(s"$dir/_manifests").listFiles()
      .map(_.getName).filter(_.endsWith(".json")).sorted
    assert(left.length <= n - k + 1,
      s"vacuum left ${left.mkString(",")}")
    intercept[Exception] {
      ManifestStore.readManifest(spark, dir, 3L)
    }
  }
}
