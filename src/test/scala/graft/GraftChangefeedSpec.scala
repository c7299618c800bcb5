package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.ManifestStore
import graft.core.Samples

/** The manifest-log streaming changefeed
  * (`spark.readStream.format("graft")`): per-version batching,
  * compaction skip, delete refusal, checkpoint restart, and
  * vacuum-while-streaming under the reference grace.
  */
class GraftChangefeedSpec extends AnyFunSuite {

  private val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("graftcf").toString

  private lazy val src: DataFrame =
    Samples.fromEvents(spark, dir).limit(300).cache()

  private def slice(lo: Int, hi: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // deterministic thirds by rank over sample_id
    val ranked = src.withColumn("rk",
      row_number().over(Window.orderBy("sample_id", "channel")))
    ranked.where(col("rk") > lo && col("rk") <= hi).drop("rk")
  }

  private def startDrain(p: String, sink: String,
                         extra: Map[String, String] = Map.empty,
                         ckpt: Option[String] = None): StreamingQuery = {
    var r = spark.readStream.format("graft")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    var w = r.load(p).writeStream.format("memory").queryName(sink)
    ckpt.foreach(c => w = w.option("checkpointLocation", c))
    w.start()
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("sample_id").collect().map(_.getLong(0)).toSet

  test("each commit becomes exactly one micro-batch of its new rows") {
    val p = freshStore()
    ManifestStore.commit(slice(0, 100), p, levelSec = 0)
    val q = startDrain(p, "cf_basic")
    try {
      q.processAllAvailable()
      assert(ids(spark.table("cf_basic")) == ids(slice(0, 100)))
      val batches0 = q.recentProgress.count(_.numInputRows > 0)

      ManifestStore.commit(slice(100, 200), p, levelSec = 0)
      q.processAllAvailable()
      assert(ids(spark.table("cf_basic")) == ids(slice(0, 200)))

      ManifestStore.commit(slice(200, 300), p, levelSec = 0)
      q.processAllAvailable()
      assert(ids(spark.table("cf_basic")) == ids(slice(0, 300)))
      // three data commits, three non-empty batches — no replays
      assert(q.recentProgress.count(_.numInputRows > 0) == batches0 + 2)
      assert(spark.table("cf_basic").count() == 300)
      // level column rides along (all raw here)
      assert(spark.table("cf_basic").where(col("level") =!= 0L).count() == 0)
    } finally { q.stop(); spark.catalog.dropTempView("cf_basic") }
  }

  test("a compaction version is skipped: no re-served rows") {
    val p = freshStore()
    // two fragmented commits of one day-set, then compact
    ManifestStore.commit(slice(0, 100), p, levelSec = 0)
    ManifestStore.commit(slice(100, 200), p, levelSec = 0)
    val q = startDrain(p, "cf_compact")
    try {
      q.processAllAvailable()
      assert(spark.table("cf_compact").count() == 200)
      ManifestStore.compactAll(spark, p, levelSec = 0,
        smallBytes = 1024L * 1024 * 1024)
      assert(ManifestStore.latestVersion(spark, p).get == 3L)
      q.processAllAvailable()
      // the rewrite added files but NO new logical rows
      assert(spark.table("cf_compact").count() == 200)
      // and a post-compaction append still streams
      ManifestStore.commit(slice(200, 300), p, levelSec = 0)
      q.processAllAvailable()
      assert(spark.table("cf_compact").count() == 300)
    } finally { q.stop(); spark.catalog.dropTempView("cf_compact") }
  }

  test("a data-changing delete refuses by default; ignoreDeletes streams past it") {
    val p = freshStore()
    ManifestStore.commit(slice(0, 200), p, levelSec = 0)
    // retention horizon that drops the oldest day(s)
    val dropped = ManifestStore.applyRetention(spark, p, levelSec = 0,
      retentionNs = 36L * 3600 * Samples.NS)
    assume(dropped.nonEmpty, "fixture must span >1 day for retention")
    val q = startDrain(p, "cf_del")
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally { q.stop(); spark.catalog.dropTempView("cf_del") }
    val q2 = startDrain(p, "cf_del2",
      extra = Map("ignoreDeletes" -> "true"))
    try {
      q2.processAllAvailable()
      // full history's ADDS stream (the deletes are not retracted)
      assert(spark.table("cf_del2").count() == 200)
    } finally { q2.stop(); spark.catalog.dropTempView("cf_del2") }
  }

  test("checkpoint restart resumes from the committed version") {
    val p = freshStore()
    val ckpt = java.nio.file.Files.createTempDirectory("graftcfck").toString
    val out = java.nio.file.Files.createTempDirectory("graftcfout").toString
    // memory sink can't recover a checkpoint — use the file sink, which
    // is also the exactly-once pairing (source offsets + sink commit log)
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(p)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    ManifestStore.commit(slice(0, 100), p, levelSec = 0)
    run()
    assert(spark.read.parquet(out).count() == 100)
    // two commits while the stream is down
    ManifestStore.commit(slice(100, 200), p, levelSec = 0)
    ManifestStore.commit(slice(200, 300), p, levelSec = 0)
    run()
    // resumed from the checkpointed version: every row exactly once
    assert(ids(spark.read.parquet(out)) == ids(slice(0, 300)))
    assert(spark.read.parquet(out).count() == 300)
  }

  test("startingVersion=latest streams only post-start commits") {
    val p = freshStore()
    ManifestStore.commit(slice(0, 200), p, levelSec = 0)
    val q = startDrain(p, "cf_latest",
      extra = Map("startingVersion" -> "latest"))
    try {
      q.processAllAvailable()
      assert(spark.table("cf_latest").count() == 0)
      ManifestStore.commit(slice(200, 300), p, levelSec = 0)
      q.processAllAvailable()
      assert(ids(spark.table("cf_latest")) == ids(slice(200, 300)))
    } finally { q.stop(); spark.catalog.dropTempView("cf_latest") }
  }

  test("vacuum under the reference grace does not break an in-flight stream") {
    val p = freshStore()
    ManifestStore.commit(slice(0, 100), p, levelSec = 0)
    ManifestStore.commit(slice(100, 200), p, levelSec = 0)
    val q = startDrain(p, "cf_vac")
    try {
      q.processAllAvailable()
      // maintenance races the stream: compact (rewrite) then vacuum
      // with a full grace — pre-compaction files of in-grace versions
      // must survive, so the stream's next batches read live bytes
      ManifestStore.compactAll(spark, p, levelSec = 0,
        smallBytes = 1024L * 1024 * 1024)
      ManifestStore.vacuum(spark, p, graceMs = 24L * 3600 * 1000)
      ManifestStore.commit(slice(200, 300), p, levelSec = 0)
      q.processAllAvailable()
      assert(spark.table("cf_vac").count() == 300)
      assert(q.exception.isEmpty)
    } finally { q.stop(); spark.catalog.dropTempView("cf_vac") }
  }

  test("a multi-level commit streams rows tagged with their level") {
    val p = freshStore()
    val withLevel = slice(0, 100).withColumn("level", lit(0L))
      .unionByName(slice(100, 150).withColumn("level", lit(3600L)))
    ManifestStore.commitMultiLevel(withLevel, p)
    val q = startDrain(p, "cf_ml")
    try {
      q.processAllAvailable()
      val t = spark.table("cf_ml")
      assert(t.where(col("level") === 0L).count() == 100)
      assert(t.where(col("level") === 3600L).count() == 50)
    } finally { q.stop(); spark.catalog.dropTempView("cf_ml") }
  }
}
