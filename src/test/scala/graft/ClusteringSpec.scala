package graft

import scala.jdk.CollectionConverters._

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ChannelConfig, ConfigCommands, ConfiguredArchive,
  ManifestStore}

/** Regression gate for the store's physical clustering: files written
  * through the FULL ingest pipeline (dedup → id-key → manifest commit)
  * must keep the (channel, ts) sort the read path's pruning relies on.
  *
  * This was silently broken for every partitionBy write: the V1 file
  * writer requires ordering by its partition columns, and any
  * `sortWithinPartitions` that doesn't PREFIX-match that requirement
  * is replaced by the writer's own partition-only sort — which
  * interleaves each task's pre-sorted input into per-run shreds. The
  * symptom is page/chMin-chMax key ranges spanning nearly the whole
  * fleet, turning both the manifest's file pruning and parquet page
  * skipping into no-ops at any scale. The fix (sort leads with
  * bucket_date, never with the constant level) lives in
  * ManifestStore.commitTxn; this spec pins it.
  */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("manifest store files keep tight per-page channel ranges " +
      "through the full ingest pipeline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val NS = graft.core.Samples.NS
    val t0 = 1704067200L * NS
    val channels = 100
    val dir = Files.createTempDirectory("clspec").toString
    val cfg = s"$dir/config"; val store = s"$dir/store"
    (0 until channels).foreach(i =>
      ConfigCommands.addChannel(spark, cfg, ChannelConfig(s"ch$i", s"id$i",
        "ca", enabled = true, Map(), Map())))
    // 100 channels x 1000 samples, one day -> several 20k-row pages
    val rows = channels.toLong * 1000L
    val raw = spark.range(rows).select(
      concat(lit("ch"), col("id") % channels).as("channel"),
      (lit(t0) + expr(s"id div $channels") * (60L * NS)).as("ts"),
      (col("id") % 97).cast("double").as("value"),
      lit("").as("str_value"), lit(0).as("severity"), lit(0).as("status"),
      col("id").as("sample_id"))
    ConfiguredArchive.materialize(spark, cfg, store, raw)

    val m = ManifestStore.latestManifest(spark, store).get
    val ids = (0 until channels).map(i => s"id$i").sorted
    var pagesSeen = 0
    val spans = m.files.filter(_.levelSec == 0L).flatMap { e =>
      // manifest-level clustering-key range must be a real subset when
      // the store has more than one file per level
      val f = s"$store/${e.path}"
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f), spark.sparkContext.hadoopConfiguration))
      val out = r.getFooter.getBlocks.asScala.flatMap { b =>
        val ch = b.getColumns.asScala
          .find(_.getPath.toDotString == "channel").get
        val ci = r.readColumnIndex(ch)
        if (ci == null) Nil
        else {
          val mins = ci.getMinValues.asScala.map(bb =>
            Binary.fromConstantByteBuffer(bb).toStringUsingUTF8)
          val maxs = ci.getMaxValues.asScala.map(bb =>
            Binary.fromConstantByteBuffer(bb).toStringUsingUTF8)
          mins.zip(maxs).map { case (mn, mx) =>
            ids.count(c => c >= mn && c <= mx)
          }
        }
      }
      r.close()
      pagesSeen += out.size
      out
    }
    assert(pagesSeen >= 3, s"fixture too small to exercise paging: $pagesSeen")
    // tight clustering: a 20k-row page holds ~20 of the 100 channels;
    // the shredded layout this spec guards against spanned nearly all
    // of them on most pages
    val maxSpan = spans.max
    assert(maxSpan <= 40,
      s"channel clustering shredded: a page spans $maxSpan of $channels " +
        "channels — writer ordering regression (see ManifestStore.commitTxn)")
  }
}
