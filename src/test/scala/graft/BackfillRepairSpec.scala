package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{Cascade, ChannelConfig, ConfigCommands,
  ConfiguredArchive, ManifestBackend, ManifestStore}

/** Backfill repair ([[Cascade.repairRange]] /
  * [[ConfiguredArchive.repairBackfill]]): history landed BEHIND the
  * watermark frontier reaches every decimated level, fine to coarse,
  * and the repaired store equals a from-scratch build — including the
  * EPICS-migration shape the bridge exists for. The oracle gate
  * (`arch_backfill_repair`) hash-pins the window math; this spec
  * drives the multi-level chain and the end-to-end migration.
  */
class BackfillRepairSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS

  private def raw(ids: Range, ch: String = "pv:a"): DataFrame = {
    import spark.implicits._
    ids.map(i => (ch, T0 + i * 60L * NS, math.sin(i * 0.1) * 5.0 + i * 0.01,
        "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
  }

  private def levelRows(store: String, level: Long): Vector[String] =
    ManifestStore.read(spark, store, level)
      .select(col("channel"), col("ts"), round(col("mean"), 6).as("mean"),
        col("min_value"), col("max_value"), col("n_samples"))
      .orderBy("channel", "ts")
      .collect().map(_.toString).toVector

  test("repaired multi-level cascade equals a from-scratch build") {
    val full = raw(0 until 5760) // 4 days of 1-min samples
    val gapLo = 1440; val gapHi = 2880 // day 2 missing, then backfilled
    val dirA = Files.createTempDirectory("bfA").toString
    val dirB = Files.createTempDirectory("bfB").toString
    val levels = Seq(300L, 3600L)
    // A: gapped build + backfill + repair (fine to coarse)
    Cascade.materialize(spark, dirA,
      full.where(col("sample_id") < gapLo || col("sample_id") >= gapHi),
      levels, ManifestBackend)
    ManifestBackend.write(
      full.where(col("sample_id") >= gapLo && col("sample_id") < gapHi),
      dirA, 0L)
    val lo = T0 + gapLo * 60L * NS
    val hi = T0 + (gapHi - 1) * 60L * NS
    levels.sorted.foreach(l => Cascade.repairRange(spark, dirA, l, lo, hi))
    // B: the complete history, built once
    Cascade.materialize(spark, dirB, full, levels, ManifestBackend)
    for (l <- levels)
      assert(levelRows(dirA, l) == levelRows(dirB, l),
        s"level $l diverges from the from-scratch build")
  }

  test("typed repaired cascade equals a from-scratch typed build " +
      "(the migrated-store shape)") {
    val export = Files.createTempDirectory("bfexp").toString
    graft.sources.EpicsArchiverJson.writeFixture(export, pvs = 4, n = 300)
    val full = graft.sources.EpicsArchiverJson.read(spark, export)
    val gapLo = T0 + 100L * 60L * NS
    val gapHi = T0 + 200L * 60L * NS
    val dirA = Files.createTempDirectory("bfTA").toString
    val dirB = Files.createTempDirectory("bfTB").toString
    Cascade.materializeTyped(spark, dirA,
      full.where(col("ts") < gapLo || col("ts") >= gapHi),
      Seq(3600L), ManifestBackend)
    ManifestBackend.write(
      full.where(col("ts") >= gapLo && col("ts") < gapHi), dirA, 0L)
    Cascade.repairRangeTyped(spark, dirA, 3600L, gapLo, gapHi - 1)
    Cascade.materializeTyped(spark, dirB, full, Seq(3600L), ManifestBackend)
    def rows(p: String): Vector[String] =
      ManifestStore.read(spark, p, 3600L)
        .orderBy("channel", "ts", "vtype")
        .collect().map(_.toString).toVector
    val (a, b) = (rows(dirA), rows(dirB))
    assert(a.nonEmpty && a == b,
      s"typed repair diverges: ${a.size} vs ${b.size} rows")
  }

  test("EPICS migration end to end: export -> ingest behind the " +
      "frontier -> repairBackfill -> decimated serving sees it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bfepics").toString
    val cfg = s"$dir/config"; val store = s"$dir/store"
    ConfigCommands.addChannel(spark, cfg, ChannelConfig("pv:mig", "id-mig",
      "ca", enabled = true, Map(), Map(3600L -> 0L)))
    // live archive: only the RECENT day exists
    val recent = (2880 until 4320).map(i => ("pv:mig", T0 + i * 60L * NS,
        i * 0.5, "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.materialize(spark, cfg, store, recent)
    // the migrated history (two older days) lands behind the frontier
    val migrated = (0 until 2880).map(i => ("pv:mig", T0 + i * 60L * NS,
        i * 0.5, "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.ingestRaw(spark, cfg, store, migrated)
    // before repair: the 1h level has no pre-migration windows
    val before = ManifestStore.read(spark, store, 3600L)
      .where(col("ts") < T0 + 2880L * 60L * NS).count()
    assert(before == 0L, s"decimated history exists before repair: $before")
    ConfiguredArchive.repairBackfill(spark, cfg, store,
      T0, T0 + 2879L * 60L * NS)
    val after = ManifestStore.read(spark, store, 3600L)
      .where(col("ts") < T0 + 2880L * 60L * NS).count()
    assert(after == 48L, s"expected 48 repaired 1h windows, got $after")
    // and the count-driven serve now plans over the repaired level
    val served = ConfiguredArchive.serveJson(spark, cfg, store, "pv:mig",
      T0, T0 + 4320L * 60L * NS, Some(72L), ManifestBackend).toVector
    assert(served.size >= 70,
      s"count-driven serve missing repaired history: ${served.size}")
  }
}
