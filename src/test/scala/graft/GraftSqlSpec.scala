package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.ManifestStore
import graft.core.Samples

/** The Spark SQL DataSource V2 surface (`format("graft")` /
  * `CREATE TABLE … USING graft`): schema, values vs the library API,
  * filter pushdown reaching manifest file pruning, statistics, and the
  * session-catalog round trip.
  */
class GraftSqlSpec extends AnyFunSuite {

  private val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("graftsql").toString
    val raw = Samples.fromEvents(spark, dir)
    ManifestStore.commit(raw, p, levelSec = 0)
    ManifestStore.commit(
      graft.archive.Decimation.decimate(
          Samples.fromEventsWithMarkers(spark, dir), 3600L * Samples.NS)
        .select(col("channel"), col("win_start").as("ts"), col("mean"),
          col("std"), col("min_value"), col("max_value"),
          col("covered_fraction"), col("n_samples")),
      p, levelSec = 3600L)
    p
  }

  test("schema is the manifest schema plus level and bucket_date") {
    val df = spark.read.format("graft").load(store)
    val names = df.schema.fieldNames.toSeq
    assert(names.contains("channel") && names.contains("ts"))
    assert(names.takeRight(2) == Seq("level", "bucket_date"))
    assert(df.schema("level").dataType.typeName == "long")
    assert(df.schema("bucket_date").dataType.typeName == "date")
  }

  test("values equal the library API read, level by level") {
    val df = spark.read.format("graft").load(store)
    val sqlRaw = df.where(col("level") === 0L)
      .select("channel", "ts", "value", "sample_id")
      .orderBy("channel", "ts", "sample_id").collect()
    val lib = ManifestStore.read(spark, store, 0L)
      .select("channel", "ts", "value", "sample_id")
      .orderBy("channel", "ts", "sample_id").collect()
    assert(sqlRaw.toSeq == lib.toSeq)
    val sqlDec = df.where(col("level") === 3600L)
      .select("channel", "ts", "mean", "n_samples")
      .orderBy("channel", "ts").collect()
    val libDec = ManifestStore.read(spark, store, 3600L)
      .select("channel", "ts", "mean", "n_samples")
      .orderBy("channel", "ts").collect()
    assert(sqlDec.toSeq == libDec.toSeq)
    // unfiltered read = union of both levels
    assert(df.count() ==
      ManifestStore.read(spark, store, 0L).count() +
        ManifestStore.read(spark, store, 3600L).count())
  }

  test("ts/level/channel predicates appear as PushedFilters and prune files") {
    val lo = ManifestStore.read(spark, store, 0L)
      .agg(min("ts")).head.getLong(0)
    val df = spark.read.format("graft").load(store)
      .where(col("level") === 0L && col("ts") >= lo &&
        col("ts") <= lo + 86400L * Samples.NS && col("channel") === "click")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("EqualTo(level,0)"), plan)
    assert(plan.contains("GreaterThanOrEqual(ts,"), plan)
    assert(plan.contains("EqualTo(channel,click)"), plan)
    // the relation string carries the pruning outcome: a one-day clip
    // of a multi-day store must not read every file
    val m = ManifestStore.latestManifest(spark, store).get
    val shown = raw"GraftStore\(.*files=(\d+)/(\d+)\)".r
      .findFirstMatchIn(plan)
    assert(shown.nonEmpty, plan)
    val (pruned, total) = (shown.get.group(1).toInt, shown.get.group(2).toInt)
    assert(total == m.files.size)
    assert(pruned < total, s"expected pruning, got $pruned/$total")
    // and the values survive the pruning exactly
    val expect = ManifestStore.read(spark, store, 0L, Some(lo),
        Some(lo + 86400L * Samples.NS), Some("click"))
      .where(col("channel") === "click").count()
    assert(df.count() == expect)
  }

  test("scan statistics report pruned manifest bytes and rows") {
    // through the public connector interfaces (Spark's V1 bridge wraps
    // the scan in V1ScanWrapper, which hides SupportsReportStatistics
    // from the logical plan — runtime sizing is AQE's job; the scan's
    // own stats contract is pinned here)
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.connector.read.{SupportsPushDownFilters, SupportsReportStatistics}
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val props = new java.util.HashMap[String, String]()
    props.put("path", store)
    val opts = new CaseInsensitiveStringMap(props)
    val provider = new graft.sources.GraftDataSource
    def statsFor(filters: Array[org.apache.spark.sql.sources.Filter]) = {
      val t = provider.getTable(provider.inferSchema(opts),
        Array.empty, props)
      val sb = t.asInstanceOf[SupportsRead].newScanBuilder(opts)
      sb.asInstanceOf[SupportsPushDownFilters].pushFilters(filters)
      sb.build().asInstanceOf[SupportsReportStatistics].estimateStatistics()
    }
    val full = statsFor(Array.empty)
    val narrow = statsFor(Array(EqualTo("level", 3600L)))
    assert(full.sizeInBytes.getAsLong > narrow.sizeInBytes.getAsLong)
    assert(narrow.numRows.getAsLong ==
      ManifestStore.read(spark, store, 3600L).count())
    assert(full.numRows.getAsLong ==
      ManifestStore.read(spark, store, 0L).count() +
        ManifestStore.read(spark, store, 3600L).count())
  }

  test("session-catalog round trip: CREATE TABLE USING graft") {
    spark.sql("DROP TABLE IF EXISTS graft_rt")
    spark.sql(s"CREATE TABLE graft_rt USING graft OPTIONS (path '$store')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS c FROM graft_rt WHERE level = 0").head.getLong(0)
      assert(n == ManifestStore.read(spark, store, 0L).count())
      // schema stored in the catalog round-trips
      val cols = spark.table("graft_rt").schema.fieldNames.toSeq
      assert(cols.contains("channel") && cols.contains("level"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_rt")
  }

  test("a store committed AFTER the table exists is visible (no stale snapshot)") {
    val p = java.nio.file.Files.createTempDirectory("graftsql2").toString
    val raw = Samples.fromEvents(spark, dir).limit(100)
    ManifestStore.commit(raw, p, levelSec = 0)
    val before = spark.read.format("graft").load(p).count()
    ManifestStore.commit(raw.withColumn("sample_id", col("sample_id") + 1000000L),
      p, levelSec = 0)
    val after = spark.read.format("graft").load(p).count()
    assert(before == 100 && after == 200)
  }

  test("empty projection (COUNT(*)) works") {
    spark.read.format("graft").load(store).createOrReplaceTempView("g_cnt")
    val c = spark.sql("SELECT count(*) c FROM g_cnt WHERE level = 3600")
      .head.getLong(0)
    assert(c == ManifestStore.read(spark, store, 3600L).count())
  }
}
