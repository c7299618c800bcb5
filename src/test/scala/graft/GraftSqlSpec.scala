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

  // ---- aggregate pushdown from manifest stats ----

  test("COUNT/MIN(ts)/MAX(ts) group-by-level answers from manifest stats, no parquet scan") {
    spark.read.format("graft").load(store).createOrReplaceTempView("g_agg")
    val q = spark.sql(
      """SELECT level, count(*) AS n, min(ts) AS mn, max(ts) AS mx
        |FROM g_agg GROUP BY level ORDER BY level""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftStoreStats"), plan)
    assert(plan.contains("PushedAggregates: [COUNT(*), MIN(ts), MAX(ts)]"), plan)
    assert(plan.contains("PushedGroupByExpressions: [level]"), plan)
    assert(!plan.contains("GraftStore("), plan) // no data scan at all
    val rows = q.collect()
    val lib0 = ManifestStore.read(spark, store, 0L)
      .agg(count(lit(1)), min("ts"), max("ts")).head
    assert(rows(0).getLong(0) == 0L && rows(0).getLong(1) == lib0.getLong(0)
      && rows(0).getLong(2) == lib0.getLong(1)
      && rows(0).getLong(3) == lib0.getLong(2))
    val lib1 = ManifestStore.read(spark, store, 3600L)
      .agg(count(lit(1)), min("ts"), max("ts")).head
    assert(rows(1).getLong(0) == 3600L && rows(1).getLong(1) == lib1.getLong(0)
      && rows(1).getLong(2) == lib1.getLong(1)
      && rows(1).getLong(3) == lib1.getLong(2))
  }

  test("a level-equality filter keeps the stats pushdown; a ts filter defeats it") {
    spark.read.format("graft").load(store).createOrReplaceTempView("g_agg2")
    val pushed = spark.sql(
      "SELECT count(*) AS n FROM g_agg2 WHERE level = 3600")
    assert(pushed.queryExecution.executedPlan.toString
      .contains("GraftStoreStats"))
    assert(pushed.head.getLong(0) ==
      ManifestStore.read(spark, store, 3600L).count())
    // a ts range is NOT exactly answerable by file stats — must fall
    // back to the real scan and still be right
    val lo = ManifestStore.read(spark, store, 0L)
      .agg(min("ts")).head.getLong(0)
    val defeated = spark.sql(
      s"SELECT count(*) AS n FROM g_agg2 WHERE level = 0 AND ts > $lo")
    val dplan = defeated.queryExecution.executedPlan.toString
    assert(!dplan.contains("GraftStoreStats"), dplan)
    assert(defeated.head.getLong(0) ==
      ManifestStore.read(spark, store, 0L).where(col("ts") > lo).count())
  }

  // ---- write path: INSERT INTO … USING graft ----

  private def freshWriteTable(name: String): (String, String) = {
    val p = java.nio.file.Files.createTempDirectory("graftsqlw").toString
    val r = Samples.fromEvents(spark, dir).limit(500)
    r.createOrReplaceTempView(s"${name}_src")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name (${r.schema.toDDL}, level BIGINT) " +
        s"USING graft OPTIONS (path '$p')")
    (p, name)
  }

  test("INSERT INTO commits through the manifest protocol; SQL and library reads agree") {
    val (p, t) = freshWriteTable("gw_ins")
    try {
      spark.sql(
        s"INSERT INTO $t SELECT *, CAST(0 AS BIGINT) FROM ${t}_src")
      val v1 = ManifestStore.latestVersion(spark, p).get
      val viaSql = spark.sql(
          s"SELECT channel, ts, value, sample_id FROM $t WHERE level = 0")
        .orderBy("channel", "ts", "sample_id").collect()
      val viaLib = ManifestStore.read(spark, p, 0L)
        .select("channel", "ts", "value", "sample_id")
        .orderBy("channel", "ts", "sample_id").collect()
      assert(viaSql.length == 500)
      assert(viaSql.toSeq == viaLib.toSeq)
      // second INSERT appends one new version, union visible
      spark.sql(
        s"""INSERT INTO $t SELECT channel, ts, value, str_value, severity,
           |status, sample_id + 1000000, ts_raw, CAST(0 AS BIGINT)
           |FROM ${t}_src""".stripMargin)
      assert(ManifestStore.latestVersion(spark, p).get == v1 + 1)
      assert(spark.table(t).count() == 1000)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("one INSERT can carry multiple levels; each lands in its level") {
    val (p, t) = freshWriteTable("gw_ml")
    try {
      spark.sql(
        s"""INSERT INTO $t
           |SELECT *, CAST(0 AS BIGINT) FROM ${t}_src
           |UNION ALL
           |SELECT channel, ts, value, str_value, severity, status,
           |       sample_id + 5000000, ts_raw, CAST(3600 AS BIGINT)
           |FROM ${t}_src WHERE sample_id % 5 = 0""".stripMargin)
      // ONE version commit for the whole statement
      assert(ManifestStore.latestVersion(spark, p).get == 1L)
      assert(ManifestStore.read(spark, p, 0L).count() == 500)
      val dec = ManifestStore.read(spark, p, 3600L)
      assert(dec.count() == spark.table(s"${t}_src")
        .where(col("sample_id") % 5 === 0).count())
      assert(dec.where(col("sample_id") < 5000000L).count() == 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a failing INSERT publishes no version (atomicity); orphans are vacuum-able") {
    val (p, t) = freshWriteTable("gw_fail")
    try {
      spark.sql(s"INSERT INTO $t SELECT *, CAST(0 AS BIGINT) FROM ${t}_src")
      val v = ManifestStore.latestVersion(spark, p).get
      val before = spark.table(t).count()
      // NULL level refuses mid-stage: the staging job throws, no commit
      intercept[Exception] {
        spark.sql(
          s"""INSERT INTO $t SELECT channel, ts, value, str_value, severity,
             |status, sample_id + 9000000,
             |ts_raw, CAST(NULL AS BIGINT) FROM ${t}_src""".stripMargin)
      }
      assert(ManifestStore.latestVersion(spark, p).get == v)
      assert(spark.table(t).count() == before)
      // the failed stage left only unreferenced files; vacuum at zero
      // grace removes them and the committed read is untouched
      ManifestStore.vacuum(spark, p, graceMs = 0L)
      assert(spark.table(t).count() == before)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("INSERT OVERWRITE publishes a new-files-only version; old files stay for in-grace readers") {
    val (p, t) = freshWriteTable("gw_ow")
    try {
      spark.sql(s"INSERT INTO $t SELECT *, CAST(0 AS BIGINT) FROM ${t}_src")
      val v1 = ManifestStore.latestVersion(spark, p).get
      val oldFiles = ManifestStore.latestManifest(spark, p).get.files
      spark.sql(
        s"""INSERT OVERWRITE $t SELECT channel, ts, value, str_value,
           |severity, status, sample_id + 7000000, ts_raw,
           |CAST(0 AS BIGINT) FROM ${t}_src WHERE sample_id % 2 = 0""".stripMargin)
      val m2 = ManifestStore.latestManifest(spark, p).get
      assert(m2.version == v1 + 1)
      // file list is ONLY the overwrite's files
      assert(m2.files.map(_.path).toSet.intersect(
        oldFiles.map(_.path).toSet).isEmpty)
      assert(spark.table(t).where(col("sample_id") < 7000000L).count() == 0)
      // time travel to v1 still reads the pre-overwrite bytes (old
      // files on disk until vacuum grace expires)
      assert(ManifestStore.readVersion(spark, p, v1, 0L).count() == 500)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("SQL-written files keep sort-tight clustering: disjoint channel ranges per (level, day)") {
    val (p, t) = freshWriteTable("gw_cl")
    try {
      // enough rows to force multiple range partitions per day
      spark.sql(
        s"""INSERT INTO $t
           |SELECT channel, ts, value, str_value, severity, status,
           |       sample_id * 10 + n, ts_raw, CAST(0 AS BIGINT)
           |FROM ${t}_src LATERAL VIEW explode(sequence(0, 9)) AS n""".stripMargin)
      val m = ManifestStore.latestManifest(spark, p).get
      assert(m.files.forall(e => e.chMin.nonEmpty && e.chMax.nonEmpty))
      m.files.groupBy(e => (e.levelSec, e.bucketDate)).foreach {
        case (_, es) =>
          val sorted = es.sortBy(_.chMin.get)
          sorted.sliding(2).foreach {
            case Seq(a, b) =>
              // range partitioning on (level, day, channel) keeps a
              // channel in exactly one partition: per-(level,day) file
              // key ranges must not interleave
              assert(a.chMax.get <= b.chMin.get,
                s"overlapping ranges: $a vs $b")
            case _ =>
          }
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
