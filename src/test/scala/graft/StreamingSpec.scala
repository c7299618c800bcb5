package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.Decimation
import graft.streaming.{StreamingCusum, StreamingDecimation}
import graft.streaming.StreamingDecimation.{AggOut, InSample}

/** The streaming decimator must produce byte-identical aggregates to
  * the batch operator on the same input — the reference guarantees the
  * same (its catch-up batch path and live path share the decimator;
  * SURVEY.md §3.3).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val S = 1000000000L
  private val P10 = 10 * S

  private def withSeq(samples: Seq[InSample]): Seq[InSample] =
    samples.zipWithIndex.map { case (s, i) => s.copy(seq = i.toLong) }

  private def runStream(batches: Seq[Seq[InSample]], periodNs: Long): Seq[AggOut] = {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[InSample]
    val q = StreamingDecimation.decimateStream(mem.toDS(), periodNs)
      .writeStream.format("memory").queryName("dec_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("dec_out").as[AggOut].collect().toSeq
    } finally q.stop()
  }

  private def runBatch(samples: Seq[InSample], periodNs: Long): Seq[AggOut] = {
    import spark.implicits._
    val df = samples.zipWithIndex.map { case (s, i) =>
      (s.channel, s.ts, s.value, "", 0, 0, i.toLong)
    }.toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")
    Decimation.decimate(df, periodNs).as[AggOut].collect().toSeq
  }

  private def key(a: AggOut) = (a.channel, a.win_start)

  private def assertSame(stream: Seq[AggOut], batch: Seq[AggOut]): Unit = {
    assert(stream.map(key).sorted == batch.map(key).sorted)
    val bm = batch.map(a => key(a) -> a).toMap
    stream.foreach { s =>
      val b = bm(key(s))
      def eq(x: Option[Double], y: Option[Double], what: String): Unit =
        (x, y) match {
          case (Some(a), Some(c)) =>
            assert(math.abs(a - c) < 1e-9, s"$what at ${key(s)}: $a vs $c")
          case (a, c) => assert(a == c, s"$what at ${key(s)}: $a vs $c")
        }
      eq(s.mean, b.mean, "mean"); eq(s.std, b.std, "std")
      eq(s.min_value, b.min_value, "min"); eq(s.max_value, b.max_value, "max")
      assert(math.abs(s.covered_fraction - b.covered_fraction) < 1e-9)
      assert(s.n_samples == b.n_samples, s"n at ${key(s)}")
    }
  }

  test("streaming decimation equals batch decimation, across micro-batches") {
    val samples = Seq(
      InSample("c", 5 * S, Some(1.0), 0),
      InSample("c", 12 * S, Some(3.0), 0),
      InSample("c", 25 * S, Some(5.0), 0),
      InSample("d", 3 * S, Some(10.0), 0),
      InSample("c", 41 * S, Some(2.0), 0),
      InSample("d", 44 * S, Some(20.0), 0))
    // split mid-window and mid-gap to exercise state carry-over
    val all = withSeq(samples)
    val batches = Seq(all.take(2), all.slice(2, 4), all.drop(4))
    assertSame(runStream(batches, P10), runBatch(samples, P10))
  }

  test("streaming handles gaps, markers, and out-of-order drops like batch") {
    val samples = Seq(
      InSample("c", 2 * S, Some(4.0), 0),
      InSample("c", 1 * S, Some(99.0), 0), // out of order: dropped (F6)
      InSample("c", 8 * S, None, 0),       // marker: breaks the hold
      InSample("c", 37 * S, Some(6.0), 0), // long gap over empty windows
      InSample("c", 55 * S, Some(8.0), 0))
    val all = withSeq(samples)
    val batches = Seq(all.take(3), all.drop(3))
    assertSame(runStream(batches, P10), runBatch(samples, P10))
  }

  test("streaming raw append lands in the store layout and reads back") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val mem = MemoryStream[InSample]
    val base = 1704067200L * S // 2024-01-01
    val q = StreamingDecimation.writeRawStream(
      mem.toDS().toDF().select(
        $"channel", $"ts", $"value".cast("double").as("value"), $"seq".as("sample_id")),
      dir, ckpt)
    try {
      mem.addData(Seq(
        InSample("c", base + S, Some(1.0), 0),
        InSample("c", base + 90000L * S, Some(2.0), 1), // next day
        InSample("d", base + 2 * S, Some(3.0), 2)))
      q.processAllAvailable()
    } finally q.stop()
    val back = graft.archive.ArchiveStore.read(spark, dir, 0)
    assert(back.count() == 3)
    assert(back.select("bucket_date").distinct().count() == 2) // two days
  }

  test("streaming ingest into the manifest store: one atomic commit per micro-batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_mstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_m").toString
    val mem = MemoryStream[InSample]
    val base = 1704067200L * S // 2024-01-01
    val q = StreamingDecimation.writeRawStreamManifest(
      mem.toDS().toDF().select(
        $"channel", $"ts", $"value".cast("double").as("value"), $"seq".as("sample_id")),
      dir, ckpt)
    try {
      mem.addData(Seq(
        InSample("c", base + S, Some(1.0), 0),
        InSample("d", base + 2 * S, Some(2.0), 1)))
      q.processAllAvailable()
      mem.addData(Seq(InSample("c", base + 3 * S, Some(3.0), 2)))
      q.processAllAvailable()
    } finally q.stop()
    val m = graft.archive.ManifestStore.latestManifest(spark, dir).get
    assert(m.txns == Map(s"stream:$ckpt" -> 1L)) // two batches: 0 and 1
    val back = graft.archive.ManifestStore.read(spark, dir, 0)
    assert(back.count() == 3)
    assert(back.select("value").collect().map(_.getDouble(0)).sorted.toSeq
      == Seq(1.0, 2.0, 3.0))
  }

  test("streaming decimation commits coarse windows into a manifest level") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_mlevel").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_ml").toString
    val mem = MemoryStream[InSample]
    val base = 1704067200L * S
    // decimated 10 s windows, committed at level 10 — win_start becomes
    // the level's canonical ts
    val dec = StreamingDecimation.decimateStream(mem.toDS(), P10)
      .toDF().withColumnRenamed("win_start", "ts")
    val q = StreamingDecimation.writeRawStreamManifest(dec, dir, ckpt,
      levelSec = 10L)
    try {
      mem.addData(Seq(
        InSample("c", base + 1 * S, Some(2.0), 0),
        InSample("c", base + 11 * S, Some(4.0), 1),
        InSample("c", base + 25 * S, Some(6.0), 2)))
      q.processAllAvailable()
    } finally q.stop()
    val back = graft.archive.ManifestStore.read(spark, dir, 10L)
    // first window [base, base+10) flushed by the base+11 sample; the
    // second flushed by base+25; the open third window is not emitted
    assert(back.count() == 2)
    // hold-last-value: window 2 holds 2.0 for 1 s then 4.0 for 9 s
    assert(back.select("mean").collect().map(_.getDouble(0)).sorted.toSeq
      == Seq(2.0, 3.8))
  }

  test("streaming exact dedup drops in-watermark duplicates with bounded state") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "event_time", "text")
    val q = graft.pipeline.Dedup.exactStreaming(df, "event_time", "10 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    try {
      mem.addData(Seq(
        (1L, at(0), "alpha doc"), (2L, at(1), "beta doc"),
        (3L, at(2), "alpha doc"))) // dup of 1 within watermark
      q.processAllAvailable()
      mem.addData(Seq((4L, at(5), "alpha doc"), (5L, at(6), "gamma doc")))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 5L)) // 3 and 4 dropped as duplicates
    } finally q.stop()
  }

  test("streaming minhash near-dup equals the batch candidate set, across micro-batches") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val expected = graft.pipeline.Dedup
      .minHashCandidates(corpus.toDF("doc_id", "text"))
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().sorted
    assert(expected.nonEmpty) // the sf corpus has near-dup families
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup
      .minhashStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdmh_spec")
      .outputMode("append").start()
    try {
      // three micro-batches: pairs must appear exactly once no matter
      // where the two members land
      corpus.grouped((corpus.size + 2) / 3).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      // replay the middle third: at-least-once delivery, no new pairs
      mem.addData(corpus.slice(corpus.size / 3, 2 * corpus.size / 3))
      q.processAllAvailable()
      // a pair is emitted once per shared bucket; all emissions of one
      // pair carry the same est_jaccard and land in the same
      // micro-batch — the distinct IS the production per-batch dedup
      val raw = spark.table("sdmh_spec").as[(Long, Long, Double)].collect()
      val got = raw.distinct.sorted
      assert(got.toSeq == expected.toSeq)
      // the duplicates really are per-pair only (same est on every copy)
      assert(raw.map(r => (r._1, r._2)).distinct.length == got.length)
    } finally q.stop()
  }

  test("a saturated minhash bucket stops growing state and emitting pairs") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 8 identical docs: every band bucket saturates at cap 3 —
    // pairs only among the first 3 arrivals (by doc_id), so C(3,2)=3
    val boiler = (1L to 8L).map(i => (i, "the same boilerplate text repeated here"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup
      .minhashStream(mem.toDF().toDF("doc_id", "text"), maxBucketSize = 3)
      .writeStream.format("memory").queryName("sdmh_cap")
      .outputMode("append").start()
    try {
      mem.addData(boiler.take(4)); q.processAllAvailable()
      mem.addData(boiler.drop(4)); q.processAllAvailable()
      val got = spark.table("sdmh_cap")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally q.stop()
  }

  test("a pair survives saturation when ANY shared bucket is under cap") {
    // the hole the emit-everywhere contract closes: X and Y share a
    // SATURATED bucket (their first shared band, via boilerplate-
    // identical signatures there is not constructible from text
    // directly — so approximate with the strongest textual form: X, Y
    // are near-dups of each other arriving AFTER unrelated traffic has
    // saturated none of THEIR buckets, while a boilerplate family
    // saturates its own buckets). The load-bearing assertion: the
    // boilerplate flood must not suppress an unrelated pair's
    // emission, even with the tiny cap.
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val boiler = (1L to 6L).map(i => (i, "the same boilerplate text repeated here"))
    val pairDocs = Seq(
      (100L, "a genuinely distinct near duplicate candidate document body"),
      (101L, "a genuinely distinct near duplicate candidate document body"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup
      .minhashStream(mem.toDF().toDF("doc_id", "text"), maxBucketSize = 2)
      .writeStream.format("memory").queryName("sdmh_cap2")
      .outputMode("append").start()
    try {
      mem.addData(boiler); q.processAllAvailable()       // floods + saturates its buckets
      mem.addData(pairDocs); q.processAllAvailable()     // unrelated pair arrives after
      val got = spark.table("sdmh_cap2")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got.contains((100L, 101L)))
      assert(got == Set((1L, 2L), (100L, 101L))) // boiler capped at C(2,2)=1 pair
    } finally q.stop()
  }

  test("stateless curation ops run unchanged on a stream and equal batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "contact me at alice@example.com or 192.168.0.1", "en"),
      (3L, "word word word word word word word word", "en"))
    val mkDf = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    // quality scoring + PII redaction are per-row codegen'd expressions
    // with no aggregation or state — the SAME operator call compiles
    // onto a streaming plan (this is what per-row curation at ingest
    // time looks like: filter/redact before anything lands)
    val mem = MemoryStream[(Long, String, String)]
    val streamDf = mkDf(mem.toDF().toDF("doc_id", "text", "lang"))
    val q1 = graft.pipeline.TextAnalysis.quality(streamDf)
      .select($"doc_id", $"quality_score")
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode("append").start()
    val q2 = graft.pipeline.TextAnalysis.redactPii(streamDf)
      .select($"doc_id", $"email_count", $"ip_count", $"clean_text")
      .writeStream.format("memory").queryName("redact_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows)
      q1.processAllAvailable(); q2.processAllAvailable()
      val batchDf = mkDf(rows.toDF("doc_id", "text", "lang"))
      val asMap = (rs: Array[org.apache.spark.sql.Row]) =>
        rs.map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(asMap(spark.table("quality_stream").collect()) ==
        asMap(graft.pipeline.TextAnalysis.quality(batchDf)
          .select($"doc_id", $"quality_score").collect()))
      val streamed = asMap(spark.table("redact_stream").collect())
      assert(streamed ==
        asMap(graft.pipeline.TextAnalysis.redactPii(batchDf)
          .select($"doc_id", $"email_count", $"ip_count", $"clean_text")
          .collect()))
      assert(streamed(2L)(2).asInstanceOf[String].contains("[EMAIL]"))
    } finally { q1.stop(); q2.stop() }
  }

  test("streaming embedding ingest grows the persisted IVF index per batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.7 + d).toFloat)))
    val idx = java.nio.file.Files.createTempDirectory("ivfstream").toString
    graft.pipeline.Similarity.ivfBuildIndex(
      base.toDF("vec_id", "embedding"), idx, k = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.pipeline.Similarity.ivfIndexAppend(spark, idx, batch)
      }
      .outputMode("append").start()
    try {
      mem.addData((30L until 40L).map(i =>
        (i, Array.tabulate(8)(d => math.sin(i * 1.7 + d).toFloat))))
      q.processAllAvailable()
      mem.addData((40L until 45L).map(i =>
        (i, Array.tabulate(8)(d => math.sin(i * 1.7 + d).toFloat))))
      q.processAllAvailable()
      val probes = base.take(2).toDF("vec_id", "embedding")
      val found = graft.pipeline.Similarity
        .ivfSearchIndexed(spark, idx, probes, topK = 45, nProbe = 4)
        .where($"vec_id" >= 30).select("vec_id").distinct().count()
      // both micro-batches are searchable
      assert(found > 5)
    } finally q.stop()
  }

  test("windowed counts with watermark produce per-channel rates") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[InSample]
    val stream = StreamingDecimation.windowedCounts(
      mem.toDS().toDF().withColumnRenamed("value", "v")
        .selectExpr("channel", "ts", "cast(v as double) as value"))
    val q = stream.writeStream.format("memory").queryName("wc_out")
      .outputMode("append").start()
    try {
      val base = 1700000000L * S
      mem.addData(Seq(
        InSample("c", base, Some(1.0), 0),
        InSample("c", base + 10 * S, Some(2.0), 1),
        InSample("d", base + 20 * S, Some(3.0), 2)))
      q.processAllAvailable()
      // advance event time beyond watermark so the first window closes
      mem.addData(Seq(InSample("c", base + 200 * S, Some(4.0), 3)))
      q.processAllAvailable()
      mem.addData(Seq(InSample("c", base + 400 * S, Some(5.0), 4)))
      q.processAllAvailable()
      val rows = spark.table("wc_out").collect()
      assert(rows.exists(r => r.getAs[String]("channel") == "c" &&
        r.getAs[Long]("n") == 2))
    } finally q.stop()
  }

  test("config-driven retention fires during a running stream; unconfigured channels refused") {
    import java.nio.file.Files
    import graft.archive.{ChannelConfig, ConfigCommands, ManifestStore}
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfgDir = Files.createTempDirectory("strcfg").toString
    val dir = Files.createTempDirectory("strstore").toString
    val ckpt = Files.createTempDirectory("strckpt").toString
    val day = 86400L * S
    val base = 1704067200L * S
    // the configuration declares raw retention = 2 days; the sink
    // reads it per micro-batch — nothing here calls retention manually
    ConfigCommands.addChannel(spark, cfgDir, ChannelConfig("pv:s", "id-s",
      "ca", enabled = true, Map(), Map(0L -> 2L * 86400L)))
    val mem = MemoryStream[InSample]
    val q = StreamingDecimation.writeRawStreamConfigured(
      mem.toDS().toDF().select($"channel", $"ts",
        $"value".cast("double").as("value"), $"seq".as("sample_id")),
      dir, ckpt, cfgDir)
    try {
      mem.addData(Seq(InSample("pv:s", base, Some(1.0), 0)))
      q.processAllAvailable()
      assert(ManifestStore.read(spark, dir, 0L).count() == 1)
      // five days later: the day-0 bucket's END falls past the 2-day
      // horizon and vanishes DURING the stream
      mem.addData(Seq(InSample("pv:s", base + 5 * day, Some(2.0), 1)))
      q.processAllAvailable()
      assert(ManifestStore.read(spark, dir, 0L)
        .select("ts").collect().map(_.getLong(0)).toSeq
        == Seq(base + 5 * day))
      // a channel the config does not declare is refused by the sink
      mem.addData(Seq(InSample("pv:unknown", base + 5 * day + 1000L,
        Some(9.0), 2)))
      q.processAllAvailable()
      assert(ManifestStore.read(spark, dir, 0L).count() == 1)
      // the store is id-keyed: rows ride the rename-stable data id
      assert(ManifestStore.read(spark, dir, 0L)
        .select("channel").head.getString(0) == "id-s")
    } finally q.stop()
  }

  test("alertStream: rise/fall emitted once each, across batches, replays and markers ignored") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[InSample]
    val q = StreamingDecimation.alertStream(mem.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("alert_out")
      .outputMode("append").start()
    try {
      // batch 1: below → above (rise at 2 s); staying above is silent
      mem.addData(Seq(
        InSample("c", 1 * S, Some(5.0), 0),
        InSample("c", 2 * S, Some(15.0), 1),
        InSample("c", 3 * S, Some(20.0), 2)))
      q.processAllAvailable()
      // batch 2: a marker (no value) must not break the chain, then a
      // fall; a cross-batch REPLAY of the rise sample must be dropped
      mem.addData(Seq(
        InSample("c", 2 * S, Some(15.0), 3),      // stale replay
        InSample("c", 4 * S, None, 4),            // marker
        InSample("c", 5 * S, Some(10.0), 5),      // fall (== threshold)
        InSample("d", 6 * S, Some(50.0), 6)))     // first sample: silent
      q.processAllAvailable()
      val got = spark.table("alert_out")
        .as[StreamingDecimation.AlertOut].collect().toSeq.sortBy(_.ts)
      assert(got.map(a => (a.channel, a.ts, a.kind)) ==
        Seq(("c", 2 * S, "rise"), ("c", 5 * S, "fall")))
      assert(got.head.prev_value == 5.0 && got(1).prev_value == 20.0)
    } finally q.stop()
  }

  test("streaming derived channel: emits at the slower source's frontier, drained equals batch grid") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[InSample]
    val q = StreamingDecimation
      .derivedStream(mem.toDS(), "calc:x", "a", "b", "sub", P10)
      .writeStream.format("memory").queryName("der_out")
      .outputMode("append").start()
    def emitted(): Seq[(Long, Double)] =
      spark.table("der_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    try {
      // a races ahead (5,15,35); b has only reached ts 8 — grid starts
      // at ceil(max(5,8)/10)·10 = 10, nothing finalizable yet
      mem.addData(withSeq(Seq(
        InSample("a", 5 * S, Some(1.0), 0), InSample("a", 15 * S, Some(2.0), 0),
        InSample("a", 35 * S, Some(4.0), 0), InSample("b", 8 * S, Some(10.0), 0))))
      q.processAllAvailable()
      assert(emitted().isEmpty)
      // b reaches 22: grids 10 (1−10) and 20 (2−10) finalize — grid 20
      // takes b's hold FROM ts 8 (the 22 s sample is after the point)
      mem.addData(withSeq(Seq(InSample("b", 22 * S, Some(20.0), 0))))
      q.processAllAvailable()
      assert(emitted() == Seq((10 * S, -9.0), (20 * S, -8.0)))
      // out-of-order b arrival dropped (ST5 per source); a value-less
      // marker at 31 s advances b's frontier AND becomes the held
      // sample past 31 s (disconnected = undefined, the batch
      // null-hold rule) — grid 30 still finalizes as 2 − 20 (the
      // marker is after the point)
      mem.addData(withSeq(Seq(
        InSample("b", 9 * S, Some(99.0), 0),
        InSample("b", 31 * S, None, 0))))
      q.processAllAvailable()
      assert(emitted() ==
        Seq((10 * S, -9.0), (20 * S, -8.0), (30 * S, -18.0)))
      // both advance past 40, but b's held sample at 40 is the 31 s
      // MARKER (the 44 s value is after the point) — grid 40 is
      // undefined and NOT emitted, exactly like the batch null hold
      mem.addData(withSeq(Seq(InSample("b", 44 * S, Some(30.0), 0),
        InSample("a", 47 * S, Some(5.0), 0))))
      q.processAllAvailable()
      assert(emitted() == Seq((10 * S, -9.0), (20 * S, -8.0),
        (30 * S, -18.0)))
    } finally q.stop()
    // the drained stream equals the batch operator on the same rows —
    // INCLUDING the marker — over the span-intersection grid
    // (lo = ceil(max firsts) = 10, hi = floor(min lasts) = 40)
    val rows = Seq(
      ("a", 5, Some(1.0)), ("a", 15, Some(2.0)), ("a", 35, Some(4.0)),
      ("a", 47, Some(5.0)), ("b", 8, Some(10.0)), ("b", 22, Some(20.0)),
      ("b", 31, Option.empty[Double]), ("b", 44, Some(30.0)))
      .map { case (c, t, v) => (c, t.toLong * S, v, "", 0, 0, t.toLong) }
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    val batch = graft.archive.Analytics
      .derivedChannel(rows, "calc:x", "a", "b", _ - _, 10 * S, 40 * S, P10)
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(batch == Seq((10 * S, -9.0), (20 * S, -8.0), (30 * S, -18.0)))
  }

  test("streaming CUSUM quantization matches the batch HALF_UP grid on half-grid values, both signs") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // values landing exactly on x.5 of the 6dp grid: scala math.round
    // would send -2.5 → -2 where the batch/oracle HALF_UP gives -3
    val vs = Seq(-0.0000025, 0.0000025, -0.0000015, 1.0000005, -1.0000005)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      ("c", i * S, v, "", 0, 0, i.toLong)
    }.toDF("channel", "ts", "value", "str_value", "severity", "status",
      "sample_id")
    val target = graft.archive.Analytics
      .cusumTargets(rows, 0L, 10 * S).collect().head.getLong(1)
    val mem = MemoryStream[InSample]
    val q = StreamingCusum.cusumStream(mem.toDS(),
        Map("c" -> target), slack = 0.0)
      .writeStream.format("memory").queryName("cusum_q_out")
      .outputMode("append").start()
    val got = try {
      mem.addData(withSeq(vs.zipWithIndex.map { case (v, i) =>
        InSample("c", i * S, Some(v), 0L) }))
      q.processAllAvailable()
      spark.table("cusum_q_out").as[StreamingCusum.CusumOut]
        .collect().toSeq.sortBy(_.ts)
    } finally q.stop()
    val batch = graft.archive.Analytics
      .cusumShifts(rows, 0L, 10 * S, slack = 0.0, threshold = 1e-6)
      .collect().head
    assert(got.size == batch.getLong(1))
    assert(got.map(_.cusum_hi_q).max / 1e6 == batch.getDouble(6),
      "peak_hi must match the batch grid exactly")
    assert(got.map(_.cusum_lo_q).max / 1e6 == batch.getDouble(7),
      "peak_lo must match the batch grid exactly")
  }

  test("streaming CUSUM equals the batch closed form across micro-batches; out-of-order dropped; untargeted channels silent") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // step channel: 10 → 30 at sample 20 (target = the true mean 20);
    // plus an untargeted channel that must emit nothing
    val vs = Seq.fill(20)(10.0) ++ Seq.fill(20)(30.0)
    val all = withSeq(
      vs.zipWithIndex.map { case (v, i) =>
        InSample("c", i * S, Some(v), 0L) } ++
      (0 until 10).map(i => InSample("ghost", i * S, Some(5.0), 0L)) ++
      // out-of-order straggler for "c": must be dropped by F6
      Seq(InSample("c", 3 * S, Some(999.0), 0L)))
    val targets = Map("c" -> math.round(20.0 * 1e6))
    val mem = MemoryStream[InSample]
    val q = StreamingCusum.cusumStream(mem.toDS(), targets, slack = 5.0)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    val got = try {
      all.grouped(15).foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("cusum_out").as[StreamingCusum.CusumOut].collect().toSeq
    } finally q.stop()
    assert(!got.exists(_.channel == "ghost"), "untargeted channel emitted")
    assert(!got.exists(r => r.channel == "c" && r.ts == 3 * S &&
      got.count(x => x.channel == "c" && x.ts == 3 * S) > 1),
      "out-of-order straggler re-emitted")
    // batch closed form over the SAME kept rows
    val rows = vs.zipWithIndex.map { case (v, i) =>
      ("c", i * S, v, "", 0, 0, i.toLong)
    }.toDF("channel", "ts", "value", "str_value", "severity", "status",
      "sample_id")
    val batch = graft.archive.Analytics
      .cusumShifts(rows, 0L, 40 * S, slack = 5.0, threshold = 100.0)
      .collect().head
    val hQ = math.round(100.0 * 1e6)
    val c = got.filter(_.channel == "c").sortBy(_.ts)
    assert(c.size == batch.getLong(1), "n_samples")
    assert(c.count(_.cusum_hi_q > hQ) == batch.getLong(2), "n_hi")
    assert(c.count(_.cusum_lo_q > hQ) == batch.getLong(3), "n_lo")
    assert(c.map(_.cusum_hi_q).max / 1e6 == batch.getDouble(6), "peak_hi")
    assert(c.map(_.cusum_lo_q).max / 1e6 == batch.getDouble(7), "peak_lo")
  }
}
