package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize

/** The three sessionization paths must agree: the oracle-gated
  * lag/cumsum batch operator, Spark's native `session_window`
  * aggregation, and the same native aggregation drained through a
  * Structured Streaming query. Includes the exact-gap boundary: an
  * event exactly `gap` after its predecessor starts a NEW session
  * (session_window's end is exclusive).
  */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val S = 1000000000L // ns per second
  private val Gap = 100L // seconds
  private val T0 = 1704067200L * S // 2024-01-01T00:00:00Z

  // (user_id, ts_ns, event_id, value); user 1 pins the exactly-at-gap
  // merge AND a one-past-gap split, user 2 an inside-gap merge, user 3
  // a singleton
  private val rows: Seq[(Long, Long, Long, Double)] = Seq(
    (1L, T0, 1L, 1.5),
    (1L, T0 + 40 * S, 2L, 2.5),
    (1L, T0 + 140 * S, 3L, 4.0), // exactly gap later → still merges
    (1L, T0 + 241 * S, 4L, 8.0), // gap+1 later → new session
    (2L, T0 + 5 * S, 5L, 1.0),
    (2L, T0 + 5 * S + (Gap - 1) * S, 6L, 2.0), // inside gap → same session
    (3L, T0 + 77 * S, 7L, 42.0))

  private def eventsDf: DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_id", "value")
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Long, Long, Double)] =
    df.select("user_id", "start_ns", "end_ns", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq.sorted

  test("batch lag/cumsum sessions match the expected boundary semantics") {
    val got = canon(Sessionize.sessions(eventsDf, Gap))
    val want = Seq(
      (1L, T0, T0 + 140 * S, 3L, 8.0),
      (1L, T0 + 241 * S, T0 + 241 * S, 1L, 8.0),
      (2L, T0 + 5 * S, T0 + 104 * S, 2L, 3.0),
      (3L, T0 + 77 * S, T0 + 77 * S, 1L, 42.0)).sorted
    assert(got == want)
  }

  test("native session_window aggregation computes the same sessions") {
    assert(canon(Sessionize.sessionWindowAgg(eventsDf, Gap)) ==
      canon(Sessionize.sessions(eventsDf, Gap)))
  }

  test("streamed session_window drains to the batch sessions") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val stream = mem.toDS().toDF("user_id", "ts", "event_id", "value")
    val q = Sessionize.sessionWindowAgg(stream, Gap, watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      // append mode emits a session only once the watermark passes its
      // close; a far-future flush event advances it past every real one
      mem.addData(Seq((99L, T0 + 10000 * S, 999L, 0.0)))
      q.processAllAvailable()
      val got = canon(spark.table("sess_out").where($"user_id" =!= 99L))
      assert(got == canon(Sessionize.sessions(eventsDf, Gap)))
    } finally q.stop()
  }

  test("retentionCohorts: first-day cohorts, distinct per-day users, rate vs cohort size") {
    import spark.implicits._
    val D = 86400L * S
    // cohort day 0: users 1,2 (user 1 returns day 1 twice — distinct;
    // user 2 returns day 2); cohort day 1: user 3, never returns
    val ev = Seq(
      (1L, 0L), (1L, D + S), (1L, D + 2 * S), (2L, 10L), (2L, 2 * D),
      (3L, D + 5L))
      .map { case (u, t) => (u, t, "view", 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Sessionize.retentionCohorts(ev)
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 1.0),
      (0L, 1L, 1L, 0.5),
      (0L, 2L, 1L, 0.5),
      (1L, 0L, 1L, 1.0)))
  }

  test("funnel: strict ordering, window cutoff, ties excluded, conversion vs step one") {
    import spark.implicits._
    val W = 100L * S
    // u1 completes; u2's click precedes its view (stops at view); u3's
    // purchase falls past the window (stops at click); u4 never views
    // (absent from step 1's denominator); u5's click TIES its view
    // (strict > excludes it)
    val ev = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 0L, "click"), (2L, 10L, "view"),
      (3L, 0L, "view"), (3L, 5L, "click"), (3L, 150L, "purchase"),
      (4L, 0L, "purchase"),
      (5L, 0L, "view"), (5L, 0L, "click"))
      .map { case (u, t, e) => (u, t * S, e, 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Sessionize.funnel(ev, Seq("view", "click", "purchase"), W)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0, "view", 4L, 1.0),
      (1, "click", 2L, 0.5),
      (2, "purchase", 1L, 0.25)))
  }

  test("streaming funnel equals the batch fold across micro-batches; each step emits once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.{FunnelHit, InEvent}
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val W = 100L * S
    // u1 converts ACROSS batches (view in batch 1, click+purchase in
    // batch 2); u3's purchase lands past the window; u5 ties
    val b1 = Seq(InEvent(1L, 0L, "view"),
      InEvent(3L, 0L, "view"), InEvent(3L, 5 * S, "click"),
      InEvent(5L, 0L, "view"), InEvent(5L, 0L, "click"))
    val b2 = Seq(InEvent(1L, 10 * S, "click"), InEvent(1L, 20 * S, "purchase"),
      InEvent(3L, 150 * S, "purchase"),
      InEvent(2L, 30 * S, "click"), InEvent(2L, 40 * S, "view"))
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[InEvent]
    val q = StreamingFunnel.funnelStream(mem.toDS(), steps, W)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    val hits = try {
      Seq(b1, b2).foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("funnel_out").as[FunnelHit].collect().toSeq
    } finally q.stop()
    // each (user, step) at most once
    assert(hits.map(h => (h.user_id, h.step)).distinct.size == hits.size)
    val summary = graft.streaming.Sessionize.funnelSummary(
        hits.map(_.step).toDF("step"), steps)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3))).toSeq
    val batch = graft.streaming.Sessionize.funnel(
        (b1 ++ b2).map(e => (e.user_id, e.ts, e.event_type, 1.0))
          .toDF("user_id", "ts", "event_type", "value"), steps, W)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(summary == batch, s"stream $summary vs batch $batch")
    assert(batch.map(_._2) == Seq(4L, 2L, 1L))
  }

  test("funnel: a corpus with no matching events still reports every step at zero") {
    import spark.implicits._
    val ev = Seq((1L, 0L, "error", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = Sessionize.funnel(ev, Seq("view", "click"), 100L * S)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, "view", 0L, 0.0), (1, "click", 0L, 0.0)))
  }

  test("funnel: out-of-order arrival irrelevant (sort inside), step list validated") {
    import spark.implicits._
    val ev = Seq((1L, 20L, "purchase"), (1L, 0L, "view"), (1L, 10L, "click"))
      .map { case (u, t, e) => (u, t * S, e, 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Sessionize.funnel(ev, Seq("view", "click", "purchase"), 100L * S)
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L, 1L))
    intercept[IllegalArgumentException] {
      Sessionize.funnel(ev, Seq("view"), 100L * S)
    }
    intercept[IllegalArgumentException] {
      Sessionize.funnel(ev, Seq("view", "view"), 100L * S)
    }
  }
}
