package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.Decimation
import graft.streaming.StreamingDecimation
import graft.streaming.StreamingDecimation.{AggOut, InSample}

/** The live cascade stage (streaming re-aggregation) must agree with
  * the batch A2 merge on every coarse window it emits; it withholds
  * only the trailing open window (flush-on-crossing).
  */
class StreamingCascadeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val S = 1000000000L

  test("streaming re-aggregation matches batch reAggregate on emitted windows") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val samples = (0L until 100L).map(t =>
      InSample("c", t * S, Some(math.cos(t.toDouble) * 5 + 10), t)) ++
      (0L until 80L).map(t => InSample("d", (t * 2) * S, Some(t % 7.0), 200 + t))

    // stage 1: raw → 10 s windows (streaming)
    val mem = MemoryStream[InSample]
    val q1 = StreamingDecimation.decimateStream(mem.toDS(), 10 * S)
      .writeStream.format("memory").queryName("fine_out")
      .outputMode("append").start()
    try {
      samples.grouped(37).foreach { b => mem.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    val fine = spark.table("fine_out").as[AggOut]

    // stage 2: 10 s → 30 s (streaming over the stage-1 output)
    val mem2 = MemoryStream[AggOut]
    val q2 = StreamingDecimation.reAggregateStream(mem2.toDS(), 10 * S, 30 * S)
      .writeStream.format("memory").queryName("coarse_out")
      .outputMode("append").start()
    try {
      fine.collect().sortBy(_.win_start).grouped(11)
        .foreach { b => mem2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()

    val streamed = spark.table("coarse_out").as[AggOut].collect()
      .map(a => (a.channel, a.win_start) -> a).toMap
    val batch = Decimation.reAggregate(fine.toDF(), 10 * S, 30 * S)
      .as[AggOut].collect().map(a => (a.channel, a.win_start) -> a).toMap

    assert(streamed.nonEmpty)
    // streamed ⊆ batch; missing keys are only each channel's trailing window
    val missing = batch.keySet -- streamed.keySet
    assert(missing.forall { case (ch, w) =>
      w == batch.keys.filter(_._1 == ch).map(_._2).max
    }, s"non-trailing missing: $missing")

    for ((k, sa) <- streamed) {
      val ba = batch(k)
      def eq(x: Option[Double], y: Option[Double], what: String): Unit =
        (x, y) match {
          case (Some(a), Some(c)) =>
            assert(math.abs(a - c) < 1e-9, s"$what at $k: $a vs $c")
          case (a, c) => assert(a == c, s"$what at $k")
        }
      eq(sa.mean, ba.mean, "mean"); eq(sa.std, ba.std, "std")
      eq(sa.min_value, ba.min_value, "min"); eq(sa.max_value, ba.max_value, "max")
      assert(math.abs(sa.covered_fraction - ba.covered_fraction) < 1e-9)
      assert(sa.n_samples == ba.n_samples)
    }
  }

  test("exact streaming re-aggregation is BIT-identical to batch reAggregateExact, sentinel-flushed") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val samples = (0L until 300L).map(t =>
      InSample("c", t * S, Some(math.sin(t / 3.0) * 40 - 17.25), t)) ++
      (0L until 200L).map(t =>
        InSample("d", (t * 2) * S,
          if (t % 13 == 0) None else Some((t % 19).toDouble / 7), 1000 + t))

    val fineDf = Decimation.decimate(
      samples.toDF("channel", "ts", "value", "sample_id")
        .selectExpr("channel", "ts", "value", "'' AS str_value",
          "0 AS severity", "0 AS status", "sample_id"),
      10 * S)
    val fine = fineDf.as[AggOut].collect().toSeq

    // per-channel sentinels one coarse period past the last fine
    // window: they flush every real coarse window and emit nothing
    val sentinels = fine.groupBy(_.channel).map { case (ch, as) =>
      AggOut(ch, as.map(_.win_start).max + 30 * S, None, None, None, None,
        0.0, 0L)
    }.toSeq

    val mem = MemoryStream[AggOut]
    val q = StreamingDecimation.reAggregateExactStream(mem.toDS(), 10 * S, 30 * S)
      .writeStream.format("memory").queryName("exact_coarse_out")
      .outputMode("append").start()
    try {
      (fine.sortBy(_.win_start) ++ sentinels).grouped(7)
        .foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.table("exact_coarse_out").as[AggOut].collect()
      .map(a => (a.channel, a.win_start) -> a).toMap
    val batch = Decimation.reAggregateExact(fineDf, 10 * S, 30 * S)
      .as[AggOut].collect().map(a => (a.channel, a.win_start) -> a).toMap

    // sentinels flushed EVERY coarse window: exact key equality…
    assert(streamed.keySet == batch.keySet,
      s"missing=${batch.keySet -- streamed.keySet} extra=${streamed.keySet -- batch.keySet}")
    // …and bit-identical values (the merge is integer arithmetic on
    // the 6dp grid on both sides — no tolerance needed or allowed)
    for ((k, sa) <- streamed) assert(sa == batch(k), s"at $k: $sa vs ${batch(k)}")
  }
}
