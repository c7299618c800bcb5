package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{TypedDecimation, TypedDecimatorCore}
import graft.archive.TypedDecimatorCore.TValue
import graft.streaming.StreamingDecimation
import graft.streaming.StreamingDecimation.TypedIn

/** Stream ≡ batch for the FULL 21-type dispatch: the keyed-state
  * streaming decimator must reproduce the declarative typed plan on
  * mixed-type, marker-interleaved input, across micro-batch splits.
  */
class TypedStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val S = 1000000000L

  private def runStream(batches: Seq[Seq[TypedIn]],
                        periodNs: Long): Seq[TypedDecimatorCore.Out] = {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[TypedIn]
    val q = StreamingDecimation.decimateTypedStream(mem.toDS(), periodNs)
      .writeStream.format("memory").queryName("tdec_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("tdec_out").as[TypedDecimatorCore.Out].collect().toSeq
    } finally q.stop()
  }

  private def runBatch(samples: Seq[TypedIn],
                       periodNs: Long): Map[(String, Long), org.apache.spark.sql.Row] = {
    import spark.implicits._
    val rows = samples.map { s =>
      TRow(s.channel, s.ts, s.v.vtype, s.v.value, s.v.strValue,
        s.v.enumValue, s.v.labels, s.v.arrNum, s.v.arrStr,
        s.v.aggMean, s.v.aggStd, s.v.aggMin, s.v.aggMax, s.v.aggCov,
        s.v.severity, s.v.status, sample_id = s.seq)
    }
    TypedDecimation.decimate(rows.toDF(), periodNs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
  }

  test("typed streaming cascade: chained stages equal batch decimation of stage-1 output") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val samples = ((0L until 100L).map { t =>
      TypedIn("c", t * S, TValue("scalar_double",
        value = Some(math.cos(t.toDouble) * 5 + 10),
        severity = Some((t % 3).toInt), status = Some((t % 5).toInt)), t)
    } ++ (0L until 40L).map { t =>
      TypedIn("d", (t * 2) * S,
        if (t % 5 == 0) TValue("scalar_enum", enumValue = Some((t % 3).toInt),
          labels = Some(Seq("A", "B", "C")), severity = Some(0),
          status = Some(0))
        else TValue("scalar_long", value = Some((t % 11).toDouble),
          severity = Some(0), status = Some(0)), 200 + t)
    }).sortBy(_.seq)

    // stage 1: raw → 10 s typed windows (streaming)
    val mem = MemoryStream[TypedIn]
    val q1 = StreamingDecimation.decimateTypedStream(mem.toDS(), 10 * S)
      .writeStream.format("memory").queryName("tfine_out")
      .outputMode("append").start()
    try {
      samples.grouped(37).foreach { b => mem.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    val fine = spark.table("tfine_out").as[TypedDecimatorCore.Out].collect()

    // stage 2: 10 s → 30 s via the cascade conversion (streaming)
    val feed = fine.sortBy(_.win_start).zipWithIndex.map { case (o, i) =>
      TypedIn(o.channel, o.win_start, TypedDecimatorCore.asInput(o), i.toLong)
    }.toSeq
    val mem2 = MemoryStream[TypedIn]
    val q2 = StreamingDecimation.decimateTypedStream(mem2.toDS(), 30 * S)
      .writeStream.format("memory").queryName("tcoarse_out")
      .outputMode("append").start()
    try {
      feed.grouped(11).foreach { b => mem2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    val streamed = spark.table("tcoarse_out").as[TypedDecimatorCore.Out]
      .collect().map(o => (o.channel, o.win_start) -> o).toMap

    // batch analog over the same stage-1 output
    val frame = feed.map { t =>
      TRow(t.channel, t.ts, t.v.vtype, t.v.value, t.v.strValue,
        t.v.enumValue, t.v.labels, t.v.arrNum, t.v.arrStr, t.v.aggMean,
        t.v.aggStd, t.v.aggMin, t.v.aggMax, t.v.aggCov, t.v.severity,
        t.v.status, sample_id = t.seq)
    }.toDF()
    val batch = TypedDecimation.decimate(frame, 30 * S).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap

    assert(streamed.keySet == batch.keySet)
    for ((k, o) <- streamed) {
      val b = batch(k)
      assert(o.vtype == b.getString(b.fieldIndex("vtype")), s"vtype at $k")
      (o.mean, b.isNullAt(b.fieldIndex("mean"))) match {
        case (Some(m), false) =>
          assert(math.abs(m - b.getDouble(b.fieldIndex("mean"))) < 1e-9, s"mean at $k")
        case (m, isNull) => assert(m.isEmpty == isNull, s"mean null at $k")
      }
      assert(o.n_samples == b.getLong(b.fieldIndex("n_samples")), s"n at $k")
    }
    // the enum windows survived the cascade as pick-first enums
    assert(streamed.values.exists(_.vtype == "scalar_enum") ||
      batch.values.exists(_.getString(2) == "scalar_enum"))
  }

  test("typed streaming decimation equals the batch dispatch across micro-batches") {
    val samples = Seq(
      TypedIn("c", 99 * S, TValue("disconnected"), 0L),
      TypedIn("c", 110 * S, TValue("scalar_double", value = Some(50.0),
        severity = Some(0), status = Some(0)), 0L),
      TypedIn("c", 120 * S, TValue("scalar_long", value = Some(42.0),
        severity = Some(2), status = Some(3)), 0L),
      TypedIn("c", 150 * S, TValue("scalar_double", value = Some(20.0),
        severity = Some(1), status = Some(4)), 0L),
      TypedIn("c", 170 * S, TValue("disconnected"), 0L),
      // window 2: enum + string mix → pick-first
      TypedIn("c", 230 * S, TValue("scalar_enum", enumValue = Some(2),
        labels = Some(Seq("Yes", "No", "Maybe")), severity = Some(0),
        status = Some(0)), 0L),
      TypedIn("c", 250 * S, TValue("scalar_string",
        strValue = Some("Cassandra"), severity = Some(0), status = Some(0)), 0L),
      // window 3: aggregated inputs with covered-fraction weights
      TypedIn("c", 310 * S, TValue("aggregated_scalar_short",
        aggMean = Some(40.0), aggStd = Some(5.0), aggMin = Some(-17.0),
        aggMax = Some(66.0), aggCov = Some(0.5), severity = Some(0),
        status = Some(0)), 0L),
      TypedIn("c", 360 * S, TValue("aggregated_scalar_short",
        aggMean = Some(20.0), aggStd = Some(3.0), aggMin = Some(5.0),
        aggMax = Some(95.0), aggCov = Some(1.0), severity = Some(1),
        status = Some(6)), 0L),
      // terminal sample flushes everything before it
      TypedIn("c", 460 * S, TValue("scalar_double", value = Some(1.0),
        severity = Some(0), status = Some(0)), 0L),
      // second channel, marker-only window
      TypedIn("d", 105 * S, TValue("disabled"), 0L),
      TypedIn("d", 260 * S, TValue("scalar_double", value = Some(7.0),
        severity = Some(0), status = Some(0)), 0L))
      .zipWithIndex.map { case (s, i) => s.copy(seq = i + 1L) }

    val batches = Seq(samples.take(3), samples.slice(3, 7), samples.drop(7))
    val stream = runStream(batches, 100 * S)
    val batch = runBatch(samples, 100 * S)

    assert(stream.map(o => (o.channel, o.win_start)).sorted ==
      batch.keys.toSeq.sorted)
    for (o <- stream) {
      val b = batch((o.channel, o.win_start))
      assert(o.vtype == b.getString(b.fieldIndex("vtype")),
        s"vtype at ${(o.channel, o.win_start / S)}")
      def num(f: String): Option[Double] = {
        val i = b.fieldIndex(f)
        if (b.isNullAt(i)) None else Some(b.getDouble(i))
      }
      def close(x: Option[Double], y: Option[Double], what: String): Unit =
        (x, y) match {
          case (Some(p), Some(q)) =>
            assert(math.abs(p - q) < 1e-9, s"$what at ${o.win_start / S}: $p vs $q")
          case (p, q) => assert(p == q, s"$what at ${o.win_start / S}: $p vs $q")
        }
      close(o.mean, num("mean"), "mean")
      close(o.std, num("std"), "std")
      close(o.min_value, num("min_value"), "min")
      close(o.max_value, num("max_value"), "max")
      close(o.covered_fraction, num("covered_fraction"), "covered")
      def int(f: String): Option[Int] = {
        val i = b.fieldIndex(f)
        if (b.isNullAt(i)) None else Some(b.getInt(i))
      }
      assert(o.max_severity == int("max_severity"), s"sev at ${o.win_start / S}")
      assert(o.status_at_max == int("status_at_max"), s"status at ${o.win_start / S}")
      assert(o.n_samples == b.getLong(b.fieldIndex("n_samples")),
        s"n at ${o.win_start / S}")
      // pick-first payload parity
      if (o.vtype == "scalar_enum") {
        assert(o.first.enumValue ==
          Option(b.getInt(b.fieldIndex("enum_value"))))
      }
    }
  }
}
