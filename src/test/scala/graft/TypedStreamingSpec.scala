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

  test("typed streaming decimation equals the batch dispatch across micro-batches") {
    val samples = Seq(
      TypedIn("c", 99 * S, TValue("disconnected")),
      TypedIn("c", 110 * S, TValue("scalar_double", value = Some(50.0),
        severity = Some(0), status = Some(0))),
      TypedIn("c", 120 * S, TValue("scalar_long", value = Some(42.0),
        severity = Some(2), status = Some(3))),
      TypedIn("c", 150 * S, TValue("scalar_double", value = Some(20.0),
        severity = Some(1), status = Some(4))),
      TypedIn("c", 170 * S, TValue("disconnected")),
      // window 2: enum + string mix → pick-first
      TypedIn("c", 230 * S, TValue("scalar_enum", enumValue = Some(2),
        labels = Some(Seq("Yes", "No", "Maybe")), severity = Some(0),
        status = Some(0))),
      TypedIn("c", 250 * S, TValue("scalar_string",
        strValue = Some("Cassandra"), severity = Some(0), status = Some(0))),
      // window 3: aggregated inputs with covered-fraction weights
      TypedIn("c", 310 * S, TValue("aggregated_scalar_short",
        aggMean = Some(40.0), aggStd = Some(5.0), aggMin = Some(-17.0),
        aggMax = Some(66.0), aggCov = Some(0.5), severity = Some(0),
        status = Some(0))),
      TypedIn("c", 360 * S, TValue("aggregated_scalar_short",
        aggMean = Some(20.0), aggStd = Some(3.0), aggMin = Some(5.0),
        aggMax = Some(95.0), aggCov = Some(1.0), severity = Some(1),
        status = Some(6))),
      // terminal sample flushes everything before it
      TypedIn("c", 460 * S, TValue("scalar_double", value = Some(1.0),
        severity = Some(0), status = Some(0))),
      // second channel, marker-only window
      TypedIn("d", 105 * S, TValue("disabled")),
      TypedIn("d", 260 * S, TValue("scalar_double", value = Some(7.0),
        severity = Some(0), status = Some(0))))
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
