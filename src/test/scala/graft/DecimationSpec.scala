package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.Decimation
import graft.core.Samples

/** Golden tests for time-weighted decimation, hand-computed from the
  * reference's contract (SampleDecimator call order + weighting rules,
  * mirrored from ChannelAccessSampleDecimatorTest's approach of
  * hand-weighted expectations — values computed fresh here).
  */
class DecimationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val S = 1000000000L // 1 second in ns
  private val P10 = 10 * S

  /** (ts seconds, value or null, sampleId) for channel "c". */
  private def frame(rows: Seq[(Long, Option[Double])]): DataFrame =
    rows.zipWithIndex.map { case ((t, v), i) =>
      ("c", t * S, v, s"s$i", 0, 0, i.toLong)
    }.toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")

  private def decMap(df: DataFrame): Map[Long, (Double, Double, Double, Long)] =
    df.collect().map { r =>
      (r.getAs[Long]("win_start") / S) ->
        ((if (r.isNullAt(r.fieldIndex("mean"))) Double.NaN else r.getAs[Double]("mean"),
          if (r.isNullAt(r.fieldIndex("std"))) Double.NaN else r.getAs[Double]("std"),
          r.getAs[Double]("covered_fraction"),
          r.getAs[Long]("n_samples")))
    }.toMap

  test("time-weighted mean/std/coverage with hold-last-value and flush-on-crossing") {
    val samples = frame(Seq(5L -> Some(1.0), 12L -> Some(3.0),
      25L -> Some(5.0), 41L -> Some(2.0)))
    val got = decMap(Decimation.decimate(samples, P10))

    // windows 0,10,20,30 emitted (40 not crossed: t_max=41 < 50)
    assert(got.keySet == Set(0L, 10L, 20L, 30L))
    // [0,10): s(5,v=1) covers [5,10) → mean 1, cov 0.5
    assert(got(0L)._1 === 1.0); assert(got(0L)._2 === 0.0)
    assert(got(0L)._3 === 0.5); assert(got(0L)._4 === 1L)
    // [10,20): v=1 on [10,12), v=3 on [12,20) → mean 2.6, var 0.64
    assert(math.abs(got(10L)._1 - 2.6) < 1e-12)
    assert(math.abs(got(10L)._2 - 0.8) < 1e-9)
    assert(got(10L)._3 === 1.0); assert(got(10L)._4 === 2L)
    // [20,30): v=3 on [20,25), v=5 on [25,30) → mean 4, std 1
    assert(math.abs(got(20L)._1 - 4.0) < 1e-12)
    assert(math.abs(got(20L)._2 - 1.0) < 1e-9)
    // [30,40): gap window fully held at v=5
    assert(got(30L)._1 === 5.0); assert(got(30L)._2 === 0.0)
    assert(got(30L)._3 === 1.0); assert(got(30L)._4 === 1L)
  }

  test("marker samples (null value) break the hold and reduce coverage") {
    val samples = frame(Seq(5L -> Some(1.0), 12L -> Some(3.0),
      25L -> None, 41L -> Some(2.0)))
    val got = decMap(Decimation.decimate(samples, P10))
    // [20,30): v=3 only on [20,25); marker occupies the rest
    assert(math.abs(got(20L)._1 - 3.0) < 1e-12)
    assert(got(20L)._3 === 0.5); assert(got(20L)._4 === 1L)
    // [30,40): fully disconnected → null stats, coverage 0
    assert(got(30L)._1.isNaN); assert(got(30L)._3 === 0.0)
    assert(got(30L)._4 === 0L)
  }

  test("pick-first emits the sample valid at each window start") {
    val samples = frame(Seq(5L -> Some(1.0), 12L -> Some(3.0),
      25L -> Some(5.0), 41L -> Some(2.0)))
    val got = Decimation.pickFirst(samples, P10).collect()
      .map(r => r.getAs[Long]("win_start") / S -> r.getAs[String]("first_value"))
      .toMap
    // no sample valid at t=0 (first sample arrives at 5)
    assert(got == Map(10L -> "s0", 20L -> "s1", 30L -> "s2"))
  }

  test("re-aggregation of fine windows matches direct coarse decimation") {
    // dense samples so every 10s window is fully covered → the A2 merge
    // must reproduce the direct 30s aggregation exactly
    val rows = (0L until 63L).map(t => t -> Some(math.sin(t.toDouble) * 10 + 50))
    val samples = frame(rows)
    val fine = Decimation.decimate(samples, P10)
    val merged = decMap(Decimation.reAggregate(fine, P10, 3 * P10))
    val direct = decMap(Decimation.decimate(samples, 3 * P10))
    assert(merged.keySet == direct.keySet)
    merged.keySet.foreach { k =>
      assert(math.abs(merged(k)._1 - direct(k)._1) < 1e-9, s"mean at $k")
      assert(math.abs(merged(k)._2 - direct(k)._2) < 1e-6, s"std at $k")
      assert(math.abs(merged(k)._3 - direct(k)._3) < 1e-9, s"cov at $k")
    }
  }

  test("reAggregateExact agrees with reAggregate at the 6dp gate precision") {
    val rows = (0L until 63L).map(t => t -> (if (t % 17 == 0) None
      else Some(math.sin(t.toDouble) * 10 + 50)))
    val samples = frame(rows)
    val fine = Decimation.decimate(samples, P10)
    val exact = decMap(Decimation.reAggregateExact(fine, P10, 3 * P10))
    val plain = decMap(Decimation.reAggregate(fine, P10, 3 * P10))
    assert(exact.keySet == plain.keySet)
    exact.keySet.foreach { k =>
      // exact outputs are pre-rounded to 6dp; inputs were quantized to
      // the same grid, so agreement is within one 6dp quantum
      assert(math.abs(exact(k)._1 - plain(k)._1) < 2e-6, s"mean at $k")
      assert(math.abs(exact(k)._2 - plain(k)._2) < 2e-6, s"std at $k")
      assert(math.abs(exact(k)._3 - plain(k)._3) < 2e-6, s"cov at $k")
      assert(exact(k)._4 == plain(k)._4, s"n at $k")
    }
  }

  test("monotonic dedup drops out-of-order arrivals per channel") {
    val df = Seq(
      ("c", 10L, 1.0, "a", 0, 0, 0L),
      ("c", 5L, 2.0, "b", 0, 0, 1L),  // late: 5 <= 10 → dropped
      ("c", 10L, 3.0, "c", 0, 0, 2L), // duplicate ts → dropped
      ("c", 11L, 4.0, "d", 0, 0, 3L),
      ("d", 7L, 5.0, "e", 0, 0, 4L)
    ).toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")
    val kept = Samples.monotonicDedup(df).select("sample_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 3L, 4L))
  }

  test("cascade source selection picks largest proper divisor") {
    assert(Decimation.selectSourcePeriod(3600, Seq(30, 300, 900)) == 900L)
    assert(Decimation.selectSourcePeriod(3600, Seq(30, 7)) == 30L)
    assert(Decimation.selectSourcePeriod(3600, Seq(7, 11)) == 0L)
    assert(Decimation.selectSourcePeriod(60, Seq()) == 0L)
  }
}
