package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.Analytics

class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val S = 1000000000L
  private val P = 10 * S

  /** One sample per 10 s window start → window mean == the value. */
  private def series(ch: String, vs: Seq[Double]): Seq[(String, Long, Double, String, Int, Int, Long)] =
    vs.zipWithIndex.map { case (v, i) =>
      (ch, i * P, v, "", 0, 0, (ch.hashCode.toLong << 20) + i)
    }

  private def frame(rows: Seq[(String, Long, Double, String, Int, Int, Long)]): DataFrame =
    rows.toDF("channel", "ts", "value", "str_value", "severity", "status", "sample_id")

  test("correlatedChannels: affine +1, inverted -1, constant 0, ranked desc") {
    val base = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0)
    val df = frame(
      series("probe", base) ++
        series("affine", base.map(2 * _ + 1)) ++   // corr +1
        series("inv", base.map(10 - _)) ++          // corr -1
        series("flat", base.map(_ => 7.0)))         // zero variance → 0
    val got = Analytics.correlatedChannels(df, P, "probe").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq("affine", "flat", "inv"))
    val byCh = got.map(t => t._1 -> t._3).toMap
    assert(byCh("affine") == 1.0 && byCh("inv") == -1.0 && byCh("flat") == 0.0)
    // the final sample has zero-width validity (sample-and-hold ends
    // at the last ts), so its window never materializes: n = size - 1
    assert(got.forall(_._2 == base.size - 1))
  }

  test("histogram bins, clamps out-of-range values to edge bins, skips nulls") {
    val df = frame(series("c", Seq(-5.0, 0.0, 24.9, 25.0, 99.0, 250.0)))
      .union(frame(series("d", Seq(1.0))).withColumn("value",
        lit(null).cast("double")))
    val got = Analytics.histogram(df, bins = 4, lo = 0.0, hi = 100.0)
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(!got.exists(_._1 == "d"), "null values must not produce bins")
    val bins = got.filter(_._1 == "c").map(t => t._2 -> t._4).toMap
    // -5 clamps to bin 0; 0, 24.9 in bin 0; 25 in bin 1; 99 in bin 3;
    // 250 clamps to bin 3
    assert(bins == Map(0 -> 3L, 1 -> 1L, 3 -> 2L))
    assert(got.filter(_._1 == "c").forall(t => t._3 == t._2 * 25.0))
  }
}
