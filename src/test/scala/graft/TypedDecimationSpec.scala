package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.TypedDecimation
import graft.core.{Samples, TypedSamples}

/** Goldens ported from the reference's decimator tests
  * (ChannelAccessSampleDecimatorTest.java:713-905): mixed aggregatable
  * types with markers, mixed non-aggregatable pick-first, and
  * aggregated-input re-aggregation with covered-fraction weighting.
  */
case class TRow(channel: String, ts: Long, vtype: String,
  value: Option[Double] = None, str_value: Option[String] = None,
  enum_value: Option[Int] = None, labels: Option[Seq[String]] = None,
  arr_num: Option[Seq[Double]] = None, arr_str: Option[Seq[String]] = None,
  agg_mean: Option[Double] = None, agg_std: Option[Double] = None,
  agg_min: Option[Double] = None, agg_max: Option[Double] = None,
  agg_cov: Option[Double] = None,
  severity: Option[Int] = None, status: Option[Int] = None,
  meta_units: Option[String] = None, meta_precision: Option[Int] = None,
  meta_display_low: Option[Double] = None,
  meta_display_high: Option[Double] = None,
  meta_warn_low: Option[Double] = None, meta_warn_high: Option[Double] = None,
  meta_alarm_low: Option[Double] = None,
  meta_alarm_high: Option[Double] = None,
  meta_control_low: Option[Double] = None,
  meta_control_high: Option[Double] = None,
  sample_id: Long = 0L)

class TypedDecimationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val B = 1000000000L

  private def frame(rows: TRow*): DataFrame =
    rows.zipWithIndex.map { case (r, i) => r.copy(sample_id = i + 1L) }
      .toDF()

  private def dec(rows: Seq[TRow], periodSec: Long): Array[org.apache.spark.sql.Row] =
    TypedDecimation.decimate(frame(rows: _*), periodSec * B)
      .orderBy("channel", "win_start").collect()

  private def row(rows: Seq[TRow], periodSec: Long, winSec: Long) =
    dec(rows, periodSec).find(_.getAs[Long]("win_start") == winSec * B).get

  // ChannelAccessSampleDecimatorTest.java:767-795 (mixed aggregatable
  // + disabled): the aggregatable type covering the longest period
  // wins; SCALAR_DOUBLE beats SCALAR_LONG on the 30s-30s tie (enum
  // declaration order); severity propagates only over the chosen
  // type's samples.
  test("mixed aggregatable types with markers pick longest-covered; enum-order ties") {
    val rows = Seq(
      TRow("c", 99 * B, "disconnected"),
      TRow("c", 110 * B, "scalar_double", value = Some(50.0),
        severity = Some(0), status = Some(0), meta_units = Some("xyz")),
      TRow("c", 120 * B, "scalar_long", value = Some(42.0),
        severity = Some(2), status = Some(3)),
      TRow("c", 150 * B, "scalar_double", value = Some(20.0),
        severity = Some(1), status = Some(4)),
      TRow("c", 170 * B, "disconnected"),
      TRow("c", 210 * B, "scalar_double", value = Some(1.0),
        severity = Some(0), status = Some(0)))
    val r = row(rows, 100, 100)
    assert(r.getAs[String]("vtype") == "aggregated_scalar_double")
    assert(math.abs(r.getAs[Double]("mean") - 30.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("std") - 14.142135623730951) < 1e-9)
    assert(r.getAs[Double]("min_value") == 20.0)
    assert(r.getAs[Double]("max_value") == 50.0)
    assert(math.abs(r.getAs[Double]("covered_fraction") - 0.3) < 1e-12)
    assert(r.getAs[Int]("max_severity") == 1)     // MINOR of the double samples
    assert(r.getAs[Int]("status_at_max") == 4)    // not the long's MAJOR/HIHI
    assert(r.getAs[String]("meta_units") == "xyz") // first double's metadata
  }

  // ChannelAccessSampleDecimatorTest.java:838-905 (mixed
  // non-aggregatable): any blocker type forces the first-arriving
  // type; the first sample of that type is re-stamped to the window
  // start.
  test("mixed non-aggregatable picks first sample of first type") {
    val rows = Seq(
      TRow("c", 175 * B, "scalar_enum", enum_value = Some(2),
        labels = Some(Seq("Yes", "No", "Maybe")), severity = Some(0),
        status = Some(0)),
      TRow("c", 201 * B, "scalar_string", str_value = Some("Cassandra"),
        severity = Some(3), status = Some(5)),
      TRow("c", 239 * B, "scalar_enum", enum_value = Some(1),
        labels = Some(Seq("Yes", "No", "Maybe")), severity = Some(0),
        status = Some(0)),
      TRow("c", 250 * B, "scalar_string", str_value = Some("z")))
    val r = row(rows, 60, 180)
    assert(r.getAs[String]("vtype") == "scalar_enum")
    assert(r.getAs[Int]("enum_value") == 2)
    assert(r.getSeq[String](r.fieldIndex("labels")).toList ==
      List("Yes", "No", "Maybe"))
    assert(r.isNullAt(r.fieldIndex("mean")))
    assert(r.getAs[Int]("severity") == 0)
  }

  // a blocker forces first-type even when the first type is
  // aggregatable — the output is then the aggregate of that type only
  // (ChannelAccessSampleDecimator.java:174-186)
  test("blocker with aggregatable first type aggregates the first type") {
    val rows = Seq(
      TRow("c", 100 * B, "scalar_double", value = Some(10.0),
        severity = Some(0), status = Some(0)),
      TRow("c", 150 * B, "scalar_string", str_value = Some("s"),
        severity = Some(0), status = Some(0)),
      TRow("c", 220 * B, "scalar_double", value = Some(1.0)))
    val r = row(rows, 100, 100)
    assert(r.getAs[String]("vtype") == "aggregated_scalar_double")
    assert(math.abs(r.getAs[Double]("mean") - 10.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("covered_fraction") - 0.5) < 1e-12)
  }

  // ChannelAccessSampleDecimatorTest.java:713-758 (aggregated inputs):
  // weights are duration × the input's own covered fraction; mean/std
  // merge via the second moment; min/max pass through.
  test("aggregated inputs merge with covered-fraction weighting") {
    val rows = Seq(
      TRow("c", 57 * B, "aggregated_scalar_short", agg_mean = Some(40.0),
        agg_std = Some(5.0), agg_min = Some(-17.0), agg_max = Some(66.0),
        agg_cov = Some(1.0), severity = Some(0), status = Some(0)),
      TRow("c", 125 * B, "aggregated_scalar_short", agg_mean = Some(0.0),
        agg_std = Some(2.0), agg_min = Some(-64.0), agg_max = Some(15.0),
        agg_cov = Some(0.5), severity = Some(0), status = Some(0)),
      TRow("c", 175 * B, "aggregated_scalar_short", agg_mean = Some(20.0),
        agg_std = Some(3.0), agg_min = Some(5.0), agg_max = Some(95.0),
        agg_cov = Some(1.0), severity = Some(0), status = Some(0)),
      TRow("c", 230 * B, "aggregated_scalar_short", agg_mean = Some(0.0),
        agg_std = Some(0.0), agg_min = Some(0.0), agg_max = Some(0.0),
        agg_cov = Some(1.0)))
    val r = row(rows, 100, 100)
    assert(r.getAs[String]("vtype") == "aggregated_scalar_short")
    assert(math.abs(r.getAs[Double]("mean") - 20.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("std") - 16.713302383306468) < 1e-4)
    assert(r.getAs[Double]("min_value") == -64.0)
    assert(r.getAs[Double]("max_value") == 95.0)
    assert(math.abs(r.getAs[Double]("covered_fraction") - 0.75) < 1e-12)
  }

  // single-sample windows: held sample from before the window
  // pass-through (ChannelAccessSampleDecimatorTest.java:713-737)
  test("single held aggregated sample passes through") {
    val rows = Seq(
      TRow("c", 79 * B, "aggregated_scalar_short", agg_mean = Some(22.3),
        agg_std = Some(4.71), agg_min = Some(-5.0), agg_max = Some(99.0),
        agg_cov = Some(0.9), severity = Some(1), status = Some(2)),
      TRow("c", 130 * B, "aggregated_scalar_short", agg_mean = Some(0.0),
        agg_std = Some(0.0), agg_min = Some(0.0), agg_max = Some(0.0),
        agg_cov = Some(1.0)))
    val r = dec(rows, 30).find(_.getAs[Long]("win_start") == 90 * B).get
    assert(r.getAs[String]("vtype") == "aggregated_scalar_short")
    assert(math.abs(r.getAs[Double]("mean") - 22.3) < 1e-9)
    assert(math.abs(r.getAs[Double]("std") - 4.71) < 1e-9)
    assert(r.getAs[Double]("min_value") == -5.0)
    assert(r.getAs[Double]("max_value") == 99.0)
    assert(math.abs(r.getAs[Double]("covered_fraction") - 0.9) < 1e-12)
    assert(r.getAs[Int]("max_severity") == 1)
  }

  test("marker-only window emits the marker type with no payload") {
    val rows = Seq(
      TRow("c", 100 * B, "disabled"),
      TRow("c", 210 * B, "scalar_double", value = Some(1.0)))
    val r = row(rows, 100, 100)
    assert(r.getAs[String]("vtype") == "disabled")
    assert(r.isNullAt(r.fieldIndex("mean")))
    assert(r.isNullAt(r.fieldIndex("first_value")))
  }

  test("element kinds cover the 21-tag table") {
    assert(TypedSamples.TypeRank.size == 21)
    assert(TypedSamples.elementKind("aggregated_scalar_char") == "long")
    assert(TypedSamples.elementKind("array_float") == "double")
    assert(TypedSamples.elementKind("scalar_string") == "string")
    assert(TypedSamples.elementKind("scalar_enum") == "long")
    assert(TypedSamples.Aggregatable.size == 10)
    assert(TypedSamples.Blockers.contains("scalar_enum"))
    assert(!TypedSamples.Blockers.contains("disabled"))
  }
}
