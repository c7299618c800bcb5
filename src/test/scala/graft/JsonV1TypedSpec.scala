package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{JsonV1, TypedDecimation}

/** Byte-exact JSON v1 goldens for every type family, ported from
  * JsonV1SampleSerializerTest.java:55-320 (same structure, values,
  * and Jackson number text; status strings are the CA alarm-status
  * names the reference surfaces via ChannelAccessAlarmStatus).
  */
class JsonV1TypedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def json(rows: TRow*): Seq[String] =
    JsonV1.serializeTyped(rows.zipWithIndex
        .map { case (r, i) => r.copy(sample_id = i + 1L) }.toDF())
      .orderBy("sample_id").select("json").as[String].collect().toSeq

  private val meta = (units: String, precision: Option[Int]) => TRow(
    channel = "c", ts = 0L, vtype = "",
    meta_units = Some(units), meta_precision = precision,
    meta_display_low = Some(-20.0), meta_display_high = Some(50.0),
    meta_warn_low = Some(-10.0), meta_warn_high = Some(100.0),
    meta_alarm_low = Some(Double.NegativeInfinity),
    meta_alarm_high = Some(Double.PositiveInfinity))

  test("scalar double with numeric metaData and infinite limits") {
    val r = meta("mA", Some(2)).copy(ts = 1472910282661419000L,
      vtype = "scalar_double", value = Some(42.38),
      severity = Some(2), status = Some(0))
    assert(json(r).head ==
      "{\"time\":1472910282661419000,\"severity\":{\"level\":\"MAJOR\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"metaData\":{\"type\":\"numeric\",\"precision\":2,\"units\":\"mA\"," +
        "\"displayLow\":-20.0,\"displayHigh\":50.0,\"warnLow\":-10.0,\"warnHigh\":100.0," +
        "\"alarmLow\":\"-Infinity\",\"alarmHigh\":\"Infinity\"}," +
        "\"type\":\"double\",\"value\":[42.38]}")
  }

  test("scalar long serializes integer value text and precision 0") {
    val r = meta("m", None).copy(ts = 1472910282661417000L,
      vtype = "scalar_long", value = Some(199.0),
      severity = Some(2), status = Some(0))
    assert(json(r).head ==
      "{\"time\":1472910282661417000,\"severity\":{\"level\":\"MAJOR\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"metaData\":{\"type\":\"numeric\",\"precision\":0,\"units\":\"m\"," +
        "\"displayLow\":-20.0,\"displayHigh\":50.0,\"warnLow\":-10.0,\"warnHigh\":100.0," +
        "\"alarmLow\":\"-Infinity\",\"alarmHigh\":\"Infinity\"}," +
        "\"type\":\"long\",\"value\":[199]}")
  }

  test("long array value") {
    val r = meta("m", None).copy(ts = 1472910282651417000L,
      vtype = "array_long", arr_num = Some(Seq(19.0, 155.0, 21.0)),
      severity = Some(2), status = Some(0))
    assert(json(r).head ==
      "{\"time\":1472910282651417000,\"severity\":{\"level\":\"MAJOR\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"metaData\":{\"type\":\"numeric\",\"precision\":0,\"units\":\"m\"," +
        "\"displayLow\":-20.0,\"displayHigh\":50.0,\"warnLow\":-10.0,\"warnHigh\":100.0," +
        "\"alarmLow\":\"-Infinity\",\"alarmHigh\":\"Infinity\"}," +
        "\"type\":\"long\",\"value\":[19,155,21]}")
  }

  test("enum with states metaData; enum without labels omits metaData") {
    val withLabels = TRow("c", 1522910282661445612L, "scalar_enum",
      enum_value = Some(3),
      labels = Some(Seq("label 1", "label 2", "label 3")),
      severity = Some(0), status = Some(0))
    val noLabels = TRow("c", 1522910282661419012L, "scalar_enum",
      enum_value = Some(3), severity = Some(0), status = Some(0))
    val out = json(withLabels, noLabels)
    assert(out.head ==
      "{\"time\":1522910282661445612,\"severity\":{\"level\":\"OK\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"metaData\":{\"type\":\"enum\",\"states\":[\"label 1\",\"label 2\",\"label 3\"]}," +
        "\"type\":\"enum\",\"value\":[3]}")
    assert(out(1) ==
      "{\"time\":1522910282661419012,\"severity\":{\"level\":\"OK\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"type\":\"enum\",\"value\":[3]}")
  }

  test("enum array serializes all elements from the long payload family") {
    val r = TRow("c", 12L, "array_enum",
      arr_num = Some(Seq(2.0, 0.0, 1.0)),
      labels = Some(Seq("off", "on", "err")),
      severity = Some(0), status = Some(0))
    assert(json(r).head ==
      "{\"time\":12,\"severity\":{\"level\":\"OK\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"metaData\":{\"type\":\"enum\",\"states\":[\"off\",\"on\",\"err\"]}," +
        "\"type\":\"enum\",\"value\":[2,0,1]}")
    // the fast concat path agrees byte-for-byte
    val fast = JsonV1.serializeTypedFast(Seq(r.copy(sample_id = 1L)).toDF())
      .select("json").as[String].collect().head
    assert(fast == json(r).head)
  }

  test("string samples escape payloads; string arrays serialize all elements") {
    val scalar = TRow("c", 10L, "scalar_string",
      str_value = Some("say \"hi\"\\now"), severity = Some(1),
      status = Some(3))
    val arr = TRow("c", 11L, "array_string",
      arr_str = Some(Seq("Cassandra", "PV")), severity = Some(0),
      status = Some(0))
    val out = json(scalar, arr)
    assert(out.head ==
      "{\"time\":10,\"severity\":{\"level\":\"MINOR\",\"hasValue\":true}," +
        "\"status\":\"HIHI\",\"quality\":\"Original\"," +
        "\"type\":\"string\",\"value\":[\"say \\\"hi\\\"\\\\now\"]}")
    assert(out(1) ==
      "{\"time\":11,\"severity\":{\"level\":\"OK\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"type\":\"string\",\"value\":[\"Cassandra\",\"PV\"]}")
  }

  test("aggregated sample serializes as minMaxDouble with minimum/maximum") {
    val r = meta("mA", Some(2)).copy(ts = 1472910282661419000L,
      vtype = "aggregated_scalar_double", agg_mean = Some(42.38),
      agg_min = Some(-17.2), agg_max = Some(88.32),
      severity = Some(2), status = Some(0))
    assert(json(r).head ==
      "{\"time\":1472910282661419000,\"severity\":{\"level\":\"MAJOR\",\"hasValue\":true}," +
        "\"status\":\"NO_ALARM\",\"quality\":\"Original\"," +
        "\"metaData\":{\"type\":\"numeric\",\"precision\":2,\"units\":\"mA\"," +
        "\"displayLow\":-20.0,\"displayHigh\":50.0,\"warnLow\":-10.0,\"warnHigh\":100.0," +
        "\"alarmLow\":\"-Infinity\",\"alarmHigh\":\"Infinity\"}," +
        "\"type\":\"minMaxDouble\",\"value\":[42.38],\"minimum\":-17.2,\"maximum\":88.32}")
  }

  test("markers serialize as Archive_Disabled / Disconnected string samples") {
    val out = json(TRow("c", 20L, "disabled"), TRow("c", 21L, "disconnected"))
    assert(out.head ==
      "{\"time\":20,\"severity\":{\"level\":\"INVALID\",\"hasValue\":false}," +
        "\"status\":\"Archive_Disabled\",\"quality\":\"Original\"," +
        "\"type\":\"string\",\"value\":[\"Archive_Disabled\"]}")
    assert(out(1) ==
      "{\"time\":21,\"severity\":{\"level\":\"INVALID\",\"hasValue\":false}," +
        "\"status\":\"Disconnected\",\"quality\":\"Original\"," +
        "\"type\":\"string\",\"value\":[\"Disconnected\"]}")
  }

  test("fast concat serializer is byte-equal to the Jackson path on the full frame") {
    val typed = graft.core.TypedSamples.fromEvents(spark, "/root/testdata/sf0.001")
    val slow = JsonV1.serializeTyped(typed)
      .select("sample_id", "json").as[(Long, String)].collect().toMap
    val fast = JsonV1.serializeTypedFast(typed)
      .select("sample_id", "json").as[(Long, String)].collect().toMap
    assert(slow.keySet == fast.keySet)
    val diffs = slow.keys.filter(k => slow(k) != fast(k))
    assert(diffs.isEmpty,
      diffs.take(2).map(k => s"$k:\n  ${slow(k)}\n  ${fast(k)}").mkString("\n"))
  }

  test("decimated typed output serializes end to end as Interpolated") {
    val B = 1000000000L
    // [100,200): value 50 holds [100,150) and 20 holds [150,200) →
    // mean 35.0, min 20, max 50, severity MINOR/HIGH from the second
    // sample, metadata from the first sample of the window's type
    val rows = Seq(
      TRow("c", 100 * B, "scalar_double", value = Some(50.0),
        severity = Some(0), status = Some(0), meta_units = Some("V"),
        meta_display_low = Some(-20.0), meta_display_high = Some(50.0),
        meta_warn_low = Some(-10.0), meta_warn_high = Some(100.0),
        meta_alarm_low = Some(-15.0), meta_alarm_high = Some(99.5)),
      TRow("c", 150 * B, "scalar_double", value = Some(20.0),
        severity = Some(1), status = Some(4)),
      TRow("c", 210 * B, "scalar_double", value = Some(1.0),
        severity = Some(0), status = Some(0)))
      .zipWithIndex.map { case (r, i) => r.copy(sample_id = i + 1L) }
    val dec = TypedDecimation.decimate(rows.toDF(), 100 * B)
    val out = JsonV1.serializeDecimatedTyped(dec)
      .where($"ts" === 100 * B).select("json").as[String].collect()
    assert(out.length == 1)
    assert(out.head ==
      "{\"time\":100000000000,\"severity\":{\"level\":\"MINOR\",\"hasValue\":true}," +
        "\"status\":\"HIGH\",\"quality\":\"Interpolated\"," +
        "\"metaData\":{\"type\":\"numeric\",\"precision\":0,\"units\":\"V\"," +
        "\"displayLow\":-20.0,\"displayHigh\":50.0,\"warnLow\":-10.0,\"warnHigh\":100.0," +
        "\"alarmLow\":-15.0,\"alarmHigh\":99.5}," +
        "\"type\":\"minMaxDouble\",\"value\":[35.0],\"minimum\":20.0,\"maximum\":50.0}")
  }
}
