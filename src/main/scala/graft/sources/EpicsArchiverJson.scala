package graft.sources

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** EPICS migration ingest: the Archiver Appliance's documented JSON
  * retrieval format (`/retrieval/data/getData.json` — an array of
  * per-PV objects `{"meta":{"name":…},"data":[{"secs":…,"val":…,
  * "nanos":…,"severity":…,"status":…},…]}`) decoded onto this
  * engine's 21-type value union, so a site running the Appliance (or
  * exporting CA history through it) can land its archive in the typed
  * store and serve it unchanged. Fresh implementation of the
  * CONTRACT; the CA type semantics mirror the reference's sample
  * model (ChannelAccessSampleValueAccess.java:86-211 — the scalar
  * char/short/long/float/double families, enum with states, string,
  * and the waveform (array) forms of each).
  *
  * Type resolution: the per-PV `meta.DBRType` (the Appliance's
  * ArchDBRTypes enum name, e.g. `DBR_SCALAR_DOUBLE`,
  * `DBR_WAVEFORM_INT`) decides the family; without it the value
  * SHAPE infers the widest family (number → scalar_double, string →
  * scalar_string, arrays likewise) — lossless, since JSON numbers
  * carry no width. `meta.EGU`/`meta.PREC` map onto the numeric
  * metadata block; `meta.enum_strs` onto enum states.
  *
  * Scale shape: one distributed `binaryFile` scan of the export
  * directory, per-file Jackson decode in a flatMap (the same
  * justified imperative boundary as the image/audio codecs — a
  * per-PV export file is MBs, never a shuffle hazard), output in the
  * typed-union schema ready for [[graft.archive.Cascade.materializeTyped]].
  */
object EpicsArchiverJson {

  /** ArchDBRTypes name → engine vtype. EPICS names the 32-bit integer
    * "INT" at the wire level but the CA client type is DBR_LONG — the
    * engine's scalar_long — and BYTE is the char family, exactly the
    * reference's mapping.
    */
  val DbrToVtype: Map[String, String] = Map(
    "DBR_SCALAR_STRING" -> "scalar_string",
    "DBR_SCALAR_SHORT" -> "scalar_short",
    "DBR_SCALAR_FLOAT" -> "scalar_float",
    "DBR_SCALAR_ENUM" -> "scalar_enum",
    "DBR_SCALAR_BYTE" -> "scalar_char",
    "DBR_SCALAR_INT" -> "scalar_long",
    "DBR_SCALAR_DOUBLE" -> "scalar_double",
    "DBR_WAVEFORM_STRING" -> "array_string",
    "DBR_WAVEFORM_SHORT" -> "array_short",
    "DBR_WAVEFORM_FLOAT" -> "array_float",
    "DBR_WAVEFORM_ENUM" -> "array_enum",
    "DBR_WAVEFORM_BYTE" -> "array_char",
    "DBR_WAVEFORM_INT" -> "array_long",
    "DBR_WAVEFORM_DOUBLE" -> "array_double")

  /** One decoded sample in the typed-union row shape (the
    * [[graft.core.TypedSamples]] column contract; aggregated_* and
    * marker families never occur in an Appliance export — those are
    * engine-side derivations).
    */
  case class Sample(
      channel: String, ts: Long, vtype: String,
      value: Option[Double], str_value: Option[String],
      enum_value: Option[Int], labels: Option[Seq[String]],
      arr_num: Option[Seq[Double]], arr_str: Option[Seq[String]],
      agg_mean: Option[Double], agg_std: Option[Double],
      agg_min: Option[Double], agg_max: Option[Double],
      agg_cov: Option[Double],
      severity: Option[Int], status: Option[Int],
      meta_units: Option[String], meta_precision: Option[Int],
      meta_display_low: Option[Double], meta_display_high: Option[Double],
      meta_warn_low: Option[Double], meta_warn_high: Option[Double],
      meta_alarm_low: Option[Double], meta_alarm_high: Option[Double],
      meta_control_low: Option[Double], meta_control_high: Option[Double],
      sample_id: Long, ts_raw: Long)

  /** Read every `*.json` export file under `path` into the typed-union
    * frame. Distributed: one task per file batch; decode is per-file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => parseExport(new String(bytes, StandardCharsets.UTF_8)))
      .toDF()
  }

  /** Decode one export document (the getData.json response body). */
  def parseExport(json: String): Seq[Sample] = {
    val root = new ObjectMapper().readTree(json)
    require(root.isArray, "an Appliance export is a JSON array of PV objects")
    root.elements().asScala.flatMap(parsePv).toSeq
  }

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText())
  private def optInt(n: JsonNode, f: String): Option[Int] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asInt())

  private def parsePv(pv: JsonNode): Seq[Sample] = {
    val meta = pv.get("meta")
    require(meta != null && meta.has("name"),
      "PV object must carry meta.name")
    val name = meta.get("name").asText()
    val dbr = optText(meta, "DBRType")
    val egu = optText(meta, "EGU")
    // the Appliance serializes PREC as a string field
    val prec = optText(meta, "PREC").flatMap(_.toDoubleOption)
      .map(_.toInt)
    val enumStrs = Option(meta.get("enum_strs")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSeq)
    val data = pv.get("data")
    if (data == null || !data.isArray) return Nil
    data.elements().asScala.map { d =>
      val secs = d.get("secs").asLong()
      val nanos = Option(d.get("nanos")).map(_.asLong()).getOrElse(0L)
      val ts = secs * 1000000000L + nanos
      val v = d.get("val")
      val vtype = dbr.map(t => DbrToVtype.getOrElse(t,
          throw new IllegalArgumentException(s"unknown DBRType '$t'")))
        .getOrElse(inferVtype(v, enumStrs))
      val sev = optInt(d, "severity")
      val st = optInt(d, "status")
      build(name, ts, vtype, v, enumStrs, egu, prec, sev, st)
    }.toSeq
  }

  /** No DBRType: infer the widest family from the value shape. */
  private def inferVtype(v: JsonNode,
                         enumStrs: Option[Seq[String]]): String =
    if (v.isArray) {
      val first = v.elements().asScala.toSeq.headOption
      if (first.exists(_.isTextual)) "array_string" else "array_double"
    }
    else if (v.isTextual) "scalar_string"
    else if (enumStrs.isDefined) "scalar_enum"
    else "scalar_double"

  private def build(name: String, ts: Long, vtype: String, v: JsonNode,
                    enumStrs: Option[Seq[String]], egu: Option[String],
                    prec: Option[Int], sev: Option[Int],
                    st: Option[Int]): Sample = {
    def nums: Seq[Double] = v.elements().asScala.map(_.asDouble()).toSeq
    val (value, strValue, enumValue, labels, arrNum, arrStr) = vtype match {
      case "scalar_double" =>
        (Some(v.asDouble()), None, None, None, None, None)
      case "scalar_float" =>
        // float storage width: round-trip through Float exactly like a
        // CA float payload promoted to double
        (Some(v.asDouble().toFloat.toDouble), None, None, None, None, None)
      case "scalar_long" | "scalar_short" | "scalar_char" =>
        (Some(v.asLong().toDouble), None, None, None, None, None)
      case "scalar_enum" =>
        (None, None, Some(v.asInt()), enumStrs, None, None)
      case "scalar_string" =>
        (None, Some(v.asText()), None, None, None, None)
      case "array_double" =>
        (None, None, None, None, Some(nums), None)
      case "array_float" =>
        (None, None, None, None,
          Some(nums.map(x => x.toFloat.toDouble)), None)
      case "array_long" | "array_short" | "array_char" =>
        (None, None, None, None,
          Some(v.elements().asScala.map(_.asLong().toDouble).toSeq), None)
      case "array_enum" =>
        (None, None, None, enumStrs,
          Some(v.elements().asScala.map(_.asLong().toDouble).toSeq), None)
      case "array_string" =>
        (None, None, None, None, None,
          Some(v.elements().asScala.map(_.asText()).toSeq))
      case other =>
        throw new IllegalArgumentException(s"unmappable vtype '$other'")
    }
    assemble(name, ts, vtype, value, strValue, enumValue, labels, arrNum,
      arrStr, egu, prec, sev, st)
  }

  /** Typed payload → union row, the shared tail of both Appliance
    * bridges (JSON and PB decode to identical rows by construction):
    * enums carry states, never the numeric block
    * (JsonV1SampleSerializer.java:373,451's split).
    */
  private[sources] def assemble(name: String, ts: Long, vtype: String,
      value: Option[Double], strValue: Option[String],
      enumValue: Option[Int], labels: Option[Seq[String]],
      arrNum: Option[Seq[Double]], arrStr: Option[Seq[String]],
      egu: Option[String], prec: Option[Int],
      sev: Option[Int], st: Option[Int]): Sample = {
    val numeric = value.isDefined ||
      (arrNum.isDefined && vtype != "array_enum")
    val floating = Set("scalar_double", "scalar_float", "array_double",
      "array_float").contains(vtype)
    Sample(name, ts, vtype, value, strValue, enumValue, labels, arrNum,
      arrStr, None, None, None, None, None,
      sev.orElse(Some(0)), st.orElse(Some(0)),
      if (numeric) egu else None,
      if (floating) prec else None,
      None, None, None, None, None, None, None, None,
      sample_id = ts, ts_raw = ts)
  }

  // ---- deterministic fixture (shared by the gate and its oracle) ----

  /** Write a deterministic export fixture: `pvs` PVs × `n` samples
    * covering the scalar families, enum, string, and a waveform, with
    * EGU/PREC on every even PV. Formulas are engine-portable integers
    * and halves so the DuckDB oracle regenerates the identical rows
    * (OracleSqlTyped mirrors each).
    */
  def writeFixture(dir: String, pvs: Int = 8, n: Int = 60): Unit = {
    val root = new java.io.File(dir)
    root.mkdirs()
    val sb = new StringBuilder("[")
    for (p <- 0 until pvs) {
      if (p > 0) sb.append(',')
      val t = p % 8
      val dbr = Seq("DBR_SCALAR_DOUBLE", "DBR_SCALAR_FLOAT",
        "DBR_SCALAR_INT", "DBR_SCALAR_SHORT", "DBR_SCALAR_BYTE",
        "DBR_SCALAR_ENUM", "DBR_SCALAR_STRING", "DBR_WAVEFORM_DOUBLE")(t)
      sb.append(s"""{"meta":{"name":"epics:pv$p","DBRType":"$dbr"""")
      if (p % 2 == 0 && t != 6) sb.append(""","EGU":"mm","PREC":"2"""")
      if (t == 5) sb.append(""","enum_strs":["Off","On","Fault"]""")
      sb.append("""},"data":[""")
      for (j <- 0 until n) {
        if (j > 0) sb.append(',')
        val secs = 1704067200L + j * 60L + p
        val nanos = j * 1000L
        val x = p * 1000 + j
        val valJson = t match {
          case 0 => (x * 0.25).toString
          case 1 => (x * 0.5).toString
          case 2 => (x - 500).toString
          case 3 => (((p * 13 + j) % 200) - 100).toString
          case 4 => (((p * 7 + j) % 256) - 128).toString
          case 5 => (j % 3).toString
          case 6 => s""""s${p}_$j""""
          case _ => s"[${x * 0.25},${x * 0.125},${-x * 0.25}]"
        }
        sb.append(s"""{"secs":$secs,"val":$valJson,"nanos":$nanos,""" +
          s""""severity":${j % 4},"status":${j % 8}}""")
      }
      sb.append("]}")
    }
    sb.append("]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/export.json"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
  }
}
