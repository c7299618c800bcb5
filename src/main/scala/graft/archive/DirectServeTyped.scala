package graft.archive

import java.io.StringWriter

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.JsonFactory
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter,
  PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.{GroupType, MessageType, PrimitiveType, Type}
import org.apache.spark.sql.SparkSession

/** [[DirectServe]] for TYPED-UNION stores — the reference's ONLY
  * serving path (every CA sample family, enum states, array elements,
  * aggregated minMaxDouble, markers) answered from driver-side
  * manifest-pruned row-group reads with zero Spark jobs. With the
  * EPICS ingest bridge landing migrated archives as typed stores, this
  * is the path a migrated site's dashboards actually hit.
  *
  * Envelope: raw level (the planner's choice for count-less requests
  * and most count-driven ones), ManifestBackend, the typed-union
  * schema. Decimated-level serves and anything else falls back to the
  * engine. Byte-identity with [[ArchiveServer.serveJsonTyped]] (the
  * `to_json` wire) is gated by DirectServeTypedSpec over the full
  * 21-tag synthetic frame and the EPICS migration fixture — the JSON
  * here is written with the SAME Jackson core Spark's JacksonGenerator
  * uses, field for field in `JsonV1.serializeTyped`'s struct order,
  * with `to_json`'s null-field omission.
  */
object DirectServeTyped {

  import DirectServe.LimitReach

  /** One decoded typed sample — only the columns the wire format
    * serializes. Reference types: ChannelAccessSampleValueAccess.java
    * :86-211 (the engine's TypedSamples column contract).
    */
  private final case class TRow(
      ts: Long, vtype: String,
      value: java.lang.Double, strValue: String,
      enumValue: java.lang.Integer, labels: IndexedSeq[String],
      arrNum: IndexedSeq[java.lang.Double], arrStr: IndexedSeq[String],
      aggMean: java.lang.Double, aggMin: java.lang.Double,
      aggMax: java.lang.Double,
      severity: java.lang.Integer, status: java.lang.Integer,
      metaUnits: String, metaPrecision: java.lang.Integer,
      dLow: java.lang.Double, dHigh: java.lang.Double,
      wLow: java.lang.Double, wHigh: java.lang.Double,
      aLow: java.lang.Double, aHigh: java.lang.Double,
      // arrival id — only the duplicate-timestamp survivor tiebreak
      // (first arrival = min sample_id, the engine rule); 0 when the
      // file predates the column
      sid: Long = 0L)

  /** The full config-governed typed serve
    * ([[ConfiguredArchive.serveJsonTyped]]'s contract), or None when
    * out of envelope. Same typed error signals as the engine path.
    */
  def tryServe(spark: SparkSession, configPath: String, storePath: String,
               name: String, startNs: Long, endNs: Long,
               count: Option[Long], backend: StoreBackend,
               refuseDisabled: Boolean): Option[Iterator[String]] =
    // vacuum race: re-resolve the latest version and retry once on a
    // missing data file (see DirectServe.tryServe)
    try tryServeOnce(spark, configPath, storePath, name, startNs, endNs,
      count, backend, refuseDisabled)
    catch {
      case _: java.io.FileNotFoundException =>
        DirectServe.invalidateStore(storePath)
        tryServeOnce(spark, configPath, storePath, name, startNs, endNs,
          count, backend, refuseDisabled)
    }

  private def tryServeOnce(spark: SparkSession, configPath: String,
               storePath: String,
               name: String, startNs: Long, endNs: Long,
               count: Option[Long], backend: StoreBackend,
               refuseDisabled: Boolean): Option[Iterator[String]] = {
    if (!(backend eq ManifestBackend)) return None
    val version = ManifestStore.latestVersion(spark, storePath)
      .getOrElse(return None)
    val manifest = DirectServe.manifestAt(spark, storePath, version)
    val schema = manifest.schema
    val names = schema.fieldNames.toSet
    if (!names.contains("vtype") || !names.contains("channel") ||
        !names.contains("ts")) return None
    import org.apache.spark.sql.types.{LongType, StringType}
    if (schema("ts").dataType != LongType ||
        schema("channel").dataType != StringType ||
        schema("vtype").dataType != StringType) return None
    val cfg = ConfiguredArchive.resolveServable(spark, configPath, name,
      refuseDisabled)
    val channel = cfg.channelDataId
    val allowed = cfg.levels.keySet + 0L
    try {
      val states = DirectServe.levelStatesOf(spark, storePath, version,
          manifest, channel)
        .filter(s => allowed.contains(s.periodSec))
      if (states.isEmpty) return Some(Iterator.empty)
      val level = ResolutionPlanner.selectLevel(states.map(_.periodSec),
        startNs, endNs, count)
      if (level != 0L) return None // decimated typed serve → engine
      val entries = manifest.files.filter(_.levelSec == 0L)
      val conf = spark.sparkContext.hadoopConfiguration
      val cache = mutable.Map.empty[String, IndexedSeq[TRow]]
      // decoded-row-group budget, like the scalar path's: a request
      // whose window is a real scan belongs to the engine, not the
      // serving driver
      val groupsLeft = new java.util.concurrent.atomic.AtomicInteger(64)
      def fileRows(e: ManifestStore.FileEntry): IndexedSeq[TRow] =
        cache.getOrElseUpdate(e.path,
          decodeTypedFile(conf,
            DirectServe.resolveDataPath(storePath, e.path), channel,
            groupsLeft))
      def mayContain(e: ManifestStore.FileEntry): Boolean =
        ManifestStore.chRangeContains(e.chMin, e.chMax, channel)

      // inner strict bounds + unconditional walk-back boundaries with
      // the engine probe's geometric reach (spans 1,2,…,2048 days —
      // 4096 > the 3650-day clamp), then ts-dedup and sort — exactly
      // ArchiveServer.serveJsonTyped's assembly
      val rows = mutable.ArrayBuffer.empty[TRow]
      entries.filter(e => mayContain(e) &&
          e.maxTs > startNs && e.minTs < endNs)
        .foreach(e => rows ++= fileRows(e)
          .filter(r => r.ts > startNs && r.ts < endNs))
      val reach = LimitReach
      // boundary tiebreak at equal ts: first arrival (min sample_id) —
      // the engine survivor rule; stop conditions strict so a file that
      // merely TIES the best ts still gets scanned for an earlier
      // arrival
      def lastAtOrBefore(t: Long): Option[TRow] = {
        var best: Option[TRow] = None
        val it = entries.filter(e => mayContain(e) && e.minTs <= t &&
            e.maxTs >= t - reach)
          .sortBy(e => -e.maxTs).iterator
        var done = false
        while (it.hasNext && !done) {
          val e = it.next()
          if (best.exists(_.ts > e.maxTs)) done = true
          else {
            // walk back to the boundary ts, then sweep ITS cluster only
            val rit = fileRows(e).reverseIterator
              .dropWhile(r => r.ts > t)
            if (rit.hasNext) {
              val first = rit.next()
              if (first.ts >= t - reach) {
                val bt = first.ts
                (Iterator(first) ++ rit.takeWhile(_.ts == bt)).foreach { h =>
                  if (best.forall(b => h.ts > b.ts ||
                      (h.ts == b.ts && h.sid < b.sid))) best = Some(h)
                }
              }
            }
          }
        }
        best
      }
      def firstAtOrAfter(t: Long): Option[TRow] = {
        var best: Option[TRow] = None
        val it = entries.filter(e => mayContain(e) && e.maxTs >= t &&
            e.minTs <= t + reach)
          .sortBy(_.minTs).iterator
        var done = false
        while (it.hasNext && !done) {
          val e = it.next()
          if (best.exists(_.ts < e.minTs)) done = true
          else {
            val fit = fileRows(e).iterator.dropWhile(r => r.ts < t)
            if (fit.hasNext) {
              val first = fit.next()
              if (first.ts <= t + reach) {
                val bt = first.ts
                (Iterator(first) ++ fit.takeWhile(_.ts == bt)).foreach { h =>
                  if (best.forall(b => h.ts < b.ts ||
                      (h.ts == b.ts && h.sid < b.sid))) best = Some(h)
                }
              }
            }
          }
        }
        best
      }
      rows ++= lastAtOrBefore(startNs)
      rows ++= firstAtOrAfter(endNs)
      // duplicate timestamps collapse to the first arrival (min
      // sample_id) — the engine path's survivor rule
      val sorted = rows.sortBy(r => (r.ts, r.sid))
      val out = mutable.ArrayBuffer.empty[TRow]
      var lastTs = Long.MinValue
      var any = false
      sorted.foreach { r =>
        if (!any || r.ts != lastTs) { out += r; lastTs = r.ts; any = true }
      }
      Some(out.iterator.map(jsonOf))
    } catch {
      case _: DirectServe.FallbackException => None
    }
  }

  // ---- typed parquet decode -----------------------------------------

  // ChannelConverter / LongConverter / DoubleConverter are SHARED with
  // the scalar path (one definition of the dictionary-aware channel
  // match); only the string and int32 primitives are typed-only.
  private type ChConv = DirectServe.ChannelConverter
  private type LongConv = DirectServe.LongConverter
  private type DblConv = DirectServe.DoubleConverter

  private final class StrConv extends PrimitiveConverter {
    var v: String = _
    override def addBinary(b: Binary): Unit = v = b.toStringUsingUTF8
  }
  private final class IntConv extends PrimitiveConverter {
    var set = false; var v = 0
    override def addInt(x: Int): Unit = { set = true; v = x }
  }

  /** Spark's 3-level list layout: group (LIST) { repeated group list {
    * optional element } } — elements may be null.
    */
  private final class DblListConv extends GroupConverter {
    var buf: mutable.ArrayBuffer[java.lang.Double] = _
    private val elem = new DblConv
    private val inner: GroupConverter = new GroupConverter {
      def getConverter(i: Int): Converter = elem
      def start(): Unit = elem.set = false
      def end(): Unit =
        buf += (if (elem.set) java.lang.Double.valueOf(elem.v) else null)
    }
    def getConverter(i: Int): Converter = inner
    def start(): Unit = buf = mutable.ArrayBuffer.empty
    def end(): Unit = ()
  }
  private final class StrListConv extends GroupConverter {
    var buf: mutable.ArrayBuffer[String] = _
    private val elem = new StrConv
    private val inner: GroupConverter = new GroupConverter {
      def getConverter(i: Int): Converter = elem
      def start(): Unit = elem.v = null
      def end(): Unit = buf += elem.v
    }
    def getConverter(i: Int): Converter = inner
    def start(): Unit = buf = mutable.ArrayBuffer.empty
    def end(): Unit = ()
  }

  /** Decode every row of `channel` in one typed-store file, in file
    * order (ts-ascending per the write clustering, defensively
    * sorted by the caller's merge). Missing optional columns decode
    * as null. Row groups / pages without the channel never decode.
    */
  private def decodeTypedFile(conf: org.apache.hadoop.conf.Configuration,
                              file: String, channel: String,
                              groupsLeft: java.util.concurrent.atomic
                                .AtomicInteger)
      : IndexedSeq[TRow] = {
    val want = Seq("channel", "ts", "vtype", "value", "str_value",
      "enum_value", "labels", "arr_num", "arr_str",
      "agg_mean", "agg_min", "agg_max", "severity", "status",
      "meta_units", "meta_precision", "meta_display_low",
      "meta_display_high", "meta_warn_low", "meta_warn_high",
      "meta_alarm_low", "meta_alarm_high", "sample_id")
    val chBin = Binary.fromString(channel)
    val path = new Path(file)
    val opts = HadoopReadOptions.builder(conf, path)
      .withRecordFilter(FilterCompat.get(
        FilterApi.eq(FilterApi.binaryColumn("channel"), chBin)))
      .build()
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf),
      opts)
    val out = mutable.ArrayBuffer.empty[TRow]
    try {
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      val present = want.filter(fileSchema.containsField)
      if (!present.contains("channel") || !present.contains("ts") ||
          !present.contains("vtype"))
        throw new DirectServe.FallbackException
      val fields: Seq[Type] = present.map(n =>
        fileSchema.getFields.get(fileSchema.getFieldIndex(n)))
      val proj = new MessageType("proj", fields: _*)
      reader.setRequestedSchema(proj)
      val idx = present.zipWithIndex.toMap
      val convs: Array[Converter] = fields.map { f =>
        f.getName match {
          case "channel" => new ChConv(chBin)
          case _ if f.isPrimitive =>
            f.asPrimitiveType().getPrimitiveTypeName match {
              case PrimitiveType.PrimitiveTypeName.INT64 => new LongConv
              case PrimitiveType.PrimitiveTypeName.INT32 => new IntConv
              case PrimitiveType.PrimitiveTypeName.DOUBLE => new DblConv
              case PrimitiveType.PrimitiveTypeName.BINARY => new StrConv
              case _ => throw new DirectServe.FallbackException
            }
          case _ =>
            // list column: double elements for arr_num, strings else
            val elemIsDouble = {
              def leaf(t: Type): PrimitiveType.PrimitiveTypeName = t match {
                case p if p.isPrimitive => p.asPrimitiveType()
                  .getPrimitiveTypeName
                case g: GroupType => leaf(g.getFields.get(0))
              }
              leaf(f) == PrimitiveType.PrimitiveTypeName.DOUBLE
            }
            if (elemIsDouble) new DblListConv else new StrListConv
        }
      }.toArray
      def prim[A <: Converter](n: String): Option[A] =
        idx.get(n).map(i => convs(i).asInstanceOf[A])
      val ch = prim[ChConv]("channel").get
      val tsC = prim[LongConv]("ts").get
      val vt = prim[StrConv]("vtype").get
      val valueC = prim[DblConv]("value")
      val strC = prim[StrConv]("str_value")
      val enumC = prim[IntConv]("enum_value")
      val labelsC = prim[StrListConv]("labels")
      val arrNumC = prim[DblListConv]("arr_num")
      val arrStrC = prim[StrListConv]("arr_str")
      val aggMeanC = prim[DblConv]("agg_mean")
      val aggMinC = prim[DblConv]("agg_min")
      val aggMaxC = prim[DblConv]("agg_max")
      val sevC = prim[IntConv]("severity")
      val stC = prim[IntConv]("status")
      val unitsC = prim[StrConv]("meta_units")
      val precC = prim[IntConv]("meta_precision")
      val dLoC = prim[DblConv]("meta_display_low")
      val dHiC = prim[DblConv]("meta_display_high")
      val wLoC = prim[DblConv]("meta_warn_low")
      val wHiC = prim[DblConv]("meta_warn_high")
      val aLoC = prim[DblConv]("meta_alarm_low")
      val aHiC = prim[DblConv]("meta_alarm_high")
      val sidC = prim[LongConv]("sample_id")
      // set-flag reset per row: primitives track via set/v; strings &
      // lists via null/None. A repetition the row lacks never calls
      // its converter, so reset in start().
      val listCols = convs.collect { case c: DblListConv => Left(c)
        case c: StrListConv => Right(c) }
      val mat = new RecordMaterializer[java.lang.Void] {
        private val root: GroupConverter = new GroupConverter {
          def getConverter(i: Int): Converter = convs(i)
          def start(): Unit = {
            ch.isMatch = false
            tsC.set = false
            vt.v = null
            valueC.foreach(_.set = false)
            strC.foreach(_.v = null)
            enumC.foreach(_.set = false)
            aggMeanC.foreach(_.set = false)
            aggMinC.foreach(_.set = false)
            aggMaxC.foreach(_.set = false)
            sevC.foreach(_.set = false)
            stC.foreach(_.set = false)
            unitsC.foreach(_.v = null)
            precC.foreach(_.set = false)
            Seq(dLoC, dHiC, wLoC, wHiC, aLoC, aHiC)
              .foreach(_.foreach(_.set = false))
            sidC.foreach(_.set = false)
            listCols.foreach {
              case Left(c) => c.buf = null
              case Right(c) => c.buf = null
            }
          }
          def end(): Unit =
            if (ch.isMatch && tsC.set && vt.v != null) {
              def d(c: Option[DblConv]): java.lang.Double =
                c.filter(_.set).map(x => java.lang.Double.valueOf(x.v)).orNull
              def i(c: Option[IntConv]): java.lang.Integer =
                c.filter(_.set).map(x => java.lang.Integer.valueOf(x.v)).orNull
              out += TRow(tsC.v, vt.v, d(valueC),
                strC.map(_.v).orNull, i(enumC),
                labelsC.flatMap(c => Option(c.buf)).map(_.toIndexedSeq).orNull,
                arrNumC.flatMap(c => Option(c.buf)).map(_.toIndexedSeq).orNull,
                arrStrC.flatMap(c => Option(c.buf)).map(_.toIndexedSeq).orNull,
                d(aggMeanC), d(aggMinC), d(aggMaxC),
                i(sevC), i(stC), unitsC.map(_.v).orNull, i(precC),
                d(dLoC), d(dHiC), d(wLoC), d(wHiC), d(aLoC), d(aHiC),
                sidC.filter(_.set).map(_.v).getOrElse(0L))
            }
        }
        def getCurrentRecord: java.lang.Void = null
        def getRootConverter: GroupConverter = root
      }
      val io = new ColumnIOFactory().getColumnIO(proj)
      var pages = reader.readNextFilteredRowGroup()
      while (pages != null) {
        val n = pages.getRowCount
        if (n > 0) {
          if (groupsLeft.decrementAndGet() < 0)
            throw new DirectServe.FallbackException
          val rr = io.getRecordReader(pages, mat)
          var r = 0L
          while (r < n) { rr.read(); r += 1 }
        }
        pages = reader.readNextFilteredRowGroup()
      }
    } finally reader.close()
    if (out.length > 1) {
      var asc = true; var i = 1
      while (asc && i < out.length) {
        if (out(i - 1).ts > out(i).ts) asc = false
        i += 1
      }
      if (!asc) return out.sortBy(r => (r.ts, r.sid)).toIndexedSeq
    }
    out.toIndexedSeq
  }

  // ---- wire serialization -------------------------------------------

  private val jsonFactory = new JsonFactory()

  private val LongTags = Set("scalar_char", "scalar_short", "scalar_long",
    "array_char", "array_short", "array_long")
  private val DoubleTags = Set("scalar_double", "scalar_float",
    "array_double", "array_float")

  private def severityName(level: Int): String = level match {
    case 0 => "OK"; case 1 => "MINOR"; case 2 => "MAJOR"; case _ => "INVALID"
  }
  private def statusName(code: java.lang.Integer): String =
    if (code == null) "STATE"
    else code.intValue match {
      case 0 => "NO_ALARM"; case 1 => "READ"; case 2 => "WRITE"
      case 3 => "HIHI"; case 4 => "HIGH"; case 5 => "LOLO"; case 6 => "LOW"
      case _ => "STATE"
    }

  /** ANSI double→long cast: truncation; non-finite refuses like the
    * engine's cast error. */
  private def toLong(d: Double): Long = {
    if (d.isNaN || d.isInfinite)
      throw new ArithmeticException(
        s"[CAST_INVALID_INPUT] $d cannot be cast to BIGINT")
    d.toLong
  }

  /** One JSON v1 typed sample — [[JsonV1.serializeTyped]]'s `to_json`
    * output byte for byte: same field order, same null-field omission,
    * same Jackson number text (this IS the same Jackson core).
    */
  private def jsonOf(r: TRow): String = {
    val sw = new StringWriter(160)
    val g = jsonFactory.createGenerator(sw)
    val marker = r.vtype == "disabled" || r.vtype == "disconnected"
    g.writeStartObject()
    g.writeNumberField("time", r.ts)
    g.writeObjectFieldStart("severity")
    if (marker) {
      g.writeStringField("level", "INVALID")
      g.writeBooleanField("hasValue", false)
    } else {
      g.writeStringField("level",
        severityName(if (r.severity == null) 3 else r.severity.intValue))
      g.writeBooleanField("hasValue", true)
    }
    g.writeEndObject()
    val markerText =
      if (r.vtype == "disabled") "Archive_Disabled" else "Disconnected"
    g.writeStringField("status",
      if (marker) markerText else statusName(r.status))
    g.writeStringField("quality", "Original")

    def numericMeta(): Unit = if (r.metaUnits != null) {
      g.writeObjectFieldStart("metaData")
      g.writeStringField("type", "numeric")
      g.writeNumberField("precision",
        if (r.metaPrecision == null) 0 else r.metaPrecision.intValue)
      g.writeStringField("units", r.metaUnits)
      def f(n: String, v: java.lang.Double): Unit =
        if (v != null) g.writeNumberField(n, v.doubleValue)
      f("displayLow", r.dLow); f("displayHigh", r.dHigh)
      f("warnLow", r.wLow); f("warnHigh", r.wHigh)
      f("alarmLow", r.aLow); f("alarmHigh", r.aHigh)
      g.writeEndObject()
    }
    def longArray(): Unit =
      if (r.value != null) {
        g.writeArrayFieldStart("value")
        g.writeNumber(toLong(r.value.doubleValue))
        g.writeEndArray()
      } else if (r.arrNum != null) {
        g.writeArrayFieldStart("value")
        r.arrNum.foreach(e =>
          if (e == null) g.writeNull() else g.writeNumber(toLong(e)))
        g.writeEndArray()
      } // both null → field omitted, like to_json
    def doubleArray(): Unit =
      if (r.value != null) {
        g.writeArrayFieldStart("value")
        g.writeNumber(r.value.doubleValue)
        g.writeEndArray()
      } else if (r.arrNum != null) {
        g.writeArrayFieldStart("value")
        r.arrNum.foreach(e =>
          if (e == null) g.writeNull() else g.writeNumber(e.doubleValue))
        g.writeEndArray()
      }

    if (marker) {
      g.writeStringField("type", "string")
      g.writeArrayFieldStart("value")
      g.writeString(markerText)
      g.writeEndArray()
    } else if (LongTags.contains(r.vtype)) {
      numericMeta()
      g.writeStringField("type", "long")
      longArray()
    } else if (DoubleTags.contains(r.vtype)) {
      numericMeta()
      g.writeStringField("type", "double")
      doubleArray()
    } else if (r.vtype == "scalar_enum" || r.vtype == "array_enum") {
      if (r.labels != null) {
        g.writeObjectFieldStart("metaData")
        g.writeStringField("type", "enum")
        g.writeArrayFieldStart("states")
        r.labels.foreach(s => if (s == null) g.writeNull()
          else g.writeString(s))
        g.writeEndArray()
        g.writeEndObject()
      }
      g.writeStringField("type", "enum")
      if (r.enumValue != null) {
        g.writeArrayFieldStart("value")
        g.writeNumber(r.enumValue.longValue)
        g.writeEndArray()
      } else if (r.arrNum != null) {
        g.writeArrayFieldStart("value")
        r.arrNum.foreach(e =>
          if (e == null) g.writeNull() else g.writeNumber(toLong(e)))
        g.writeEndArray()
      }
    } else if (r.vtype == "scalar_string" || r.vtype == "array_string") {
      g.writeStringField("type", "string")
      if (r.strValue != null) {
        g.writeArrayFieldStart("value")
        g.writeString(r.strValue)
        g.writeEndArray()
      } else if (r.arrStr != null) {
        g.writeArrayFieldStart("value")
        r.arrStr.foreach(s => if (s == null) g.writeNull()
          else g.writeString(s))
        g.writeEndArray()
      }
    } else if (r.vtype.startsWith("aggregated_")) {
      numericMeta()
      g.writeStringField("type", "minMaxDouble")
      g.writeArrayFieldStart("value")
      if (r.aggMean == null) g.writeNull()
      else g.writeNumber(r.aggMean.doubleValue)
      g.writeEndArray()
      if (r.aggMin != null) g.writeNumberField("minimum",
        r.aggMin.doubleValue)
      if (r.aggMax != null) g.writeNumberField("maximum",
        r.aggMax.doubleValue)
    } else {
      // unknown tag: the engine's otherwise-branch serializes a
      // marker — an unknown tag here is a store this path does not
      // understand; refuse to guess
      throw new DirectServe.FallbackException
    }
    g.writeEndObject()
    g.close()
    sw.toString
  }
}
