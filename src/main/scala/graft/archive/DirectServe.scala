package graft.archive

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.Dictionary
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter,
  PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.spark.sql.SparkSession

/** Driver-side point-read serving — the cold-path latency fix for the
  * single-channel serve (the reference answers these from Cassandra
  * point reads in milliseconds, ArchiveAccessServiceImpl.java:756-938;
  * the DataFrame path pays several Spark job round trips per request,
  * ~0.4 s even on a warm session).
  *
  * For a scalar [[ManifestBackend]] store, a single-channel request
  * whose plan resolves to ONE segment needs no cluster at all: the
  * manifest gives the pruned file list driver-side (level + ts-range +
  * clustering-key range), parquet row-group stats prune inside each
  * file, and the surviving row groups decode on the driver — the same
  * rows a cluster read would funnel through the driver anyway, minus
  * every job-scheduling round trip. Anything outside that envelope
  * (typed stores, multi-segment retention fallback, non-manifest
  * backends, more row groups than the per-request budget) falls back
  * to the DataFrame path, so this is strictly a fast path, never a
  * different answer — byte-identity with the Spark path is gated by
  * DirectServeSpec across boundary modes, nulls, non-finite doubles
  * and multi-commit duplicate timestamps.
  *
  * Scale note: this is a LATENCY path for interactive dashboards, not
  * a throughput path — per-request work is O(row groups containing the
  * channel in the requested window), bounded by [[MaxDecodedGroups]]
  * regardless of store size; scans and aggregates stay on the engine.
  */
object DirectServe {

  import ArchiveServer.LevelState
  import ArchiveReader.{AtOrWidened, Exact, LimitMode}

  /** Abort signal: out of the fast path's envelope — caught by
    * [[tryServe]] (and [[DirectServeTyped]]), which returns None so
    * the caller falls back. */
  private[archive] final class FallbackException extends RuntimeException(
    null, null, false, false)

  /** The engine boundary probe's geometric reach: spans of 1, 2, …,
    * 2048 days (4096 would exceed the 3650-day default clamp), so a
    * boundary farther than 2048 days from the bound is NOT found —
    * the fast paths must stop at the same distance or they would
    * serve a sample the engine's walk never reaches.
    */
  private[archive] val LimitReach: Long = 2048L * 86400L * 1000000000L

  /** The memoized manifest at a version — shared with the typed path.
    * Eviction happens OUTSIDE the mapping function (CHM forbids
    * mutating other mappings from inside computeIfAbsent).
    */
  private[archive] def manifestAt(spark: SparkSession, storePath: String,
                                  version: Long): ManifestStore.Manifest = {
    val key = (storePath, version)
    val hit = manifestMemo.get(key)
    if (hit != null) return hit
    val m = ManifestStore.readManifest(spark, storePath, version)
    if (manifestMemo.size > 256) manifestMemo.clear()
    manifestMemo.put(key, m)
    m
  }

  /** Entry path → absolute data path (manifest entries are
    * root-relative). */
  private[archive] def resolveDataPath(root: String, p: String): String =
    if (p.startsWith("/") || p.contains(":/")) p else s"$root/$p"

  /** Exact per-channel level states, memoized per (store, version,
    * channel) — shared planning metadata for the scalar and typed
    * fast paths.
    */
  private[archive] def levelStatesOf(spark: SparkSession, storePath: String,
                                     version: Long,
                                     manifest: ManifestStore.Manifest,
                                     channel: String): Seq[LevelState] = {
    val key = (storePath, version, channel)
    val hit = levelStatesMemo.get(key)
    if (hit != null) hit
    else {
      val ctx = new Ctx(spark.sparkContext.hadoopConfiguration, storePath,
        channel)
      val computed = computeLevelStates(ctx, manifest)
      if (levelStatesMemo.size > 8192) levelStatesMemo.clear()
      levelStatesMemo.put(key, computed)
      computed
    }
  }

  /** Decoded-row-group budget per request: a request that would decode
    * more groups than this (pathological fragmentation, or a window so
    * wide the read is a real scan) is the DataFrame engine's job.
    */
  private val MaxDecodedGroups = 64

  private val manifestMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), ManifestStore.Manifest]()
  private val levelStatesMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, String), Seq[LevelState]]()

  // a store deleted and recreated at the same path restarts version
  // numbering — (path, version) keys would serve the DEAD store's
  // manifest; ManifestStore detects the regression and purges us
  ManifestStore.onVersionRegression { path =>
    manifestMemo.keySet.removeIf(_._1 == path)
    levelStatesMemo.keySet.removeIf(_._1 == path)
  }

  /** One request's decode state: per-(file, projection) row cache (the
    * inner scan and both boundary lookups often hit the same day file)
    * plus the decoded-group budget.
    */
  /** Decoded row: (ts, value, sample_id). sample_id participates only
    * as the duplicate-timestamp tiebreak (first arrival = min
    * sample_id wins — the querySamples survivor rule); 0 when the
    * projection doesn't decode it (planning) or the file lacks it.
    */
  private[archive] type DRow = (Long, java.lang.Double, Long)

  private final class Ctx(val conf: Configuration, val root: String,
                          val channel: String) {
    val fileRows = mutable.Map.empty[
      (String, Option[String]), IndexedSeq[DRow]]
    var groupsDecoded = 0
  }

  /** The full fast-path serve, or None when out of envelope. Throws the
    * SAME typed signals as the DataFrame path
    * ([[NoSuchChannelException]], [[ChannelDisabledException]],
    * [[NoStoredDataException]]) so HTTP error mapping stays
    * path-independent.
    *
    * Vacuum race: a concurrent maintenance process can delete a data
    * file between this request's version resolution and its page read
    * (only possible when the file aged past the vacuum GRACE while the
    * request ran — [[ManifestStore.vacuum]]'s reference protection
    * covers anything younger). On a missing file the serve purges the
    * store's memos, re-resolves the LATEST version, and retries once —
    * the fresh manifest no longer references the deleted file.
    */
  def tryServe(spark: SparkSession, configPath: String, storePath: String,
               name: String, startNs: Long, endNs: Long,
               count: Option[Long],
               backend: StoreBackend,
               loMode: Option[LimitMode],
               hiMode: Option[LimitMode],
               refuseDisabled: Boolean): Option[Iterator[String]] =
    try tryServeOnce(spark, configPath, storePath, name, startNs, endNs,
      count, backend, loMode, hiMode, refuseDisabled)
    catch {
      case _: java.io.FileNotFoundException =>
        invalidateStore(storePath)
        tryServeOnce(spark, configPath, storePath, name, startNs, endNs,
          count, backend, loMode, hiMode, refuseDisabled)
    }

  /** Drop this JVM's cached planning metadata for one store — the
    * missing-file re-resolve path. */
  private[archive] def invalidateStore(storePath: String): Unit = {
    manifestMemo.keySet.removeIf(_._1 == storePath)
    levelStatesMemo.keySet.removeIf(_._1 == storePath)
  }

  private def tryServeOnce(spark: SparkSession, configPath: String,
               storePath: String,
               name: String, startNs: Long, endNs: Long,
               count: Option[Long],
               backend: StoreBackend,
               loMode: Option[LimitMode],
               hiMode: Option[LimitMode],
               refuseDisabled: Boolean): Option[Iterator[String]] = {
    if (!(backend eq ManifestBackend)) return None
    val version = ManifestStore.latestVersion(spark, storePath)
      .getOrElse(return None)
    val manifest = manifestAt(spark, storePath, version)
    val schema = manifest.schema
    val names = schema.fieldNames.toSet
    // scalar stores only: the typed union serves through serveJsonTyped
    if (names.contains("vtype") || !names.contains("channel") ||
        !names.contains("ts") || !names.contains("value")) return None
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    if (schema("value").dataType != DoubleType ||
        schema("ts").dataType != LongType ||
        schema("channel").dataType != StringType) return None

    // same config resolution (and the same typed refusals) as the
    // DataFrame path
    val cfg = ConfiguredArchive.resolveServable(spark, configPath, name,
      refuseDisabled)
    val channel = cfg.channelDataId
    val allowed = cfg.levels.keySet + 0L
    val ctx = new Ctx(spark.sparkContext.hadoopConfiguration, storePath,
      channel)
    try {
      val states = levelStatesOf(spark, storePath, version, manifest,
        channel)
      val usable = states.filter(s => allowed.contains(s.periodSec))
      if (usable.isEmpty) throw new NoStoredDataException(name)
      val chosen = ResolutionPlanner.selectLevel(
        usable.map(_.periodSec), startNs, endNs, count)
      val segments0 = ResolutionPlanner.fallbackSegments(chosen,
        usable.map(s => s.periodSec -> s.earliestTs).toMap,
        usable.map(_.periodSec).filter(_ > chosen), startNs, endNs)
      // a request entirely before the channel's first sample plans to
      // zero segments — serve the empty range so the widened upper
      // bound still returns its boundary sample (the
      // ArchiveServer.querySamples empty-segments rule)
      val segments =
        if (segments0.isEmpty) Seq((chosen, startNs, endNs)) else segments0
      if (segments.size != 1) return None // retention fallback → engine
      val (period, from, to) = segments.head
      if (period != 0L &&
          (!names.contains("mean") || schema("mean").dataType != DoubleType))
        return None
      val valueCol = if (period == 0L) "value" else "mean"

      val defaultMode = if (count.isEmpty) AtOrWidened else Exact
      val effLo = loMode.getOrElse(defaultMode)
      val effHi = hiMode.getOrElse(defaultMode)
      val st = usable.find(_.periodSec == period)
      val entries = manifest.files.filter(_.levelSec == period)

      val rows = mutable.ArrayBuffer.empty[DRow]
      if (effLo == Exact && effHi == Exact)
        rows ++= rangeRows(ctx, entries, valueCol, from, to)
      else {
        // widened bounds exclude the edge from the inner scan — the
        // boundary lookup serves it (the querySamples 0/1/2 matrix)
        val lo = if (effLo == Exact) from
                 else if (from == Long.MaxValue) from else from + 1
        val hi = if (effHi == Exact) to
                 else if (to == Long.MinValue) to else to - 1
        if (lo <= hi) rows ++= rangeRows(ctx, entries, valueCol, lo, hi)
        if (effLo == AtOrWidened && st.exists(_.earliestTs <= from))
          rows ++= lastAtOrBefore(ctx, entries, valueCol, from)
        if (effHi == AtOrWidened && st.exists(_.latestTs >= to))
          rows ++= firstAtOrAfter(ctx, entries, valueCol, to)
      }
      // multi-commit duplicate timestamps collapse to the FIRST ARRIVAL
      // (min sample_id) — the engine path's survivor rule
      val sorted = rows.sortBy(r => (r._1, r._3))
      val out = mutable.ArrayBuffer.empty[DRow]
      var lastTs = Long.MinValue
      var any = false
      sorted.foreach { r =>
        if (!any || r._1 != lastTs) { out += r; lastTs = r._1; any = true }
      }
      Some(out.iterator.map(r => jsonOf(r._1, r._2)))
    } catch {
      case _: FallbackException => None
    }
  }

  /** Raw-level rows of a config-resolved channel with `ts <= hi` (and
    * `>= lo` when given), ts-ascending, duplicates across commits KEPT
    * (the DataFrame scan keeps them too — the panels' aggregates must
    * see identical multiplicity). None = out of the fast-path
    * envelope; throws the same typed signals as the engine resolution.
    * The driver-side row source for [[DirectPanels]].
    */
  private[archive] def tryRawRows(spark: SparkSession, configPath: String,
                                  storePath: String, name: String,
                                  lo: Option[Long], hi: Long,
                                  backend: StoreBackend,
                                  refuseDisabled: Boolean)
      : Option[IndexedSeq[(Long, java.lang.Double)]] = {
    if (!(backend eq ManifestBackend)) return None
    val version = ManifestStore.latestVersion(spark, storePath)
      .getOrElse(return None)
    val manifest = manifestAt(spark, storePath, version)
    val schema = manifest.schema
    val names = schema.fieldNames.toSet
    if (names.contains("vtype") || !names.contains("channel") ||
        !names.contains("ts") || !names.contains("value")) return None
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    if (schema("value").dataType != DoubleType ||
        schema("ts").dataType != LongType ||
        schema("channel").dataType != StringType) return None
    val cfg = ConfiguredArchive.resolveServable(spark, configPath, name,
      refuseDisabled)
    val ctx = new Ctx(spark.sparkContext.hadoopConfiguration, storePath,
      cfg.channelDataId)
    try {
      val entries = manifest.files.filter(_.levelSec == 0L)
      val rows = rangeRows(ctx, entries, "value",
        lo.getOrElse(Long.MinValue), hi)
      // duplicates kept (panel multiplicity); (ts, arrival) order makes
      // equal-ts neighborhoods deterministic
      Some(rows.sortBy(r => (r._1, r._3)).map(r => (r._1, r._2))
        .toIndexedSeq)
    } catch {
      case _: FallbackException => None
    }
  }

  // ---- planning ------------------------------------------------------

  /** Exact per-channel availability per level, from direct file walks:
    * candidate files (clustering-key range contains the channel) in
    * ts-stat order until no remaining file can improve the bound —
    * typically ONE file read per endpoint per level. ts-only
    * projection: the value column never decodes for planning.
    */
  private def computeLevelStates(ctx: Ctx,
                                 m: ManifestStore.Manifest): Seq[LevelState] =
    m.files.groupBy(_.levelSec).toSeq.sortBy(_._1).flatMap {
      case (level, files) =>
        val cands = files.filter(mayContain(_, ctx.channel))
        var earliest = Long.MaxValue
        for (e <- cands.sortBy(_.minTs)) {
          if (e.minTs < earliest) {
            val rows = channelRows(ctx, e, None)
            if (rows.nonEmpty && rows.head._1 < earliest)
              earliest = rows.head._1
          }
        }
        var latest = Long.MinValue
        for (e <- cands.sortBy(f => -f.maxTs)) {
          if (e.maxTs > latest) {
            val rows = channelRows(ctx, e, None)
            if (rows.nonEmpty && rows.last._1 > latest)
              latest = rows.last._1
          }
        }
        if (earliest == Long.MaxValue) None
        else Some(LevelState(level, earliest, latest))
    }

  private def mayContain(e: ManifestStore.FileEntry, ch: String): Boolean =
    ManifestStore.chRangeContains(e.chMin, e.chMax, ch)

  // ---- row assembly --------------------------------------------------

  private def rangeRows(ctx: Ctx, entries: Seq[ManifestStore.FileEntry],
                        valueCol: String, lo: Long, hi: Long)
      : Seq[DRow] =
    entries.filter(e => mayContain(e, ctx.channel) &&
        e.maxTs >= lo && e.minTs <= hi)
      .flatMap(e => channelRows(ctx, e, Some(valueCol))
        .filter(r => r._1 >= lo && r._1 <= hi))

  /** `h` beats `best` as the at-or-before boundary: later ts wins;
    * equal ts → earlier arrival (min sample_id), the survivor rule. */
  private def beatsBack(h: DRow, best: Option[DRow]): Boolean =
    best.forall(b => h._1 > b._1 || (h._1 == b._1 && h._3 < b._3))

  private def beatsFwd(h: DRow, best: Option[DRow]): Boolean =
    best.forall(b => h._1 < b._1 || (h._1 == b._1 && h._3 < b._3))

  /** The boundary lookup, manifest-pruned: files that can hold a
    * sample at-or-before `t`, newest ts-stat first, stopping as soon
    * as no remaining file can beat the best hit — the walk-back
    * probe's result without its geometric job chain. Stop conditions
    * are STRICT: a file whose ts range merely ties the best may still
    * hold an earlier arrival at the same timestamp.
    */
  private def lastAtOrBefore(ctx: Ctx, entries: Seq[ManifestStore.FileEntry],
                             valueCol: String, t: Long)
      : Option[DRow] = {
    var best: Option[DRow] = None
    val it = entries.filter(e => mayContain(e, ctx.channel) && e.minTs <= t)
      .sortBy(f => -f.maxTs).iterator
    var done = false
    while (it.hasNext && !done) {
      val e = it.next()
      if (best.exists(_._1 > e.maxTs)) done = true
      else {
        val rows = channelRows(ctx, e, Some(valueCol))
        // all rows at the candidate boundary ts (a compacted file can
        // hold same-ts rows from several source commits)
        val i = lastIndexAtOrBefore(rows, t)
        if (i >= 0) {
          val bt = rows(i)._1
          var j = i
          while (j >= 0 && rows(j)._1 == bt) {
            if (beatsBack(rows(j), best)) best = Some(rows(j))
            j -= 1
          }
        }
      }
    }
    best
  }

  /** Index of the LAST row with ts <= t in a ts-ascending seq, -1 if
    * none. */
  private def lastIndexAtOrBefore(rows: IndexedSeq[DRow], t: Long): Int = {
    var lo = 0; var hi = rows.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (rows(mid)._1 <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  private def firstAtOrAfter(ctx: Ctx, entries: Seq[ManifestStore.FileEntry],
                             valueCol: String, t: Long)
      : Option[DRow] = {
    var best: Option[DRow] = None
    val it = entries.filter(e => mayContain(e, ctx.channel) && e.maxTs >= t)
      .sortBy(_.minTs).iterator
    var done = false
    while (it.hasNext && !done) {
      val e = it.next()
      if (best.exists(_._1 < e.minTs)) done = true
      else {
        val rows = channelRows(ctx, e, Some(valueCol))
        // first index with ts >= t; then all rows at that ts (see
        // lastAtOrBefore)
        var i = lastIndexAtOrBefore(rows, t - 1) + 1
        if (i < rows.length) {
          val bt = rows(i)._1
          while (i < rows.length && rows(i)._1 == bt) {
            if (beatsFwd(rows(i), best)) best = Some(rows(i))
            i += 1
          }
        }
      }
    }
    best
  }

  // ---- parquet decode ------------------------------------------------

  /** One channel's (ts, value, sample_id) rows in one file,
    * ts-ascending, cached per request per projection (`valueCol` None =
    * planning: ts only, sample_id not decoded). Row groups whose
    * channel stats exclude the channel never decode.
    */
  private def channelRows(ctx: Ctx, e: ManifestStore.FileEntry,
                          valueCol: Option[String])
      : IndexedSeq[DRow] =
    ctx.fileRows.getOrElseUpdate((e.path, valueCol),
      decodeFile(ctx, resolveDataPath(ctx.root, e.path), valueCol))

  /** Channel-match converter: with dictionary-encoded pages (the
    * normal case for a (channel, ts)-sorted file) the comparison runs
    * ONCE per dictionary entry, then per row is an array lookup.
    * Shared with [[DirectServeTyped]].
    */
  private[archive] final class ChannelConverter(target: Binary)
      extends PrimitiveConverter {
    var isMatch = false
    private var dictMatch: Array[Boolean] = _
    override def hasDictionarySupport: Boolean = true
    override def setDictionary(d: Dictionary): Unit =
      dictMatch = Array.tabulate(d.getMaxId + 1)(
        i => d.decodeToBinary(i) == target)
    override def addValueFromDictionary(id: Int): Unit =
      isMatch = dictMatch(id)
    override def addBinary(b: Binary): Unit = isMatch = (b == target)
  }

  private[archive] final class LongConverter extends PrimitiveConverter {
    var set = false
    var v = 0L
    override def addLong(value: Long): Unit = { set = true; v = value }
  }

  private[archive] final class DoubleConverter extends PrimitiveConverter {
    var set = false
    var v = 0.0
    override def addDouble(value: Double): Unit = { set = true; v = value }
  }

  /** Zero-allocation row sink: primitives land in field converters and
    * `end()` appends the row iff the channel matched — no per-row
    * Group objects (the example GroupRecordConverter was the decode
    * bottleneck: ~300 k materialized rows to keep ~1 k).
    * Projection order: channel, ts, [value], [sample_id].
    */
  private final class RowsMaterializer(chBin: Binary, hasValue: Boolean,
      hasSid: Boolean, out: mutable.ArrayBuffer[DRow])
      extends RecordMaterializer[java.lang.Void] {
    private val ch = new ChannelConverter(chBin)
    private val ts = new LongConverter
    private val dv = new DoubleConverter
    private val sid = new LongConverter
    private val sidIdx = if (hasValue) 3 else 2
    private val root: GroupConverter = new GroupConverter {
      def getConverter(i: Int): Converter =
        if (i == 0) ch else if (i == 1) ts
        else if (hasSid && i == sidIdx) sid else dv
      def start(): Unit = { ch.isMatch = false; ts.set = false
        dv.set = false; sid.set = false }
      def end(): Unit =
        if (ch.isMatch && ts.set)
          out += ((ts.v,
            if (hasValue && dv.set) java.lang.Double.valueOf(dv.v) else null,
            if (hasSid && sid.set) sid.v else 0L))
    }
    def getCurrentRecord: java.lang.Void = null
    def getRootConverter: GroupConverter = root
  }

  private val debugTiming = sys.env.contains("GRAFT_DIRECT_DEBUG")

  private def decodeFile(ctx: Ctx, file: String, valueCol: Option[String])
      : IndexedSeq[DRow] = {
    val dbg0 = if (debugTiming) System.nanoTime() else 0L
    var dbgOpened = 0L
    var dbgRows = 0L
    val out = mutable.ArrayBuffer.empty[DRow]
    val chBin = Binary.fromString(ctx.channel)
    val path = new Path(file)
    // the record filter drives row-group stats AND column-index page
    // skipping inside the reader: only pages whose channel range can
    // contain the target decode at all (parquet compares binary stats
    // in unsigned-byte order — correct at the byte level regardless of
    // locale, unlike a driver-side string compare)
    val opts = HadoopReadOptions.builder(ctx.conf, path)
      .withRecordFilter(FilterCompat.get(
        FilterApi.eq(FilterApi.binaryColumn("channel"), chBin)))
      .build()
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(path, ctx.conf), opts)
    if (debugTiming) dbgOpened = System.nanoTime()
    try {
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      if (!fileSchema.containsField("channel") ||
          !fileSchema.containsField("ts") ||
          !valueCol.forall(fileSchema.containsField))
        throw new FallbackException
      def fieldOf(n: String): org.apache.parquet.schema.Type =
        fileSchema.getFields.get(fileSchema.getFieldIndex(n))
      // sample_id rides along on serving reads (valueCol defined) as
      // the duplicate-ts survivor tiebreak; planning stays two-column
      val hasSid = valueCol.isDefined &&
        fileSchema.containsField("sample_id") && {
          val t = fieldOf("sample_id")
          t.isPrimitive && t.asPrimitiveType().getPrimitiveTypeName ==
            PrimitiveType.PrimitiveTypeName.INT64
        }
      val fields = Seq(fieldOf("channel"), fieldOf("ts")) ++
        valueCol.map(fieldOf) ++
        (if (hasSid) Seq(fieldOf("sample_id")) else Nil)
      val proj = new MessageType("proj", fields: _*)
      // the decoder reads exactly these shapes; anything else (legacy
      // layouts, repeated fields) belongs to the engine path
      def prim(i: Int) = proj.getType(i).asPrimitiveType()
        .getPrimitiveTypeName
      if (prim(0) != PrimitiveType.PrimitiveTypeName.BINARY ||
          prim(1) != PrimitiveType.PrimitiveTypeName.INT64 ||
          (valueCol.isDefined &&
            prim(2) != PrimitiveType.PrimitiveTypeName.DOUBLE))
        throw new FallbackException
      reader.setRequestedSchema(proj)
      val io = new ColumnIOFactory().getColumnIO(proj)
      val mat = new RowsMaterializer(chBin, valueCol.isDefined, hasSid, out)
      var pages = reader.readNextFilteredRowGroup()
      while (pages != null) {
        val n = pages.getRowCount
        if (n > 0) {
          ctx.groupsDecoded += 1
          if (ctx.groupsDecoded > MaxDecodedGroups)
            throw new FallbackException
          val rr = io.getRecordReader(pages, mat)
          var r = 0L
          while (r < n) { rr.read(); r += 1 }
          dbgRows += n
        }
        pages = reader.readNextFilteredRowGroup()
      }
    } finally reader.close()
    if (debugTiming) {
      val now = System.nanoTime()
      println(f"[direct] $file%s open ${(dbgOpened - dbg0) / 1e6}%.1f ms " +
        f"decode ${(now - dbgOpened) / 1e6}%.1f ms rows $dbgRows " +
        s"kept ${out.length}")
    }
    // within a file, groups are (channel, ts)-sorted by the writer —
    // sort defensively anyway; correctness over one O(n log n)
    var asc = true
    var i = 1
    while (asc && i < out.length) {
      if (out(i - 1)._1 > out(i)._1) asc = false
      i += 1
    }
    if (asc) out.toIndexedSeq
    else out.sortBy(r => (r._1, r._3)).toIndexedSeq
  }

  // ---- wire format ---------------------------------------------------

  /** One JSON v1 raw sample, byte-identical to
    * [[JsonV1.serializeRaw]]'s `to_json` output for the serve frame
    * (severity/status are the serve path's literal zeros; doubles
    * render via Double.toString — the text Jackson's
    * writeNumber(double) emits, with non-finite values quoted exactly
    * like Jackson's QUOTE_NON_NUMERIC_NUMBERS).
    */
  private[archive] def jsonOf(ts: Long, v: java.lang.Double): String = {
    val sb = new java.lang.StringBuilder(96)
    sb.append("{\"time\":").append(ts)
    sb.append(",\"severity\":{\"level\":\"OK\",\"hasValue\":")
    sb.append(if (v != null) "true" else "false")
    sb.append("},\"status\":\"0\",\"quality\":\"Original\",")
    sb.append("\"type\":\"double\",\"value\":[")
    if (v == null) sb.append("null")
    else {
      val d = v.doubleValue
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
        sb.append('"').append(d.toString).append('"')
      else sb.append(d.toString)
    }
    sb.append("]}")
    sb.toString
  }
}
