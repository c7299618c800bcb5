package graft.sources

import java.util.OptionalLong

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max => AggMax, Min => AggMin}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DateType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.archive.ManifestStore

/** Spark SQL DataSource V2 surface for manifest-committed stores:
  *
  * {{{
  *   spark.read.format("graft").load(storePath)          // all levels
  *   CREATE TABLE pv USING graft OPTIONS (path '<store>')
  *   SELECT ... FROM pv WHERE level = 0 AND ts BETWEEN ... AND channel = ...
  * }}}
  *
  * The same plans the library API ([[ManifestStore.read]]) builds —
  * driver-side manifest file pruning on `level` / `ts` range /
  * clustering-key (`channel`) range, then Spark's vectorized parquet
  * reader over only the surviving files — but composable with any
  * Spark SQL query and the session catalog. The table exposes every
  * level of the store with `level` as an ordinary filterable column
  * (the reference's per-resolution column families,
  * `cassandra-pv-archiver-server/.../cassandra/GenericSampleStoreDao.java`,
  * become one relational table).
  *
  * Pushdown contract: `ts` / `channel` / `level` predicates are
  * consumed for FILE PRUNING (visible as `PushedFilters` in
  * `.explain`) and additionally left in the post-scan filter, so
  * query semantics stay exactly Spark's while the scan reads only the
  * pruned byte range. The scan reports the pruned files' manifest
  * bytes/rows as its statistics (see the estimateStatistics note on
  * the V1 bridge); runtime join planning under AQE sees the true
  * pruned size either way — the plan shape that matters at 100 TB.
  *
  * The scan implements [[V1Scan]]: the row production path delegates
  * to the SAME vectorized parquet read the library API uses (a custom
  * row-by-row PartitionReader would forfeit columnar decode — the
  * public V1Scan bridge exists exactly for sources whose execution is
  * already a Spark plan).
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider {

  override def shortName(): String = "graft"

  // ---- streaming read: the manifest log as a changefeed ----
  // `spark.readStream.format("graft").load(store)`. Implemented as a
  // v1 streaming Source (getBatch returns a DataFrame) for the same
  // reason the batch scan is a V1Scan — each micro-batch IS the
  // vectorized parquet read over the new versions' files; see
  // [[GraftChangefeed]]. DataStreamReader falls back to this provider
  // when the DSv2 table declares no MICRO_BATCH_READ capability.

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse(
      GraftDataSource.tableSchema(ctx.sparkSession,
        pathParam(parameters))))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new GraftChangefeed(ctx.sparkSession, pathParam(parameters),
      schema.getOrElse(GraftDataSource.tableSchema(ctx.sparkSession,
        pathParam(parameters))),
      startingVersion = parameters.getOrElse("startingversion",
        parameters.getOrElse("startingVersion", "0")),
      ignoreDeletes = parameters.getOrElse("ignoredeletes",
        parameters.getOrElse("ignoreDeletes", "false")).toBoolean)

  private def pathParam(parameters: Map[String, String]): String = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    ci.getOrElse("path", throw new IllegalArgumentException(
      "graft source needs a store path: .load(<store>) or OPTIONS (path '<store>')"))
  }

  // CREATE TABLE stores the schema in the catalog; accept it back
  override def supportsExternalMetadata(): Boolean = true

  private def storePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft source needs a store path: .load(<store>) or OPTIONS (path '<store>')")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.tableSchema(SparkSession.active, storePath(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftTable(storePath(new CaseInsensitiveStringMap(properties)),
      schema)
}

object GraftDataSource {

  /** Store schema as a SQL table: the manifest's data columns plus the
    * two derived read-shape columns ([[ManifestStore.read]] parity) —
    * `level` (the resolution, filterable for manifest pruning) and
    * `bucket_date` (the day bucket, derived from ts).
    */
  def tableSchema(spark: SparkSession, path: String): StructType = {
    val m = ManifestStore.latestManifest(spark, path)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no committed manifest under $path"))
    StructType(m.schema.fields.toSeq :+
      StructField("level", LongType, nullable = false) :+
      StructField("bucket_date", DateType, nullable = true))
  }

  /** Pushdown state extracted from the query's predicates — only
    * conjunctive top-level constraints on `level` / `ts` / `channel`
    * prune (anything else stays a post-scan filter and never affects
    * which files are read).
    */
  private[sources] case class Pushdown(levels: Option[Set[Long]] = None,
                                       loNs: Option[Long] = None,
                                       hiNs: Option[Long] = None,
                                       channels: Option[Set[String]] = None,
                                       pushed: Seq[Filter] = Nil,
                                       handled: Seq[Filter] = Nil) {
    def withLo(v: Long): Pushdown =
      copy(loNs = Some(loNs.fold(v)(math.max(_, v))))
    def withHi(v: Long): Pushdown =
      copy(hiNs = Some(hiNs.fold(v)(math.min(_, v))))
    def withLevels(vs: Set[Long]): Pushdown =
      copy(levels = Some(levels.fold(vs)(_ intersect vs)))
    def withChannels(vs: Set[String]): Pushdown =
      copy(channels = Some(channels.fold(vs)(_ intersect vs)))
  }

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  private[sources] def extractPushdown(filters: Array[Filter]): Pushdown = {
    var pd = Pushdown()
    filters.foreach { f =>
      val before = pd
      f match {
        case EqualTo("ts", v) => longOf(v).foreach(t => pd = pd.withLo(t).withHi(t))
        case GreaterThan("ts", v) => longOf(v).filter(_ != Long.MaxValue)
          .foreach(t => pd = pd.withLo(t + 1))
        case GreaterThanOrEqual("ts", v) => longOf(v).foreach(t => pd = pd.withLo(t))
        case LessThan("ts", v) => longOf(v).filter(_ != Long.MinValue)
          .foreach(t => pd = pd.withHi(t - 1))
        case LessThanOrEqual("ts", v) => longOf(v).foreach(t => pd = pd.withHi(t))
        // level filters are EXACT under pruning (levelSec is per-file,
        // every row of a surviving file carries exactly that level) —
        // declared fully handled, so no residual Filter survives and
        // aggregate pushdown over a level-filtered store stays legal
        case EqualTo("level", v) => longOf(v).foreach { l =>
          pd = pd.withLevels(Set(l)); pd = pd.copy(handled = pd.handled :+ f)
        }
        case In("level", vs) =>
          val ls = vs.toSeq.flatMap(longOf)
          if (ls.length == vs.length) {
            pd = pd.withLevels(ls.toSet)
            pd = pd.copy(handled = pd.handled :+ f)
          }
        case EqualTo("channel", v: String) => pd = pd.withChannels(Set(v))
        case In("channel", vs) if vs.forall(_.isInstanceOf[String]) =>
          pd = pd.withChannels(vs.map(_.asInstanceOf[String]).toSet)
        case _ => // not prunable — post-scan only
      }
      if (pd ne before) pd = pd.copy(pushed = pd.pushed :+ f)
    }
    pd
  }
}

private[sources] class GraftTable(val path: String, val tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(SparkSession.active, path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path)
}

/** `INSERT INTO … USING graft` / `df.writeTo(...)`: the write is a
  * [[V1Write]] for the same reason the read is a [[V1Scan]] — the
  * execution already IS a Spark plan ([[ManifestStore.commitMultiLevel]]
  * stages range-clustered, (level, day, key, ts)-sorted parquet with
  * the vectorized writer), so a row-by-row DSv2 `DataWriter` would
  * only forfeit columnar encode and re-implement the staging job. The
  * commit itself is the library's atomic manifest protocol: staged
  * files then one exclusive-claim version publish — a failed insert
  * leaves no new version, only vacuum-able orphans (the
  * mid-write-failure case GraftSqlSpec pins). `truncate()` (SQL
  * `INSERT OVERWRITE`) publishes a version listing only the new files.
  *
  * Rows must carry `level` (the resolution to write into — NULL
  * refuses); `bucket_date` is derived from `ts` and any supplied value
  * is ignored.
  */
private[sources] class GraftWriteBuilder(path: String,
                                         overwrite: Boolean = false)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new GraftWriteBuilder(path, overwrite = true)

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwriteArg: Boolean): Unit = {
          ManifestStore.commitMultiLevel(data, path,
            overwrite || overwriteArg)
          ()
        }
      }
  }
}

private[sources] class GraftScanBuilder(spark: SparkSession, path: String,
                                        fullSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pd = GraftDataSource.Pushdown()
  private var agg: Option[Aggregation] = None

  /** Conservative filters (ts range, channel — file stats are min/max
    * envelopes) are returned for post-scan evaluation: pruning is
    * OURS, predicate semantics stay Spark's. Level filters are exact
    * under pruning and are fully consumed — leaving them residual
    * would park a Filter node over the scan and block aggregate
    * pushdown on level-filtered stores.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pd = GraftDataSource.extractPushdown(filters)
    filters.filterNot(pd.handled.contains)
  }

  override def pushedFilters(): Array[Filter] = pd.pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown from manifest stats: `COUNT(*)`, `MIN(ts)`,
    * `MAX(ts)` — optionally grouped by `level` — are already exact in
    * the manifest's per-file entries (rows, minTs, maxTs, levelSec),
    * so a pure-stats query never touches parquet (the reference's
    * `getSampleBucketState` metadata reads,
    * `ChannelMetaDataDAOImpl.java:2081-2103`, as metadata-only SQL).
    *
    * Accepted ONLY when the answer is exact:
    *  - every pushed filter must be fully answered by pruning —
    *    `level` equality/IN is (levelSec is per-file exact); a ts
    *    range or channel filter is NOT (file stats are conservative:
    *    a surviving file may still hold non-matching rows, and the
    *    residual filter cannot run when the scan returns aggregated
    *    rows), so those fall back to the real scan;
    *  - grouping is empty or exactly (`level`);
    *  - aggregates are COUNT(*) / MIN(ts) / MAX(ts) only.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    canPushAgg(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = canPushAgg(aggregation)
    if (ok) agg = Some(aggregation)
    ok
  }

  private def canPushAgg(a: Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    def isCol(e: org.apache.spark.sql.connector.expressions.Expression,
              name: String): Boolean = e match {
      case f: NamedReference =>
        f.fieldNames.length == 1 && f.fieldNames()(0) == name
      case _ => false
    }
    val filtersExact = pd.pushed.length ==
      pd.pushed.count {
        case EqualTo("level", _) | In("level", _) => true
        case _ => false
      } && pd.loNs.isEmpty && pd.hiNs.isEmpty && pd.channels.isEmpty
    val groupOk = a.groupByExpressions.forall(isCol(_, "level"))
    val aggsOk = a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case m: AggMin => isCol(m.column, "ts")
        case m: AggMax => isCol(m.column, "ts")
        case _ => false
      }
    filtersExact && groupOk && aggsOk
  }

  override def build(): Scan = agg match {
    case Some(a) => new GraftStatsScan(spark, path, pd, a)
    case None => new GraftScan(spark, path, required, pd)
  }
}

/** Metadata-only scan for a pushed aggregation: the rows are computed
  * on the driver from the manifest's file entries — no parquet file is
  * opened. Output schema follows the DSv2 pushed-aggregate contract:
  * grouping columns first, then the aggregate values in call order.
  */
private[sources] class GraftStatsScan(spark: SparkSession, path: String,
                                      pd: GraftDataSource.Pushdown,
                                      agg: Aggregation)
    extends Scan with V1Scan {

  private val grouped = agg.groupByExpressions.nonEmpty

  override def readSchema(): StructType = {
    val gb = if (grouped)
      Seq(StructField("level", LongType, nullable = false)) else Nil
    val aggs = agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) =>
        StructField(s"count_star_$i", LongType, nullable = false)
      case (_: AggMin, i) => StructField(s"min_ts_$i", LongType)
      case (_: AggMax, i) => StructField(s"max_ts_$i", LongType)
      case (other, _) => throw new IllegalStateException(
        s"unpushable aggregate survived canPushAgg: $other")
    }
    StructType(gb ++ aggs)
  }

  override def description(): String = {
    val lv = pd.levels.fold("*")(_.toSeq.sorted.mkString(","))
    s"graft stats-only store=$path levels=$lv agg=$agg"
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftStatsRelation(context, spark, path, pd, agg, readSchema())
      .asInstanceOf[T]
}

/** Driver-computed aggregate rows over manifest entries (file-count
  * work, zero data I/O), parallelized as a tiny local RDD.
  */
private[sources] class GraftStatsRelation(ctx: SQLContext,
                                          spark: SparkSession, path: String,
                                          pd: GraftDataSource.Pushdown,
                                          agg: Aggregation,
                                          out: StructType)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = out

  override def toString: String = s"GraftStoreStats($path)"

  override def buildScan(): RDD[Row] = {
    val m = ManifestStore.latestManifest(spark, path)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no committed manifest under $path"))
    val entries = m.files.filter(e =>
      pd.levels.forall(_.contains(e.levelSec)))
    val grouped = agg.groupByExpressions.nonEmpty
    def rowFor(lvl: Option[Long],
               es: Seq[ManifestStore.FileEntry]): Row = {
      val aggVals = agg.aggregateExpressions.map {
        case _: CountStar => es.map(_.rows).sum: java.lang.Long
        case _: AggMin =>
          if (es.isEmpty) null else (es.map(_.minTs).min: java.lang.Long)
        case _: AggMax =>
          if (es.isEmpty) null else (es.map(_.maxTs).max: java.lang.Long)
        case other => throw new IllegalStateException(s"unpushable: $other")
      }
      Row.fromSeq(lvl.toSeq ++ aggVals)
    }
    val rows =
      if (grouped)
        entries.groupBy(_.levelSec).toSeq.sortBy(_._1)
          .map { case (l, es) => rowFor(Some(l), es) }
      else
        // global aggregation over an empty set is still ONE row
        Seq(rowFor(None, entries))
    spark.sparkContext.parallelize(rows, 1)
  }
}

private[sources] class GraftScan(spark: SparkSession, path: String,
                                 required: StructType,
                                 pd: GraftDataSource.Pushdown)
    extends Scan with V1Scan with SupportsReportStatistics {

  // ONE manifest snapshot for the whole scan: every level of a
  // multi-level query reads the same committed version (snapshot
  // isolation across the union, like the library API's readVersion)
  private lazy val manifest: ManifestStore.Manifest = {
    val v = ManifestStore.latestVersion(spark, path)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no committed manifest under $path"))
    ManifestStore.readManifest(spark, path, v)
  }

  /** Driver-side file pruning from manifest stats — the connector's
    * whole point: level match, ts-range overlap, clustering-key range
    * containment (UTF-8 byte order, [[ManifestStore.chRangeContains]]).
    */
  private[sources] lazy val prunedEntries: Seq[ManifestStore.FileEntry] =
    manifest.files.filter { e =>
      pd.levels.forall(_.contains(e.levelSec)) &&
        pd.loNs.forall(e.maxTs >= _) && pd.hiNs.forall(e.minTs <= _) &&
        pd.channels.forall(_.exists(c =>
          ManifestStore.chRangeContains(e.chMin, e.chMax, c)))
    }

  override def readSchema(): StructType = required

  override def description(): String = {
    val lv = pd.levels.fold("*")(_.toSeq.sorted.mkString(","))
    val ch = pd.channels.fold("*")(_.toSeq.sorted.mkString(","))
    s"graft store=$path levels=$lv ts=[${pd.loNs.getOrElse("-inf")}," +
      s"${pd.hiNs.getOrElse("+inf")}] channel=$ch " +
      s"files=${prunedEntries.size}/${manifest.files.size}"
  }

  /** Post-pruning size from manifest stats: a tightly-filtered store
    * read reports only the surviving files' bytes/rows. NOTE Spark's
    * V1 bridge wraps this scan in `V1ScanWrapper`, which does not
    * forward `SupportsReportStatistics`, so the LOGICAL plan sees the
    * default size and static join planning will not auto-broadcast a
    * pruned store read — AQE's runtime join selection covers that
    * (the materialized pruned side is small, so AQE converts to
    * broadcast at execution). The stats remain the connector's public
    * contract (spec-pinned) for planners that consult the scan
    * directly, and for a future native-batch path.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(1L, prunedEntries.map(_.bytes).sum))
    override def numRows(): OptionalLong =
      OptionalLong.of(prunedEntries.map(_.rows).sum)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftRelation(context, spark, path, manifest, prunedEntries,
      required, pd).asInstanceOf[T]
}

/** The executing relation: per-level frames over exactly the pruned
  * entries (vectorized parquet scan, residual ts clip pushed to
  * row-group stats), unioned, projected to the required columns.
  */
private[sources] class GraftRelation(ctx: SQLContext, spark: SparkSession,
                                     path: String,
                                     manifest: ManifestStore.Manifest,
                                     entries: Seq[ManifestStore.FileEntry],
                                     required: StructType,
                                     pd: GraftDataSource.Pushdown)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required

  // RowDataSourceScanExec renders "Scan <relation.toString>" — show the
  // store and the pruning outcome instead of an object hash
  override def toString: String =
    s"GraftStore($path, files=${entries.size}/${manifest.files.size})"

  override def buildScan(): RDD[Row] = {
    val byLevel = entries.groupBy(_.levelSec).toSeq.sortBy(_._1)
    val frames = byLevel.map { case (lvl, es) =>
      ManifestStore.readFiles(spark, path, manifest.schema, es, lvl,
        pd.loNs, pd.hiNs)
    }
    val df = frames.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(GraftDataSource.tableSchema(spark, path))))
    if (required.isEmpty) {
      // column-less scan (e.g. COUNT(*)): row count only
      val one = df.columns.headOption.getOrElse("level")
      df.select(col(one)).rdd.map(_ => Row.empty)
    } else df.select(required.fieldNames.map(col).toSeq: _*).rdd
  }
}
