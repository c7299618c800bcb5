package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.types.StructType

import graft.archive.ManifestStore

/** Offset for the manifest changefeed: the highest manifest version
  * whose changes have been served. Versions are ordered, immutable,
  * exactly-once commits — precisely a streaming source's offset log.
  */
case class GraftSourceOffset(version: Long) extends OffsetV1 {
  override val json: String = version.toString
}

/** `spark.readStream.format("graft").load(store)` — the manifest log
  * as a changefeed (the same shape Delta's streaming source reads:
  * versioned commits are the offsets, each commit's added files are
  * the batch).
  *
  * A micro-batch over versions (from, to] is the union of those
  * versions' file ADDS, read with the SAME vectorized pruned parquet
  * path the batch connector uses ([[ManifestStore.readFiles]]) — this
  * is a v1 [[Source]] (`getBatch` returns a DataFrame) for the same
  * reason the batch scan is a `V1Scan`: the execution already is a
  * Spark plan, and a row-by-row DSv2 `PartitionReader` would forfeit
  * columnar decode.
  *
  * Semantics:
  *  - versions whose commit is a pure rewrite (compaction,
  *    `rewrite_only` in the log) are SKIPPED — their file churn
  *    carries no new logical rows, so a compaction racing the stream
  *    never re-serves rewritten bytes;
  *  - a data-changing version that removes files (retention, channel
  *    erasure, overwrite) cannot be expressed in an append-only
  *    stream: the source REFUSES by default (same contract as Delta's
  *    streaming source) unless `.option("ignoreDeletes", "true")`
  *    acknowledges that downstream tolerates un-retracted deletes —
  *    its adds still stream;
  *  - `.option("startingVersion", <n>|"latest")` bounds history:
  *    default 0 streams the store's full history first; `latest`
  *    serves only commits after stream start;
  *  - vacuum's reference grace covers in-flight batches: a version's
  *    files stay on disk for a full grace after the version is
  *    superseded (see [[ManifestStore.vacuum]]), so a batch planned
  *    against recent versions reads live bytes even while maintenance
  *    runs (spec: GraftChangefeedSpec's vacuum-while-streaming case).
  *
  * Reference basis: the archiver's clients poll new samples per
  * channel after a cursor (`cassandra-pv-archiver-server/.../
  * ArchiveAccessServiceImpl.java` time-bounded reads); the changefeed
  * re-expresses "what arrived since" as a first-class streaming
  * relation instead of client-side cursor bookkeeping.
  */
class GraftChangefeed(spark: SparkSession, path: String,
                      dataSchema: StructType,
                      startingVersion: String,
                      ignoreDeletes: Boolean)
    extends Source with Logging {

  /** Offsets mean "all versions ≤ v served"; the floor is resolved
    * once at source creation ("latest" pins to the version current at
    * stream start, so only subsequent commits stream).
    */
  private val startVersion: Long = startingVersion.trim.toLowerCase match {
    case "latest" => ManifestStore.latestVersion(spark, path).getOrElse(0L)
    case s => s.toLong
  }

  override def schema: StructType = dataSchema

  private def ver(o: OffsetV1): Long = o match {
    case GraftSourceOffset(v) => v
    // SerializedOffset (checkpoint restart) and anything else: the
    // wire form is just the version number
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[OffsetV1] =
    ManifestStore.latestVersion(spark, path)
      .filter(_ > startVersion).map(GraftSourceOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(startVersion)
    val to = ver(end)
    val adds = ((from + 1) to to).flatMap { v =>
      val ch = ManifestStore.versionChanges(spark, path, v)
      if (ch.rewriteOnly) Nil
      else {
        if (ch.removedCount > 0 && !ignoreDeletes)
          throw new IllegalStateException(
            s"graft changefeed on $path: version $v removed " +
              s"${ch.removedCount} file(s) (retention/erasure/overwrite). " +
              "An append-only stream cannot retract rows; set " +
              ".option(\"ignoreDeletes\", \"true\") to stream past it.")
        ch.adds
      }
    }
    if (adds.isEmpty)
      return StreamingBridge.emptyStreamingFrame(spark, dataSchema)
    // the store schema at stream start, minus the two derived columns
    // readFiles re-adds — late-added columns stay invisible to a
    // running stream (its schema is fixed at start)
    val fileSchema = StructType(dataSchema.fields.filterNot(f =>
      f.name == "level" || f.name == "bucket_date"))
    val frames = adds.groupBy(_.levelSec).toSeq.sortBy(_._1)
      .map { case (lvl, es) =>
        ManifestStore.readFiles(spark, path, fileSchema, es, lvl,
          loNs = None, hiNs = None)
      }
    val df = frames.reduce(_.unionByName(_))
      .select(dataSchema.fieldNames.map(org.apache.spark.sql.functions.col)
        .toSeq: _*)
    StreamingBridge.asStreamingBatch(df)
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangefeed[$path, start=$startVersion]"
}
