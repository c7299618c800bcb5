package graft.archive

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving edge — the reference's archive-access read path
  * (SURVEY.md §3.1, Api10Controller + ArchiveAccessServiceImpl)
  * as one function over an [[ArchiveStore]]:
  *
  *  1. discover the channel's available decimation levels and each
  *     level's earliest sample (the retention state) from store
  *     metadata — cheap aggregates over pruned reads;
  *  2. pick the level matching the requested count
  *     ([[ResolutionPlanner.selectLevel]]);
  *  3. fall back to coarser levels for time the chosen level no longer
  *     retains ([[ResolutionPlanner.fallbackSegments]]);
  *  4. per segment: widened-boundary range read (AT_OR_BEFORE lower /
  *     AT_OR_AFTER upper on the finest segment only, like the
  *     reference);
  *  5. serialize to the JSON v1 wire format, streamed via
  *     `toLocalIterator` — the driver never materializes the result.
  */
object ArchiveServer {

  case class LevelState(periodSec: Long, earliestTs: Long)

  /** Step 1 — per-level availability for one channel. */
  def levelStates(spark: SparkSession, storePath: String,
                  channel: String): Seq[LevelState] = {
    // partition-column values are inferred as Int on read-back
    val levels = spark.read.option("mergeSchema", "true").parquet(storePath)
      .select(col("level").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    levels.flatMap { l =>
      val first = ArchiveStore.read(spark, storePath, l)
        .where(col("channel") === channel)
        .agg(min("ts")).head
      if (first.isNullAt(0)) None else Some(LevelState(l, first.getLong(0)))
    }.toSeq
  }

  /** Steps 2–4 — the planned, unioned sample frame (channel, ts,
    * value, level), time-ascending.
    */
  def querySamples(spark: SparkSession, storePath: String, channel: String,
                   startNs: Long, endNs: Long,
                   count: Option[Long]): DataFrame = {
    val states = levelStates(spark, storePath, channel)
    require(states.nonEmpty, s"unknown channel $channel")
    val chosen = ResolutionPlanner.selectLevel(
      states.map(_.periodSec), startNs, endNs, count)
    val segments = ResolutionPlanner.fallbackSegments(chosen,
      states.map(s => s.periodSec -> s.earliestTs).toMap,
      states.map(_.periodSec).filter(_ > chosen), startNs, endNs)
    val parts = segments.map { case (period, from, to) =>
      // boundary widening only on the finest (most recent) segment —
      // the coarser prepended history is range-exact (reference:
      // Api10Controller range-splits with end = earliestSeen − 1).
      // The widened segment must NOT lower-clip the store read, or the
      // at-or-before boundary sample would be pruned away with its
      // partition; a production store walks back one day partition at
      // a time instead of dropping the bound entirely.
      val widen = period == chosen && count.isEmpty
      val base = ArchiveStore.read(spark, storePath, period,
          if (widen) None else Some(from), Some(to))
        .where(col("channel") === channel)
      val valueCol = if (period == 0L) col("value") else col("mean")
      val widened =
        if (widen)
          ArchiveReader.getSamples(base, from, ArchiveReader.AtOrWidened,
            to, ArchiveReader.AtOrWidened)
        else base.where(col("ts").between(from, to))
      widened.select(col("channel"), col("ts"),
        valueCol.as("value"), lit(period).as("level"))
    }
    parts.reduce(_ unionByName _).orderBy("ts")
  }

  /** Step 5 — the full request: plan, read, serialize; an iterator of
    * JSON v1 objects (what an HTTP layer would stream).
    */
  def serveJson(spark: SparkSession, storePath: String, channel: String,
                startNs: Long, endNs: Long,
                count: Option[Long]): Iterator[String] = {
    val df = querySamples(spark, storePath, channel, startNs, endNs, count)
      .withColumn("severity", lit(0)).withColumn("status", lit(0))
    JsonV1.serializeRaw(df).select("json").toLocalIterator()
      .asScala.map(_.getString(0))
  }
}
