package graft.archive

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Samples

/** The persisted sample store — the engine's replacement for the
  * reference's `channel_access_samples` table + bucket index
  * (SURVEY.md §1.2/§1.4).
  *
  * Layout: one directory tree per store, hive-partitioned by
  * `level` (decimation period in seconds, 0 = raw) and `bucket_date`
  * (UTC day of the sample). Inside each partition, files are written
  * clustered by channel and sorted by (channel, ts).
  *
  * Why this layout at 100 TB:
  *  - `level=` pruning replaces the reference's per-level tables;
  *  - `bucket_date=` pruning replaces the bucket index: a time-range
  *    query touches only the day partitions it overlaps — the same
  *    two-phase prune (index → bucket) the reference does with its
  *    `channels` table, done declaratively by Catalyst;
  *  - within a day, parquet row-group min/max stats on `ts` and
  *    `channel` give the in-bucket clustering-order scan (no runtime
  *    sort for time-ascending reads, row-group skipping for single-
  *    channel reads);
  *  - day × channel-sort bounds any single file's writer memory and
  *    keeps partitions ≪ the reference's 96 MB bucket cap after
  *    columnar compression.
  *
  * Retention (ST9) is a partition-level delete: dropping
  * `bucket_date` directories older than the horizon never rewrites
  * surviving data.
  */
object ArchiveStore {

  /** ns → µs with EXACT arithmetic: `ts / 1000L` on a Column is double
    * division, and a 2024-epoch ns value (~1.7e18) needs 61 bits — the
    * double cast rounds it to a multiple of 256 BEFORE the divide, so
    * ~1.5% of µs-aligned inputs come back one microsecond low (measured
    * 31/2000; the earlier subtract-remainder form only fixed the
    * sub-µs remainder, not the numerator rounding). Routing the exact
    * multiple through DECIMAL(20,0) keeps every digit: the quotient is
    * an integer, represented exactly, and the final long cast is
    * lossless. One decimal op per row on the write path — noise next
    * to the parquet encode it feeds.
    */
  private[graft] def microsCol(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((ts - pmod(ts, lit(1000L))).cast("decimal(20,0)") / lit(1000L))
      .cast("long")

  /** THE day-bucketing contract of every store layout: canonical ns ts
    * → UTC day. One definition — the manifest store, the streaming sink,
    * and retention all derive days from this exact expression.
    */
  private[graft] def bucketDateCol(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_date(timestamp_micros(microsCol(ts)))

  /** Derive the partition column from the canonical ts (ns). */
  private def withBucketDate(samples: DataFrame): DataFrame =
    samples.withColumn("bucket_date", bucketDateCol(col("ts")))

  /** Unified store schema per path, resolved once with mergeSchema and
    * reused by every subsequent read — a query (or a walk-back probe
    * sequence) must not pay a footer scan of every file just to learn
    * the column set. Writes THROUGH THIS JVM invalidate the entry (a
    * new level can add stat columns); the cache assumes a
    * single-writer deployment. An external writer that adds columns
    * must be followed by [[refreshSchema]] in every reader driver —
    * there is no TTL. A catalog-backed table (Delta/Iceberg) declares
    * the schema outright; this cache is the raw-parquet analog.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def storeSchema(spark: SparkSession, path: String) =
    schemaCache.computeIfAbsent(path,
      p => spark.read.option("mergeSchema", "true").parquet(p).schema)

  private def invalidate(path: String): Unit = schemaCache.remove(path)

  /** Drop the cached merged schema for `path` (or every path), forcing
    * the next read to re-resolve it — the escape hatch for multi-writer
    * deployments where another process may have added columns.
    */
  def refreshSchema(path: String): Unit = invalidate(path)
  def refreshAllSchemas(): Unit = schemaCache.clear()

  /** S9 — append samples for one decimation level. `repartition` by
    * the partition key + channel hash spreads writers; sortWithin
    * gives the clustering order the read path exploits.
    */
  def write(samples: DataFrame, path: String, levelSec: Long,
            mode: SaveMode = SaveMode.Append): Unit = {
    withBucketDate(samples)
      .withColumn("level", lit(levelSec))
      .repartition(col("bucket_date"), col("channel"))
      // bucket_date leads the sort (and the constant `level` must NOT):
      // the V1 file writer requires ordering by its partition columns
      // (level folds to a constant, leaving [bucket_date]); only a
      // prefix-matching plan ordering survives — otherwise the
      // optimizer swaps in the writer's own partition-only sort and
      // shreds the (channel, ts) clustering the read path's row-group
      // stats rely on (see ManifestStore.commitTxn's note)
      .sortWithinPartitions("bucket_date", "channel", "ts")
      .write
      .partitionBy("level", "bucket_date")
      .mode(mode)
      .parquet(path)
    invalidate(path)
  }

  /** Rename-stable write: the persisted layout is keyed by the
    * permanent `channel_data_id`, never by the channel name — renaming
    * a channel is then a pure metadata operation (the reference keys
    * all buckets by channelDataId for exactly this reason,
    * SampleBucketId.java:80-89). Input must carry `channel_data_id`
    * (resolve the name with [[ChannelRegistry.resolveToId]]); the name
    * column is dropped before writing and re-attached at read time
    * from the current configuration.
    */
  def writeById(samples: DataFrame, path: String, levelSec: Long,
                mode: SaveMode = SaveMode.Append): Unit = {
    withBucketDate(samples.drop("channel"))
      .withColumn("level", lit(levelSec))
      .repartition(col("bucket_date"), col("channel_data_id"))
      // bucket_date leads — see write()'s ordering note
      .sortWithinPartitions("bucket_date", "channel_data_id", "ts")
      .write
      .partitionBy("level", "bucket_date")
      .mode(mode)
      .parquet(path)
    invalidate(path)
  }

  /** Read an id-keyed level and serve it under the CURRENT channel
    * names: a broadcast join of the (tiny) configuration set restores
    * the `channel` column, so data written before a rename is served
    * under the new name without touching a single data file.
    */
  def readById(spark: SparkSession, path: String,
               configs: Seq[ChannelConfig], levelSec: Long,
               loNs: Option[Long] = None, hiNs: Option[Long] = None)
      : DataFrame = {
    read(spark, path, levelSec, loNs, hiNs)
      .join(broadcast(ChannelRegistry.nameFrame(spark, configs)),
        Seq("channel_data_id"))
  }

  /** Read one level, optionally clipped to [loNs, hiNs] — the time
    * predicate prunes whole day partitions before any file is opened,
    * then pushes into row-group stats.
    */
  def read(spark: SparkSession, path: String, levelSec: Long,
           loNs: Option[Long] = None, hiNs: Option[Long] = None): DataFrame = {
    // raw and decimated levels carry different stat columns — one
    // store, one merged schema with nulls where absent (the columnar
    // form of the reference's sparse 21-column union table), resolved
    // once per path (see storeSchema) instead of per query.
    var df = spark.read.schema(storeSchema(spark, path)).parquet(path)
      .where(col("level") === levelSec)
    // partition-prune on bucket_date AND row-group-prune on ts
    loNs.foreach { lo =>
      df = df.where(col("bucket_date") >=
        to_date(timestamp_micros(lit(lo / 1000L))) && col("ts") >= lo)
    }
    hiNs.foreach { hi =>
      df = df.where(col("bucket_date") <=
        to_date(timestamp_micros(lit(hi / 1000L))) && col("ts") <= hi)
    }
    df
  }

  /** ST9 — retention as partition drop: rewrite the store keeping only
    * day partitions at-or-after the horizon. With a catalog-backed
    * table this is `ALTER TABLE DROP PARTITION` / `DELETE WHERE`;
    * on raw parquet we enumerate and delete expired directories.
    * Horizon rule matches the reference: a bucket is deleted only when
    * its *end* (here: end of day) is older than latest − retention
    * (ArchivedChannelDecimationLevel.java:1226-1229).
    */
  def expiredPartitions(spark: SparkSession, path: String, levelSec: Long,
                        retentionNs: Long): Seq[String] = {
    if (retentionNs == 0) return Nil // keep forever
    val latest = read(spark, path, levelSec).agg(max("ts")).head.getLong(0)
    val horizon = latest - retentionNs
    val dayNs = 86400L * Samples.NS
    read(spark, path, levelSec)
      .select(col("bucket_date")).distinct().collect()
      .map(_.getDate(0))
      .filter { d =>
        val dayStartNs = d.toLocalDate.toEpochDay * dayNs
        dayStartNs + dayNs - 1 < horizon // partition END older than horizon
      }
      .map(d => s"$path/level=$levelSec/bucket_date=$d")
      .toSeq
  }

  /** Execute retention: physically remove expired day partitions. */
  def applyRetention(spark: SparkSession, path: String, levelSec: Long,
                     retentionNs: Long): Seq[String] = {
    val expired = expiredPartitions(spark, path, levelSec, retentionNs)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    expired.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    expired
  }

  /** S10-adjacent — compaction: rewrite one (level, day) partition into
    * right-sized files (the job a 100 TB store runs continuously
    * behind the ingest edge).
    */
  def compact(spark: SparkSession, path: String, levelSec: Long,
              date: String, targetFiles: Int = 1): Unit = {
    val partPath = s"$path/level=$levelSec/bucket_date=$date"
    val tmpPath = s"$partPath._compact_tmp"
    val trashPath = s"$partPath._compact_trash"
    // Write-to-temp, then a two-rename swap: live→trash, tmp→live.
    // The delete happens only after the new data is live, so a crash
    // at any step leaves the old data recoverable (in place, or under
    // _compact_trash) — the unreadable window is the instant between
    // the two renames, not the length of a recursive delete. A
    // catalog-backed table (Delta/Iceberg) would make this one atomic
    // metadata commit; on raw parquet this is the closest analog.
    spark.read.parquet(partPath)
      .repartition(targetFiles)
      .sortWithinPartitions("channel", "ts")
      .write.mode(SaveMode.Overwrite)
      .parquet(tmpPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(partPath)
    val trash = new org.apache.hadoop.fs.Path(trashPath)
    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    fs.delete(trash, true) // a leftover from a crashed prior run
    if (!fs.rename(live, trash))
      throw new java.io.IOException(s"compact: cannot move $live aside")
    if (!fs.rename(tmp, live)) {
      fs.rename(trash, live) // roll back; old data stays served
      throw new java.io.IOException(s"compact: cannot promote $tmp")
    }
    fs.delete(trash, true)
  }
}
