package graft.archive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable persistence for the decimation cascade: the
  * directory-listing [[ArchiveStore]] and the transaction-logged
  * [[ManifestStore]] expose one (write, read, levels) surface, so
  * [[Cascade]] and its incremental catch-up are storage-agnostic — a
  * deployment can switch to manifest-committed levels (atomic
  * visibility per cascade hop, manifest-side file pruning) without
  * touching the decimation math.
  */
trait StoreBackend {
  def write(samples: DataFrame, path: String, levelSec: Long): Unit
  /** `channel` is a pruning HINT: a backend may use it to skip whole
    * files that cannot contain the channel (manifest clustering-key
    * ranges), but rows of other channels may still come back — callers
    * filter, exactly as without the hint.
    */
  def read(spark: SparkSession, path: String, levelSec: Long,
           loNs: Option[Long] = None, hiNs: Option[Long] = None,
           channel: Option[String] = None): DataFrame
  /** Distinct decimation levels present (period seconds; 0 = raw). */
  def levels(spark: SparkSession, path: String): Seq[Long]
  /** Token-deduplicated write for re-runnable jobs: a backend with
    * transactional metadata skips the write when `token` equals the
    * last applied one for `writerId` (crash-safe re-runs); the plain
    * store has nowhere to record tokens and just writes — its catch-up
    * re-run after a mid-job crash can duplicate windows, which is
    * exactly the gap the manifest backend closes.
    */
  def writeTxn(samples: DataFrame, path: String, levelSec: Long,
               writerId: String, token: Long): Unit =
    write(samples, path, levelSec)
  /** ST9 — drop expired day buckets of one level (end-of-bucket older
    * than latest − retention; 0 = keep forever). Returns dropped paths.
    */
  def applyRetention(spark: SparkSession, path: String, levelSec: Long,
                     retentionNs: Long): Seq[String]
  /** A cheap, MONOTONIC metadata version for memoizing per-store
    * planning state (serving caches level availability per version):
    * defined only when the backend can answer from metadata alone —
    * the manifest store's version counter, bumped by every
    * commit/compaction/retention. `None` = not cheaply versioned, do
    * not memoize (the raw-parquet store has no transactional counter;
    * directory mtimes are not reliable across filesystems).
    */
  def metaVersion(spark: SparkSession, path: String): Option[Long] = None
}

/** Raw-parquet store: levels come from one driver-side listing of the
  * `level=` partition directories — the values are encoded in the first
  * path component, so a full mergeSchema scan (every footer in the
  * store) just to learn ~5 longs would be pure waste at scale.
  */
object ArchiveBackend extends StoreBackend {
  def write(samples: DataFrame, path: String, levelSec: Long): Unit =
    ArchiveStore.write(samples, path, levelSec)
  def read(spark: SparkSession, path: String, levelSec: Long,
           loNs: Option[Long], hiNs: Option[Long],
           channel: Option[String]): DataFrame =
    // no per-file channel stats in the raw layout — parquet row-group
    // stats on the sorted channel column do the in-file skipping
    ArchiveStore.read(spark, path, levelSec, loNs, hiNs)
  def levels(spark: SparkSession, path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(p).map(_.getPath.getName).toSeq
      .filter(_.startsWith("level="))
      .flatMap(_.stripPrefix("level=").toLongOption)
      .sorted
  }
  def applyRetention(spark: SparkSession, path: String, levelSec: Long,
                     retentionNs: Long): Seq[String] =
    ArchiveStore.applyRetention(spark, path, levelSec, retentionNs)
}

/** Manifest-committed store: every cascade hop is one atomic commit,
  * and the level listing is pure manifest metadata — no file I/O.
  */
object ManifestBackend extends StoreBackend {
  def write(samples: DataFrame, path: String, levelSec: Long): Unit = {
    ManifestStore.commit(samples, path, levelSec); ()
  }
  def read(spark: SparkSession, path: String, levelSec: Long,
           loNs: Option[Long], hiNs: Option[Long],
           channel: Option[String]): DataFrame =
    ManifestStore.read(spark, path, levelSec, loNs, hiNs, channel)
  def levels(spark: SparkSession, path: String): Seq[Long] =
    ManifestStore.latestManifest(spark, path)
      .map(_.files.map(_.levelSec).distinct.sorted)
      .getOrElse(Nil)
  override def writeTxn(samples: DataFrame, path: String, levelSec: Long,
                        writerId: String, token: Long): Unit = {
    ManifestStore.commitIfChanged(samples, path, levelSec, writerId, token)
    ()
  }
  def applyRetention(spark: SparkSession, path: String, levelSec: Long,
                     retentionNs: Long): Seq[String] =
    ManifestStore.applyRetention(spark, path, levelSec, retentionNs)
  override def metaVersion(spark: SparkSession, path: String): Option[Long] =
    ManifestStore.latestVersion(spark, path)
}
