package graft.archive

import org.apache.spark.sql.SparkSession

import graft.core.Samples

/** Background upkeep for a manifest-committed store — the reference's
  * continuous maintenance duties (bucket-size compaction rollover,
  * per-level retention deletes, tombstone cleanup) composed into ONE
  * idempotent call an operator can schedule: plan compaction from
  * manifest stats, rewrite every fragmented (level, day) with one
  * atomic swap per level, apply per-level retention, then vacuum
  * unreferenced bytes and stale manifest versions. Every step is a
  * metadata-first operation (no data scan to decide work), and a
  * second run on a converged store is a no-op.
  */
object Maintenance {

  case class Report(compacted: Seq[ManifestStore.CompactionCandidate],
                    retainedPaths: Map[Long, Seq[String]],
                    vacuumed: Seq[String]) {
    def isNoop: Boolean =
      compacted.isEmpty && retainedPaths.values.forall(_.isEmpty) &&
        vacuumed.isEmpty
  }

  /** Retire a [[FederatedBackend]] split: backfill the frozen old
    * store's history into the live store, level by level, through the
    * TOKEN-DEDUPLICATED write path — each level's token is the old
    * store's pinned metaVersion, so a crash mid-migration re-runs
    * safely (already-applied levels skip, the interrupted level's
    * commit either landed atomically or re-runs whole) and a second
    * invocation of the whole migration is a no-op. After this returns,
    * reads of the live store alone serve the federation's bytes and
    * the old store can be decommissioned.
    *
    * Scale shape: one pruned scan + one append commit per level —
    * the same cost as the cascade hop that originally built each
    * level; no shuffle beyond the write's own partitioning.
    *
    * Returns (levelSec → rows migrated); levels whose token already
    * matched (a completed prior run) report 0.
    */
  def migrateStore(spark: SparkSession,
                   oldBackend: StoreBackend, oldPath: String,
                   liveBackend: StoreBackend, livePath: String,
                   cutoverNs: Long): Map[Long, Long] = {
    val token = oldBackend.metaVersion(spark, oldPath).getOrElse(
      throw new IllegalArgumentException(
        "migrateStore needs a versioned (manifest) old store — " +
          "an unversioned source has no crash-safe migration token"))
    oldBackend.levels(spark, oldPath).map { level =>
      val before = liveBackend match {
        case ManifestBackend =>
          ManifestStore.latestManifest(spark, livePath)
            .flatMap(_.txns.get(s"migrate_$level"))
        case _ => None
      }
      // a DIFFERENT prior token means the old store changed after a
      // completed migration: re-appending would silently duplicate
      // every pre-cutover sample, so refuse loudly instead
      before.filter(_ != token).foreach { prev =>
        throw new IllegalStateException(
          s"live store already holds a level-$level migration with " +
            s"token $prev but the old store now reads version $token " +
            "— the frozen-old contract was violated; rebuild the live " +
            "level instead of re-appending")
      }
      if (before.contains(token)) level -> 0L
      else {
        val rows = oldBackend
          .read(spark, oldPath, level, hiNs = Some(cutoverNs - 1))
          .where(org.apache.spark.sql.functions.col("ts") < cutoverNs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          liveBackend.writeTxn(rows, livePath, level, s"migrate_$level",
            token)
          level -> rows.count() // served from the cached frame, not a rescan
        } finally { rows.unpersist(); () }
      }
    }.toMap
  }

  /** One upkeep pass over every level of `storePath`. `retentionSec`
    * maps levelSec → keep-duration seconds (absent / 0 = keep
    * forever). Retention runs FIRST: expired fragmented days would
    * otherwise be rewritten by the compactor and then immediately
    * dropped — wasted I/O that grows with the retention backlog;
    * dropping them first means the compactor only touches survivors.
    * `vacuumGraceMs` defaults to 0 here ONLY because the composed
    * call runs after its own retention/compaction commits in the same
    * process; a deployment with concurrent readers schedules
    * [[ManifestStore.vacuum]]'s 24 h default instead.
    */
  def run(spark: SparkSession, storePath: String,
          retentionSec: Map[Long, Long] = Map.empty,
          smallBytes: Long = 32L * 1024 * 1024,
          vacuumGraceMs: Long = 0L): Report = {
    val levels = ManifestBackend.levels(spark, storePath)
    val retained = levels.map { l =>
      l -> (retentionSec.getOrElse(l, 0L) match {
        case 0L => Seq.empty[String]
        case sec =>
          ManifestStore.applyRetention(spark, storePath, l, sec * Samples.NS)
      })
    }.toMap
    val compacted = levels.flatMap(l =>
      ManifestStore.compactAll(spark, storePath, l, smallBytes))
    val vacuumed = ManifestStore.vacuum(spark, storePath, vacuumGraceMs)
    Report(compacted, retained, vacuumed)
  }

  /** Archive integrity report — the admin-side "is my ingest healthy"
    * scan the reference's operators run as ad-hoc CQL: per channel,
    * how many raw rows violate the F6 write contract (duplicate
    * canonical timestamps, or arrival-order regressions against the
    * per-channel monotonic rule) before [[graft.core.Samples
    * .monotonicDedup]] repairs them. All three counters ride ONE
    * channel-clustered pass (a lag window + one aggregate — no joins,
    * no second scan), so at 100 TB the report costs the same as any
    * per-channel aggregate. A healthy store reports zeros; non-zero
    * `n_dup_ts` on a live ingest usually means a source replayed
    * without its dedup sink, non-zero `n_backward` a clock step.
    */
  def integrityReport(samples: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("channel").orderBy("sample_id")
    samples
      .select(col("channel"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("ts") === col("prev_ts"), 1L).otherwise(0L))
          .as("n_dup_ts"),
        sum(when(col("ts") < col("prev_ts"), 1L).otherwise(0L))
          .as("n_backward"))
      .withColumn("n_violations", col("n_dup_ts") + col("n_backward"))
  }

  /** [[run]] with the retention map derived from the committed
    * configuration ([[ConfigCommands]]) — the fully config-governed
    * upkeep loop.
    */
  def runConfigured(spark: SparkSession, configPath: String,
                    storePath: String,
                    smallBytes: Long = 32L * 1024 * 1024,
                    vacuumGraceMs: Long = 0L): Report =
    run(spark, storePath,
      ConfigCommands.state(spark, configPath).retentionSec,
      smallBytes, vacuumGraceMs)
}
