package graft.archive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Samples

/** A8 — the cascaded decimation DAG, batch form: materialize a chain
  * of decimation levels into the store, each level reading from the
  * configured level with the largest period that properly divides its
  * own (else raw) — the reference's source-selection rule
  * (ArchivedChannel.java:766-793), so a 6h level re-aggregates 15min
  * aggregates instead of re-reading a year of raw samples. This is the
  * medallion rollup that keeps 100 TB of raw data queryable at
  * interactive resolutions: each hop shrinks the input by the period
  * ratio, so total cascade cost ≈ one raw scan.
  *
  * Every written window is FINAL (raw decimation flushes on crossing;
  * coarse hops use [[Decimation.reAggregateFlushed]]), which makes
  * [[catchUp]] pure append — the reference's incremental
  * `generateDecimatedSamples` resume
  * (ArchivedChannelDecimatedSamplesDecimationLevel.java:319-435).
  */
object Cascade {

  /** Decimated-level storage schema: stats columns ride along the
    * canonical (channel, ts) pair.
    */
  private def asStoreRows(decimated: DataFrame): DataFrame =
    decimated.select(
      col("channel"), col("win_start").as("ts"),
      col("mean"), col("std"), col("min_value"), col("max_value"),
      col("covered_fraction"), col("n_samples"))

  private def asDecimated(stored: DataFrame): DataFrame =
    stored.select(
      col("channel"), col("ts").as("win_start"),
      col("mean"), col("std"), col("min_value"), col("max_value"),
      col("covered_fraction"), col("n_samples"))

  /** Decimate `source` rows into `target`-period windows (raw source →
    * slice decimation; decimated source → flushed re-aggregation).
    */
  private def hop(source: DataFrame, sourceSec: Long,
                  targetSec: Long): DataFrame =
    if (sourceSec == 0L)
      Decimation.decimate(source, targetSec * Samples.NS)
    else
      Decimation.reAggregateFlushed(asDecimated(source),
        sourceSec * Samples.NS, targetSec * Samples.NS)

  /** Per-(channel, level) resume state — the reference's persisted
    * `lastSampleTimeStamp`
    * (ArchivedChannelDecimatedSamplesDecimationLevel.java:406-435):
    *
    *  - `last_src_ts`: newest consumed source ts (raw) / fine window
    *    start (coarse) — the flush frontier: windows ending at-or-
    *    before it were written and are immutable;
    *  - `resume_ts`: where an incremental run must START reading so
    *    the first unflushed window sees both its already-arrived
    *    in-window samples and its held boundary sample. Raw: the last
    *    sample before the frontier window's start (hold-last-value can
    *    reach arbitrarily far back across gaps — this is why the
    *    resume point must be persisted rather than derived). Coarse:
    *    frontier − targetPeriod (fine rows are points; no hold).
    */
  private def watermarkPath(storePath: String, levelSec: Long) =
    s"$storePath/_watermarks/level_$levelSec"

  /** The watermark frame for `source` rows: per-channel frontier and
    * resume point (see [[watermarkPath]] docs above).
    */
  private def computeWatermarks(source: DataFrame, targetSec: Long,
                                sourceSec: Long,
                                heldSource: Boolean): DataFrame = {
    val targetP = targetSec * Samples.NS
    val last = source.groupBy("channel")
      .agg(max(col("ts")).as("last_src_ts"))
    if (sourceSec == 0L || heldSource) {
      val w0 = Samples.windowStart(col("last_src_ts"), targetP)
      val held = source
        .join(broadcast(last.select(col("channel").as("_c"),
          col("last_src_ts"))), col("channel") === col("_c"))
        .where(col("ts") < Samples.windowStart(col("last_src_ts"), targetP))
        .groupBy("channel").agg(max(col("ts")).as("_held_ts"))
      last.join(held, Seq("channel"), "left")
        .select(col("channel"), col("last_src_ts"),
          coalesce(col("_held_ts"), w0).as("resume_ts"))
    } else
      last.select(col("channel"), col("last_src_ts"),
        (col("last_src_ts") - targetP).as("resume_ts"))
  }

  /** Crash-safe watermark persist: write to a temp dir, then a
    * two-rename swap (live→trash, tmp→live, drop trash) — a torn
    * parquet overwrite would otherwise leave the level with no (or
    * partial) watermarks, after which every channel reads as "new" and
    * the next catch-up re-appends full history. [[readWatermarks]]
    * recovers the trash copy if a crash hit between the renames.
    */
  private def persistWatermarks(wm: DataFrame, storePath: String,
                                targetSec: Long): Unit = {
    val live = watermarkPath(storePath, targetSec)
    val tmp = live + "._tmp"
    val trash = live + "._trash"
    wm.coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(live).getFileSystem(
      wm.sparkSession.sparkContext.hadoopConfiguration)
    def P(p: String) = new org.apache.hadoop.fs.Path(p)
    fs.delete(P(trash), true)
    if (fs.exists(P(live)) && !fs.rename(P(live), P(trash)))
      throw new java.io.IOException(s"cannot move $live aside")
    if (!fs.rename(P(tmp), P(live))) {
      fs.rename(P(trash), P(live))
      throw new java.io.IOException(s"cannot promote $tmp")
    }
    fs.delete(P(trash), true)
  }

  private def readWatermarks(spark: SparkSession,
                             storePath: String, targetSec: Long): DataFrame = {
    val live = watermarkPath(storePath, targetSec)
    val trash = live + "._trash"
    val fs = new org.apache.hadoop.fs.Path(live).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def P(p: String) = new org.apache.hadoop.fs.Path(p)
    // crash between the two renames: the old state is intact in trash
    if (!fs.exists(P(live)) && fs.exists(P(trash)))
      fs.rename(P(trash), P(live))
    spark.read.parquet(live)
  }

  private def writeWatermarks(spark: SparkSession, storePath: String,
                              targetSec: Long, source: DataFrame,
                              sourceSec: Long,
                              heldSource: Boolean = false): Unit =
    persistWatermarks(
      computeWatermarks(source, targetSec, sourceSec, heldSource),
      storePath, targetSec)

  /** Write-triggered retention, the reference's rule: after every
    * successful write to a level, delete its buckets that fell past
    * the horizon (ArchivedChannelDecimationLevel.java:602-640) — no
    * separate scheduled job needed. `retentionSec` maps levelSec →
    * keep-duration seconds (absent / 0 = keep forever), the shape of
    * the registry's `decimation_level_to_retention` map
    * ([[ChannelRegistry.levelRetention]] derives it).
    */
  private def retainAfterWrite(spark: SparkSession, storePath: String,
                               levelSec: Long, retentionSec: Map[Long, Long],
                               backend: StoreBackend): Unit =
    retentionSec.getOrElse(levelSec, 0L) match {
      case 0L => ()
      case sec =>
        backend.applyRetention(spark, storePath, levelSec,
          sec * Samples.NS); ()
    }

  /** Write raw samples and materialize every level in `levelsSec`
    * (ascending), cascading from the best available source; persists
    * the per-channel resume watermark per level for [[catchUp]].
    * Each successful level write triggers that level's retention.
    */
  def materialize(spark: SparkSession, storePath: String,
                  raw: DataFrame, levelsSec: Seq[Long],
                  backend: StoreBackend = ArchiveBackend,
                  retentionSec: Map[Long, Long] = Map.empty): Unit = {
    backend.write(Samples.monotonicDedup(raw), storePath, 0)
    retainAfterWrite(spark, storePath, 0L, retentionSec, backend)
    var done = List(0L)
    for (target <- levelsSec.sorted) {
      val source = Decimation.selectSourcePeriod(target, done)
      val src = backend.read(spark, storePath, source)
      backend.write(asStoreRows(hop(src, source, target)),
        storePath, target)
      writeWatermarks(spark, storePath, target, src, source)
      retainAfterWrite(spark, storePath, target, retentionSec, backend)
      done ::= target
    }
  }

  /** Whether a level has its resume watermarks (i.e. has been built at
    * least once) — [[ConfiguredArchive.catchUp]] uses this to route a
    * config-added level to its first full build instead of an
    * incremental run that would have nothing to resume from.
    */
  def hasWatermarks(spark: SparkSession, storePath: String,
                    levelSec: Long): Boolean = {
    val live = new org.apache.hadoop.fs.Path(watermarkPath(storePath, levelSec))
    val f = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(live) || f.exists(new org.apache.hadoop.fs.Path(
      watermarkPath(storePath, levelSec) + "._trash"))
  }

  /** Backfill repair — incremental catch-up's missing half: catch-up
    * extends each channel's FRONTIER, but source data landed BEHIND it
    * (a migrated archive — the EPICS bridge's whole purpose — or a
    * replayed outage) never reaches the decimated levels. This
    * recomputes every target window a backfill into [loNs, hiNs] can
    * have changed: from the window containing loNs through the window
    * holding each channel's first source sample AFTER hiNs (the
    * sample-and-hold entering later windows is unchanged beyond that),
    * extended to whole day buckets so the swap is a lossless
    * WHOLE-DAY file replacement ([[ManifestStore.replaceRange]], one
    * atomic commit — windows in the edge days outside the repair range
    * recompute to identical values). Watermarks are untouched (the
    * frontier did not move); data past the frontier stays [[catchUp]]'s
    * job. Repair levels fine-to-coarse so each coarser hop reads the
    * repaired finer level — [[ConfiguredArchive.repairBackfill]] drives
    * that order. Scalar stores; requires a manifest-backed store (the
    * swap is a manifest operation).
    *
    * Dedup note: when the source is the raw level, the F6 view is
    * recomputed over the FULL raw level (not a clipped prefix) — an
    * out-of-order arrival's dominator can live outside any clipped
    * window, and a partial view would keep rows the true dedup drops.
    */
  def repairRange(spark: SparkSession, storePath: String, targetSec: Long,
                  loNs: Long, hiNs: Long): Unit =
    repairRangeImpl(spark, storePath, targetSec, loNs, hiNs, hop,
      asStoreRows)

  /** [[repairRange]] for typed-union stores — what an EPICS migration
    * ([[graft.sources.EpicsArchiverJson]] → [[materializeTyped]])
    * actually needs repaired: same window algebra, typed dispatch in
    * the hop.
    */
  def repairRangeTyped(spark: SparkSession, storePath: String,
                       targetSec: Long, loNs: Long, hiNs: Long): Unit =
    repairRangeImpl(spark, storePath, targetSec, loNs, hiNs, typedHop,
      asTypedStoreRows)

  private def repairRangeImpl(spark: SparkSession, storePath: String,
                              targetSec: Long, loNs: Long, hiNs: Long,
                              hopFn: (DataFrame, Long, Long) => DataFrame,
                              toStore: DataFrame => DataFrame): Unit = {
    require(targetSec > 0, "repairRange targets a decimated level")
    require(loNs <= hiNs, "repairRange needs loNs <= hiNs")
    val backend = ManifestBackend
    val levels = backend.levels(spark, storePath).filter(_ != targetSec)
    val source = Decimation.selectSourcePeriod(targetSec, levels)
    val targetP = targetSec * Samples.NS
    val dayNs = 86400L * Samples.NS
    val dayLo = ((loNs / targetP) * targetP / dayNs) * dayNs
    val srcAll0 = backend.read(spark, storePath, source)
    val srcAll =
      if (source == 0L) Samples.monotonicDedup(srcAll0) else srcAll0
    // the last window whose ENTERING hold the backfill can change —
    // derived from the DEDUPLICATED view: the first raw arrival past
    // hiNs may be a row F6 drops, and anchoring on it would leave
    // gap-hold windows between dayHi and the first SURVIVING sample
    // holding their stale pre-backfill value
    val firstAfter = srcAll.where(col("ts") > hiNs)
      .groupBy("channel").agg(min("ts").as("fa"))
      .agg(max("fa")).collect().head
    val lastNeeded =
      if (firstAfter.isNullAt(0)) hiNs else firstAfter.getLong(0)
    val upWin = (lastNeeded / targetP + 1L) * targetP
    val dayHi = ((upWin - 1L) / dayNs + 1L) * dayNs // exclusive
    val cols = srcAll.columns
      .filterNot(c => c == "level" || c == "bucket_date").map(col).toSeq
    // source upper edge: whole windows (srcHi == dayHi when the period
    // divides a day; the window straddling dayHi otherwise)
    val srcHi = ((dayHi - 1L) / targetP + 1L) * targetP
    val inRange = srcAll.where(col("ts") >= dayLo && col("ts") < srcHi)
      .select(cols: _*)
    // per-channel held boundary: the last source row before the range
    val boundary = srcAll.where(col("ts") < dayLo)
      .groupBy(col("channel").as("_ch"))
      .agg(max_by(struct(cols: _*), col("ts")).as("_r"))
      .select(col("_r.*"))
    // per-channel FORWARD boundary: without a row past the range the
    // decimator stops at the channel's last in-range sample and the
    // gap-hold windows between it and dayHi never regenerate — the
    // full build emits them because later samples exist
    val forward = srcAll.where(col("ts") >= srcHi)
      .groupBy(col("channel").as("_ch"))
      .agg(min_by(struct(cols: _*), col("ts")).as("_r"))
      .select(col("_r.*"))
    val input = inRange.unionByName(boundary).unionByName(forward)
    val recomputed = hopFn(input, source, targetSec)
      .where(col("win_start") >= dayLo && col("win_start") < dayHi)
    val dates = Iterator.iterate(dayLo)(_ + dayNs).takeWhile(_ < dayHi)
      .map(d => java.time.LocalDate.ofEpochDay(d / dayNs).toString)
      .toSet
    ManifestStore.replaceRange(spark, storePath, targetSec, dates,
      toStore(recomputed))
  }

  /** Build ONE level from the best available source over FULL history
    * — the [[materialize]] loop body as a standalone call, for levels
    * a configuration change adds to an already-materialized store.
    */
  def materializeLevel(spark: SparkSession, storePath: String,
                       targetSec: Long,
                       backend: StoreBackend = ArchiveBackend,
                       retentionSec: Map[Long, Long] = Map.empty): Unit =
    materializeLevelImpl(spark, storePath, targetSec, hop, asStoreRows,
      heldSource = false, backend, retentionSec)

  /** [[materializeLevel]] for typed-union stores: one config-added
    * level built from the best available source over full history,
    * typed dispatch in the hop, held-boundary watermarks.
    */
  def materializeTypedLevel(spark: SparkSession, storePath: String,
                            targetSec: Long,
                            backend: StoreBackend = ArchiveBackend,
                            retentionSec: Map[Long, Long] = Map.empty): Unit =
    materializeLevelImpl(spark, storePath, targetSec, typedHop,
      asTypedStoreRows, heldSource = true, backend, retentionSec)

  private def materializeLevelImpl(spark: SparkSession, storePath: String,
                                   targetSec: Long,
                                   hopFn: (DataFrame, Long, Long) => DataFrame,
                                   toStore: DataFrame => DataFrame,
                                   heldSource: Boolean,
                                   backend: StoreBackend,
                                   retentionSec: Map[Long, Long]): Unit = {
    val done = backend.levels(spark, storePath).filter(_ != targetSec)
    val source = Decimation.selectSourcePeriod(targetSec, done)
    val src0 = backend.read(spark, storePath, source)
    // a raw level may hold undeduplicated streaming appends (the
    // continuous sink writes arrival order): the first build must see
    // the F6-deduplicated view — same rule as catchUpImpl's suffix
    val src =
      if (source == 0L) Samples.monotonicDedup(src0) else src0
    val wmDf = computeWatermarks(src, targetSec, source, heldSource)
    val wmRows = wmDf.collect()
    // crash-safety, mirroring catchUp: the token hashes the post-build
    // watermark state, so a re-run after a crash between this write
    // and the watermark persist recomputes the identical full-history
    // state and token and the duplicate append is skipped on a
    // transactional backend (plain store keeps its documented
    // at-least-once behavior)
    backend.writeTxn(toStore(hopFn(src, source, targetSec)),
      storePath, targetSec, writerId = s"build:$targetSec",
      token = stateToken(wmRows.toSeq))
    import scala.jdk.CollectionConverters._
    persistWatermarks(
      spark.createDataFrame(wmRows.toSeq.asJava, wmDf.schema),
      storePath, targetSec)
    retainAfterWrite(spark, storePath, targetSec, retentionSec, backend)
  }

  /** Collision-resistant 64-bit token of a watermark state: SHA-256
    * over a length-prefixed injective serialization of the
    * (channel, last_src_ts, resume_ts) rows — see the encoding notes
    * at the catch-up call site.
    */
  private def stateToken(rows: Seq[org.apache.spark.sql.Row]): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.sortBy(_.getAs[String]("channel")).foreach { r =>
      def field(i: Int): String =
        if (r.isNullAt(i)) "null" else r.getLong(i).toString
      // Length-prefixed fields: any in-band separator (even NUL) can
      // in principle be forged by a channel NAME containing it, making
      // two distinct states serialize identically; the prefix makes
      // the encoding injective with no reserved characters.
      val name = r.getAs[String]("channel").getBytes("UTF-8")
      md.update((name.length.toString + ":").getBytes("UTF-8"))
      md.update(name)
      Seq(field(1), field(2)).foreach { f =>
        md.update((f.length.toString + ":" + f).getBytes("UTF-8"))
      }
    }
    java.nio.ByteBuffer.wrap(md.digest()).getLong
  }

  /** Typed cascade materialization: raw typed samples and every
    * decimation level as typed stores, each level decimating the
    * previous through the full 21-type dispatch
    * ([[TypedDecimation.asTypedSamples]] is the hop conversion —
    * aggregated windows re-enter weighted by their covered fraction,
    * pick-first windows as their payload). Enum, array, and string
    * channels thus cascade with the same semantics the live typed
    * stream applies.
    */
  def materializeTyped(spark: SparkSession, storePath: String,
                       typedRaw: DataFrame, levelsSec: Seq[Long],
                       backend: StoreBackend = ArchiveBackend,
                       retentionSec: Map[Long, Long] = Map.empty): Unit = {
    backend.write(Samples.monotonicDedup(typedRaw), storePath, 0)
    retainAfterWrite(spark, storePath, 0L, retentionSec, backend)
    var done = List(0L)
    for (target <- levelsSec.sorted) {
      val source = Decimation.selectSourcePeriod(target, done)
      val src = backend.read(spark, storePath, source)
      backend.write(asTypedStoreRows(typedHop(src, source, target)),
        storePath, target)
      // typed samples hold-last-value at EVERY level (the fine
      // aggregated sample is held until the next fine sample), so the
      // resume watermark always needs the held-boundary logic
      writeWatermarks(spark, storePath, target, src, source,
        heldSource = true)
      retainAfterWrite(spark, storePath, target, retentionSec, backend)
      done ::= target
    }
  }

  /** Typed decimated rows keyed for the store (win_start → ts). */
  private def asTypedStoreRows(decimated: DataFrame): DataFrame =
    decimated.withColumnRenamed("win_start", "ts")

  private def fromTypedStore(stored: DataFrame): DataFrame =
    stored.withColumnRenamed("ts", "win_start")

  /** §3.3 incremental catch-up: extend one materialized level over
    * source data that arrived since the last run. Reads only source
    * rows at-or-after each channel's `resume_ts` (the global minimum
    * prunes day partitions; the per-channel bound rides a broadcast
    * join), re-decimates that suffix — identical window stats to a
    * from-scratch build because the resume point preserves the held
    * boundary — and appends only windows past the old flush frontier.
    * Channels with no watermark (new channels) get a full pass, like
    * the reference's no-decimated-sample-yet path
    * (ArchivedChannelDecimatedSamplesDecimationLevel.java:396-401).
    */
  def catchUp(spark: SparkSession, storePath: String, targetSec: Long,
              backend: StoreBackend = ArchiveBackend,
              retentionSec: Map[Long, Long] = Map.empty,
              knownChannels: Option[Seq[String]] = None): Unit =
    catchUpImpl(spark, storePath, targetSec, hop, asStoreRows,
      backend = backend, retentionSec = retentionSec,
      knownChannels = knownChannels)

  /** [[catchUp]] for typed-union stores built by [[materializeTyped]]:
    * identical watermark machinery (the resume math is ts-based and
    * type-agnostic), typed dispatch in the hop.
    */
  def catchUpTyped(spark: SparkSession, storePath: String, targetSec: Long,
                   backend: StoreBackend = ArchiveBackend,
                   retentionSec: Map[Long, Long] = Map.empty,
                   knownChannels: Option[Seq[String]] = None): Unit =
    catchUpImpl(spark, storePath, targetSec, typedHop, asTypedStoreRows,
      heldSource = true, backend = backend, retentionSec = retentionSec,
      knownChannels = knownChannels)

  private def typedHop(source: DataFrame, sourceSec: Long,
                       targetSec: Long): DataFrame =
    if (sourceSec == 0L)
      TypedDecimation.decimate(source, targetSec * Samples.NS)
    else
      TypedDecimation.decimate(
        TypedDecimation.asTypedSamples(fromTypedStore(source)),
        targetSec * Samples.NS)

  private def catchUpImpl(spark: SparkSession, storePath: String,
                          targetSec: Long,
                          hopFn: (DataFrame, Long, Long) => DataFrame,
                          toStore: DataFrame => DataFrame,
                          heldSource: Boolean = false,
                          backend: StoreBackend = ArchiveBackend,
                          retentionSec: Map[Long, Long] = Map.empty,
                          knownChannels: Option[Seq[String]] = None): Unit = {
    val levels = backend.levels(spark, storePath).filter(_ != targetSec)
    val source = Decimation.selectSourcePeriod(targetSec, levels)
    val targetP = targetSec * Samples.NS

    val wm = readWatermarks(spark, storePath, targetSec)
    val wmRows = wm.collect()
    val globalMin =
      if (wmRows.isEmpty) None
      else Some(wmRows.map(_.getAs[Long]("resume_ts")).min)
    val bounds = wm.select(col("channel").as("_c"),
      col("last_src_ts"), col("resume_ts"))

    val clipped = backend.read(spark, storePath, source, globalMin)
      .join(broadcast(bounds), col("channel") === col("_c"), "left")
      .where(col("resume_ts").isNull || col("ts") >= col("resume_ts"))
    // Channels with no watermark yet (first seen after the last run)
    // need their FULL history. Detect them against the source level's
    // channel set — NOT against `clipped`: a new channel whose entire
    // history predates the global clip is absent from the clipped read,
    // and deriving "new" from it would silently skip that history and
    // then watermark it as processed. `knownChannels` is the registry
    // route ([[ConfiguredArchive.catchUp]] passes the configured
    // channel set): a metadata lookup instead of the fallback
    // source-level distinct — which, though column-pruned and
    // dictionary-backed, is still a full-level footer+column pass per
    // cascade hop at 100 TB.
    val seen = wmRows.map(_.getAs[String]("channel")).toSet
    val newChannels =
      if (globalMin.isEmpty) Array.empty[String]
      else knownChannels match {
        case Some(cs) => cs.filterNot(seen).toArray
        case None => backend.read(spark, storePath, source)
          .select("channel").distinct()
          .collect().map(_.getString(0)).filterNot(seen)
      }
    val src =
      if (newChannels.isEmpty || globalMin.isEmpty) clipped
      else clipped.where(col("resume_ts").isNotNull)
        .unionByName(backend.read(spark, storePath, source)
          .where(col("channel").isin(newChannels.toSeq: _*))
          .join(broadcast(bounds), col("channel") === col("_c"), "left"))

    // a raw suffix may contain undeduplicated streaming appends (the
    // continuous sink writes arrival order): both the hop AND the
    // held-boundary watermark must see the F6-deduplicated view, or an
    // out-of-order late arrival pulls resume_ts past the true held
    // sample and the frontier window loses its hold coverage
    val suffixRaw = src.drop("_c", "last_src_ts", "resume_ts")
    val suffix =
      if (source == 0L) Samples.monotonicDedup(suffixRaw) else suffixRaw
    val dec = hopFn(suffix, source, targetSec)
      .join(broadcast(bounds), col("channel") === col("_c"), "left")
      .where(col("last_src_ts").isNull ||
        col("win_start") + targetP > col("last_src_ts"))
      .drop("_c", "last_src_ts", "resume_ts")

    // New watermarks WITHOUT rescanning the full source level: the
    // suffix starts at each present channel's old resume point, so its
    // per-channel stats (frontier, held boundary) are complete for
    // every channel it contains; channels with no new data keep their
    // old row verbatim. Collected BEFORE the write: the commit token
    // hashes this POST-run state, so an idle run records exactly the
    // token it would compute again (skipping is correct — nothing to
    // write), while any run that saw new data produces a different
    // state and a different token. Hashing the PRE-run state instead
    // would let an idle run poison the token: the next run WITH data
    // recomputes the idle run's token, skips its append, yet advances
    // the watermark — permanent silent loss.
    val spark2 = suffix.sparkSession
    import scala.jdk.CollectionConverters._
    val oldWm = spark2.createDataFrame(wmRows.toSeq.asJava, wm.schema)
      .select(col("channel").as("_oc"), col("last_src_ts").as("_ol"),
        col("resume_ts").as("_or"))
    val suffixWm = computeWatermarks(suffix, targetSec, source, heldSource)
    val mergedRows = suffixWm
      .join(oldWm, col("channel") === col("_oc"), "full_outer")
      .select(
        coalesce(col("channel"), col("_oc")).as("channel"),
        coalesce(col("last_src_ts"), col("_ol")).as("last_src_ts"),
        coalesce(col("resume_ts"), col("_or")).as("resume_ts"))
      .collect()
    // collision-resistant token ([[stateToken]]): SHA-256 over a
    // canonical length-prefixed serialization, truncated to 64 bits.
    // A 31-multiplier fold had enough structure that two distinct
    // post-run states could collide, and a collision makes
    // commitIfChanged silently skip a GENUINE append — permanent
    // loss in the decimated level. Null watermark fields (never
    // expected — the merge coalesces two non-null frames) are encoded
    // explicitly rather than NPE-ing in an unboxing getAs[Long].
    // MIGRATION CAVEAT: this length-prefixed encoding replaced the
    // round-3 format, so a token persisted by the OLD format never
    // matches a new-format recomputation — a crash-replay straddling
    // that upgrade re-applies its batch once (at-least-once at
    // migration, exactly-once before and after). Inherent to any
    // token-encoding change; if the encoding changes again, bump the
    // writerId (e.g. "catchup2:") so the stale token is simply
    // superseded rather than compared.
    val token = stateToken(mergedRows.toSeq)
    // exactly-once on a transactional backend: a crash-replay between
    // this write and the watermark persist recomputes the identical
    // post-run state and token, and the duplicate append is skipped
    // (the plain-parquet backend has no txn metadata and keeps its
    // documented at-least-once behavior)
    backend.writeTxn(toStore(dec), storePath, targetSec,
      writerId = s"catchup:$targetSec", token = token)
    persistWatermarks(
      spark2.createDataFrame(mergedRows.toSeq.asJava, wm.schema),
      storePath, targetSec)
    retainAfterWrite(spark, storePath, targetSec, retentionSec, backend)
  }
}
