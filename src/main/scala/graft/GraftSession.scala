package graft

import org.apache.spark.sql.SparkSession

import graft.archive.Decimation
import graft.core.Samples

/** SQL-facing entry point: register the engine's frames and functions
  * on a session so everything is reachable from `spark.sql` — the
  * "switch from the reference" surface for SQL users.
  *
  * {{{
  *   GraftSession.register(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT * FROM samples WHERE ts BETWEEN :lo AND :hi")
  *   spark.sql("SELECT channel, win_start, mean FROM decimated_1h")
  *   spark.sql("SELECT vector_dot(a.embedding_d, b.embedding_d) ...")
  * }}}
  */
object GraftSession {

  def register(spark: SparkSession, sfDir: String): Unit = {
    // canonical sample frames
    Samples.fromEvents(spark, sfDir).createOrReplaceTempView("samples")
    Samples.monotonicDedup(Samples.fromEvents(spark, sfDir))
      .createOrReplaceTempView("samples_clean")
    Samples.fromEventsWithMarkers(spark, sfDir)
      .createOrReplaceTempView("samples_marked")
    // pre-wired decimation levels (lazy views — nothing materializes
    // until queried, and Catalyst prunes through them)
    Decimation.decimate(Samples.fromEventsWithMarkers(spark, sfDir),
        3600L * Samples.NS)
      .createOrReplaceTempView("decimated_1h")
    Decimation.reAggregate(
        Decimation.decimate(Samples.fromEventsWithMarkers(spark, sfDir),
          3600L * Samples.NS), 3600L * Samples.NS, 21600L * Samples.NS)
      .createOrReplaceTempView("decimated_6h")
    // the full 21-type value union and its decimation (lazy views)
    core.TypedSamples.fromEvents(spark, sfDir)
      .createOrReplaceTempView("samples_typed")
    archive.TypedDecimation.decimate(
        core.TypedSamples.fromEvents(spark, sfDir), 3600L * Samples.NS)
      .createOrReplaceTempView("decimated_typed_1h")
    // corpus tables
    core.Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    core.Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    // curation views (lazy): per-doc quality + repetition signals and
    // the deterministic split assignment
    pipeline.TextAnalysis.quality(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_quality")
    pipeline.TextAnalysis.repetition(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_repetition")
    pipeline.Sampling.hashSplit(core.Tables.documents(spark, sfDir),
        Seq(("train", 0.9), ("val", 0.95), ("test", 1.0)))
      .createOrReplaceTempView("doc_splits")
    pipeline.TextAnalysis.unigramScore(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_unigram_score")
    pipeline.Dedup.segmentDedup(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_segment_deduped")
    pipeline.Dedup.winnowFingerprints(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_winnow_fps")
    pipeline.Sampling.dsirWeights(
        core.Tables.documents(spark, sfDir)
          .where(org.apache.spark.sql.functions.col("doc_id") % 11 =!= 0),
        core.Tables.documents(spark, sfDir)
          .where(org.apache.spark.sql.functions.col("doc_id") % 11 === 0))
      .createOrReplaceTempView("doc_dsir_weights")
    // SNAPSHOT semantics: semanticDedup (like imageNearDupPairs)
    // lazy-localCheckpoints its per-vector centroid frame, so this
    // view FREEZES at its first materialization for the session's
    // lifetime — later changes to the embeddings table are not
    // reflected, and the checkpointed blocks live until the session
    // (or an explicit re-register) drops them. That is the right
    // trade for a dedup report (one consistent pass, read many
    // times); call Similarity.semanticDedup directly per batch when
    // fresh-per-query results matter.
    pipeline.Similarity.semanticDedup(
        core.Tables.embeddings(spark, sfDir), minCos = 0.3)
      .createOrReplaceTempView("emb_semantic_dedup")
    pipeline.TextAnalysis.hashedLinearScore(
        core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_classifier_score")
    // the TRAINED classifier path (same ±1 language labels as the
    // gated text_classifier_trained query) and the Lloyd-refined IVF
    // quantizer — round-5 ops, SQL-reachable like the rest
    pipeline.TextAnalysis.hashedLinearScore(
        core.Tables.documents(spark, sfDir),
        Some(pipeline.TextAnalysis.trainHashedWeights(
          core.Tables.documents(spark, sfDir),
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("lang") === "en", 1.0)
            .otherwise(-1.0))))
      .createOrReplaceTempView("doc_classifier_trained")
    pipeline.Similarity.ivfCentroidsRounded(
        core.Tables.embeddings(spark, sfDir), k = 8, iters = 2)
      .createOrReplaceTempView("emb_ivf_centroids_refined")
    // same hyper-parameters as the oracle-gated queries — a SQL user
    // must see exactly the verified computation
    pipeline.Sampling.qualityBucketSample(
        core.Tables.documents(spark, sfDir),
        rates = Seq(0.1, 0.3, 0.6, 0.9), vocabSize = 20)
      .createOrReplaceTempView("doc_quality_sample")
    pipeline.Dedup.duplicateSpans(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_dup_spans")
    pipeline.Dedup.spanDedupedCorpus(core.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("doc_span_deduped")
    pipeline.Dedup.contaminationReport(
        core.Tables.documents(spark, sfDir)
          .where(org.apache.spark.sql.functions.col("doc_id") % 11 =!= 0),
        core.Tables.documents(spark, sfDir)
          .where(org.apache.spark.sql.functions.col("doc_id") % 11 === 0),
        k = 3)
      .createOrReplaceTempView("eval_contamination")
    // round-5 analytics: trailing 1h rolling aggregates over the clean
    // history and 12h-gap event sessions (both lazy, both the same
    // parameters as their oracle gates)
    archive.Rolling.trailing(
        Samples.monotonicDedup(Samples.fromEvents(spark, sfDir)), 3600L)
      .createOrReplaceTempView("samples_rolling_1h")
    // round-9 analytics: the derived (calculated) channel and the
    // lead/lag scan, same parameters as their oracle gates
    archive.Analytics.derivedChannel(
        Samples.monotonicDedup(Samples.fromEvents(spark, sfDir)),
        "calc:click-view", "click", "view", _ - _,
        OracleSql.LO, OracleSql.HI, OracleSql.P1H)
      .createOrReplaceTempView("derived_click_view")
    archive.Analytics.lagCorrelation(
        Samples.monotonicDedup(Samples.fromEvents(spark, sfDir)),
        "click", "view", OracleSql.LO, OracleSql.HI, OracleSql.P1H,
        maxLagSteps = 6)
      .createOrReplaceTempView("lag_correlation_click_view")
    streaming.Sessionize.sessions(core.Tables.events(spark, sfDir), 43200L)
      .createOrReplaceTempView("event_sessions")
    // round-5 text analytics: CMS heavy hitters and PMI collocations
    // (same parameters as their oracle gates)
    locally {
      import org.apache.spark.sql.functions.explode
      val d = core.Tables.documents(spark, sfDir)
      pipeline.TextAnalysis.cmsHeavyHitters(
          d.select(explode(pipeline.Dedup.tokens("text")).as("tok")).distinct(),
          pipeline.TextAnalysis.countMinSketch(d))
        .createOrReplaceTempView("corpus_heavy_hitters")
      pipeline.TextAnalysis.collocations(d)
        .createOrReplaceTempView("corpus_collocations")
      pipeline.Similarity.normalizeCenter(
          core.Tables.embeddings(spark, sfDir))
        .createOrReplaceTempView("emb_normalized")
      // doc stop-density deliberately has NO pre-wired view: its
      // discovered-stopword list requires materializing the sketch
      // (a collect), and register() must stay lazy — compose it from
      // corpus_heavy_hitters when needed
    }
    // round-6 archive analytics (lazy, gate parameters): inter-sample
    // gaps over 15 min, per-sample dv/dt, and the 6h linear resample
    locally {
      import org.apache.spark.sql.functions._
      val clean = Samples.monotonicDedup(Samples.fromEvents(spark, sfDir))
      archive.ArchiveReader.gapReport(clean, 900L)
        .createOrReplaceTempView("samples_gaps")
      archive.ArchiveReader.rateOfChange(clean)
        .createOrReplaceTempView("samples_rate")
      archive.ArchiveReader.healthReport(clean, 900L, 3600L, 3.0)
        .createOrReplaceTempView("channel_health")
      val grid = Samples.fromEvents(spark, sfDir).select("channel").distinct()
        .withColumn("g", explode(sequence(lit(OracleSql.LO),
          lit(OracleSql.HI), lit(OracleSql.P6H))))
      archive.ArchiveReader.resampleLinear(clean, grid)
        .createOrReplaceTempView("samples_resampled_6h")
      // Matryoshka tiers (dims = 16, the gate parameters) — BOTH
      // registered under their gate names so a view's results always
      // match the oracle of the same name: _topk is the pure truncated
      // prefix ranking, _reranked the prefix shortlist + full-dim
      // rerank
      val e = core.Tables.embeddings(spark, sfDir)
      pipeline.Similarity.matryoshkaTopK(
          e, e.where(col("vec_id") < 5), 16, 10)
        .createOrReplaceTempView("emb_matryoshka_topk")
      pipeline.Similarity.matryoshkaReranked(
          e, e.where(col("vec_id") < 5), 16, 10)
        .createOrReplaceTempView("emb_matryoshka_reranked")
    }
    // round-7 training-prep ops (lazy, gate parameters)
    locally {
      import org.apache.spark.sql.functions._
      val d = core.Tables.documents(spark, sfDir)
      pipeline.TextAnalysis.chunkDocs(d, 64, 48)
        .createOrReplaceTempView("doc_chunks")
      val vocab = pipeline.TextAnalysis.vocabulary(d, 1000)
      vocab.createOrReplaceTempView("corpus_vocab")
      pipeline.TextAnalysis.encodeIds(d, vocab)
        .createOrReplaceTempView("doc_token_ids")
      pipeline.Retrieval.invertedIndex(d, minDf = 2L, maxDf = 1000000L)
        .createOrReplaceTempView("corpus_inverted_index")
      pipeline.Sampling.interleave(d)
        .createOrReplaceTempView("corpus_interleaved")
      val e = core.Tables.embeddings(spark, sfDir)
      pipeline.Similarity.semanticDecontaminate(
          e, e.where(col("vec_id") < 5), minCos = 0.3)
        .createOrReplaceTempView("emb_decontaminated")
    }
    // native functions
    functions.VectorExpressions.register(spark)
  }

  /** Register a manifest-committed store's levels as SQL views —
    * `{name}_raw` for level 0 and `{name}_l{sec}` per decimated level.
    * Views are lazy: manifest-side file pruning applies when a query's
    * predicates reach the underlying read, and nothing materializes
    * until queried.
    */
  def registerManifestStore(spark: SparkSession, path: String,
                            name: String): Unit =
    archive.ManifestStore.latestManifest(spark, path)
      .map(_.files.map(_.levelSec).distinct.sorted)
      .getOrElse(Nil)
      .foreach { l =>
        val view = if (l == 0L) s"${name}_raw" else s"${name}_l$l"
        archive.ManifestStore.read(spark, path, l)
          .createOrReplaceTempView(view)
      }
}
