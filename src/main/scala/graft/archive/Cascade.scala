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

  /** Write raw samples and materialize every level in `levelsSec`
    * (ascending), cascading from the best available source.
    */
  def materialize(spark: SparkSession, storePath: String,
                  raw: DataFrame, levelsSec: Seq[Long]): Unit = {
    ArchiveStore.write(Samples.monotonicDedup(raw), storePath, 0)
    var done = List(0L)
    for (target <- levelsSec.sorted) {
      val source = Decimation.selectSourcePeriod(target, done)
      val dec =
        if (source == 0L)
          Decimation.decimate(
            ArchiveStore.read(spark, storePath, 0), target * Samples.NS)
        else
          Decimation.reAggregate(
            asDecimated(ArchiveStore.read(spark, storePath, source)),
            source * Samples.NS, target * Samples.NS)
      ArchiveStore.write(asStoreRows(dec), storePath, target)
      done ::= target
    }
  }
}
