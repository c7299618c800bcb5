package graft.archive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-channel analytics over the archive — the queries an archiver
  * USER runs on top of the serving surface (the reference exposes raw
  * and decimated samples; finding which PVs move together, or how a
  * PV's values distribute, is what people fetch them FOR).
  */
object Analytics {

  /** Pearson correlation of one probe channel's decimated window
    * means against every other channel's, over exactly-aligned
    * windows — "which PVs move with this one" (correlated-channel
    * search, the first stop of any beam-physics incident analysis).
    *
    * Scale shape: probe-vs-all is LINEAR in channels (the all-pairs
    * matrix is O(C²) and never built); the probe's window series is
    * tiny (windows of one channel) and broadcasts into the join, so
    * the cost is one decimation pass + one channel-keyed aggregation.
    *
    * Determinism: window means quantize to the 6dp integer grid
    * BEFORE the moment sums, so Σx/Σy/Σxy/Σx²/Σy² are exact DECIMAL
    * integer sums (order-free); the closed-form correlation is then
    * one fixed-order double expression, scale-rounded at the edge.
    * A constant series (zero variance) gets corr 0, not NaN.
    */
  def correlatedChannels(samples: DataFrame, periodNanos: Long,
                         probe: String): DataFrame = {
    val g = Decimation.decimate(samples, periodNanos)
      .select(col("channel"), col("win_start"),
        round(col("mean") * lit(1e6)).cast("long").as("q"))
    val x = g.where(col("channel") === probe)
      .select(col("win_start"), col("q").as("x"))
    val y = g.where(col("channel") =!= probe)
      .select(col("channel").as("other"), col("win_start"),
        col("q").as("y"))
    val d = (c: Column) => c.cast("decimal(19,0)")
    val a = y.join(broadcast(x), Seq("win_start"))
      .groupBy("other")
      .agg(count(lit(1)).as("n"),
        sum(d(col("x"))).cast("double").as("sx"),
        sum(d(col("y"))).cast("double").as("sy"),
        sum(d(col("x")) * d(col("y"))).cast("double").as("sxy"),
        sum(d(col("x")) * d(col("x"))).cast("double").as("sxx"),
        sum(d(col("y")) * d(col("y"))).cast("double").as("syy"))
    val n = col("n").cast("double")
    val num = n * col("sxy") - col("sx") * col("sy")
    val den = sqrt(n * col("sxx") - col("sx") * col("sx")) *
      sqrt(n * col("syy") - col("sy") * col("sy"))
    val corr = when(den === 0.0, lit(0.0)).otherwise(num / den)
    a.select(col("other").as("channel"), col("n").as("n_windows"),
        (round(corr * lit(1e6)).cast("long").cast("double") / lit(1e6))
          .as("corr"))
      .orderBy(col("corr").desc, col("channel"))
  }

  /** Per-channel value histogram over fixed [lo, hi) bins (out-of-
    * range values clamp to the edge bins) — the distribution panel of
    * an archive viewer. One shuffle-free binning projection + one
    * map-side-combinable count; at 100 TB this is a scan whose output
    * is channels × bins rows.
    */
  def histogram(samples: DataFrame, bins: Int, lo: Double,
                hi: Double): DataFrame =
    // NaN is out-of-domain, not "bin 0": floor(NaN) cast to int is 0 in
    // Spark, which would silently count NaN samples in the lowest bin
    // (and diverge from engines whose cast rejects NaN) — exclude it
    // alongside NULL so both edge bins hold only real clamped values
    samples.where(col("value").isNotNull && !isnan(col("value")))
      .select(col("channel"),
        least(lit(bins - 1), greatest(lit(0),
          floor((col("value") - lit(lo)) * lit(bins) / lit(hi - lo))
            .cast("int"))).as("bin"))
      .groupBy("channel", "bin")
      .agg(count(lit(1)).as("n"))
      .select(col("channel"), col("bin"),
        (lit(lo) + col("bin").cast("double") * lit((hi - lo) / bins))
          .as("bin_lo"),
        col("n"))
}
