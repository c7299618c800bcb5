package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * A warm-up pass first touches every input table (file listing,
  * footer reads, JVM/codegen warm-up) so per-query numbers measure the
  * plans, not session cold-start.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: table footers + one tiny end-to-end plan
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => graft.core.Tables.read(spark, sfDir, t).count())
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      (name, dt, n)
    }

    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nEvents = graft.core.Tables.events(spark, sfDir).count()
    val decSec = results.find(_._1 == "arch_decimate_1h").map(_._2).getOrElse(1.0)
    val extras =
      s""""events_rows":$nEvents,"decimate_rows_per_sec":${(nEvents / decSec).toLong}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$extras,"sf":"$sfDir"}""")
    spark.stop()
  }
}
