package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet under `\$sfDir/<name>.parquet`. The
  * `events` table carries a nanosecond-precision timestamp, which Spark
  * only exposes via `spark.sql.legacy.parquet.nanosAsLong` — we want it
  * as a raw Long anyway, because the engine's canonical time unit is
  * nanoseconds-since-epoch (reference:
  * cassandra-pv-archiver-control-system-api/.../Sample.java:22-28).
  */
object Tables {

  /** Enable Long-nanos parquet reads; idempotent, cheap. */
  private def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    withNanos(spark).read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def events(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
