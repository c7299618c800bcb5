package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet under `\$sfDir/<name>.parquet`. The
  * `events` table carries a high-precision timestamp; the engine's
  * canonical time unit is nanoseconds-since-epoch as a plain Long
  * (reference: cassandra-pv-archiver-control-system-api/.../
  * Sample.java:22-28), so [[events]] normalizes whatever physical type
  * the generator used:
  *
  *  - parquet TIMESTAMP(NANOS): `spark.sql.legacy.parquet.nanosAsLong`
  *    surfaces it directly as a ns Long — used as-is.
  *  - parquet TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ): the raw column
  *    is kept under `ts_src` (so range predicates can still be pushed
  *    to the parquet scan against its row-group statistics) and a
  *    derived ns-Long `ts` is added. The session timezone is pinned to
  *    UTC so the NTZ→instant interpretation matches DuckDB's
  *    `epoch_ns(naive_ts)` on the oracle side.
  */
object Tables {

  /** Enable Long-nanos parquet reads + UTC wall-clock interpretation;
    * idempotent, cheap.
    *
    * SIDE EFFECT, by contract: reading any table pins
    * `spark.sql.session.timeZone` to UTC for the WHOLE session. This
    * is deliberate and load-bearing, not incidental — the NTZ→instant
    * cast in [[events]] and the store layouts' UTC day-bucketing
    * contract (`ArchiveStore.bucketDateCol`, shared by the manifest
    * store, the streaming sink, and retention) both read the session
    * timezone, so an engine session MUST run UTC or stores written and
    * read under different zones would disagree on day boundaries. An
    * application embedding this library that needs another zone for
    * its own timestamp rendering should do that rendering in a
    * separate session (or convert explicitly with from_utc_timestamp)
    * rather than re-pinning this conf.
    */
  private def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // loudly, not silently: an embedding application that had pinned a
    // different zone for its own rendering gets one warning line the
    // first time the engine re-pins it, instead of a quiet semantic
    // shift in unrelated timestamp queries
    // conf.getAll, NOT getOption: getOption falls through to SQLConf's
    // DEFAULT (the JVM zone) on a session that never set the conf, so
    // a vanilla spark-shell on a non-UTC JVM would be warned about a
    // pin "it made" that it never made. getAll carries only
    // EXPLICITLY-set entries (SQLConf.getAllConfs = the settings map),
    // so the warning fires exactly when an embedding application had
    // actually pinned a different zone.
    val explicitTz = spark.conf.getAll.get("spark.sql.session.timeZone")
    val effectiveTz = spark.conf.getOption("spark.sql.session.timeZone")
    if (!effectiveTz.contains("UTC")) {
      explicitTz.filter(_ != "UTC") match {
        case Some(z) => System.err.println(
          s"[graft] overriding spark.sql.session.timeZone '$z' -> UTC " +
            "(engine contract; see Tables.withNanos scaladoc)")
        case None =>
          // a vanilla session on a non-UTC JVM never pinned anything,
          // so "overriding" would be wrong — but re-pinning COMPLETELY
          // silently would reintroduce the quiet semantic shift in
          // timestamp rendering the warning exists to surface. One
          // informational line, not a warning.
          effectiveTz.foreach(z => System.err.println(
            s"[graft] pinning spark.sql.session.timeZone to UTC " +
              s"(JVM default was '$z'; engine contract, see " +
              "Tables.withNanos scaladoc)"))
      }
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
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

  /** The events table with `ts` guaranteed to be nanoseconds-since-epoch
    * as a Long. When the source column is timestamp-typed, the raw
    * (pushable) column survives as `ts_src`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = read(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        df.withColumnRenamed("ts", "ts_src")
          .withColumn("ts",
            unix_micros(col("ts_src").cast(TimestampType)) * lit(1000L))
      case TimestampType =>
        df.withColumnRenamed("ts", "ts_src")
          .withColumn("ts", unix_micros(col("ts_src")) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
