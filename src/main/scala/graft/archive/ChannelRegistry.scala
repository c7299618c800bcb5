package graft.archive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Channel registry operations (SURVEY.md §2.1 S7, §2.2 F3/F4, §2.6 O4)
  * — the reference's channel listing / glob / regexp endpoints
  * (Api10Controller.java:189-345) over a metadata frame derived from
  * the sample store. At 100 TB the registry is tiny (one row per
  * channel) and always broadcast.
  */
object ChannelRegistry {

  /** S7/O4 — per-channel summary, name-ordered (the reference keeps
    * channels in a SortedMap, ChannelInformationCacheImpl.java:156).
    */
  def registry(samples: DataFrame): DataFrame =
    samples.groupBy("channel")
      .agg(
        count(lit(1)).as("n_samples"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        max(col("severity")).as("max_severity"))
      .orderBy("channel")

  /** J2 — channel-name → rename-stable data id resolution: the
    * reference resolves every request's channel name to its permanent
    * `channelDataId` through an in-memory cache
    * (ChannelInformationCacheImpl); here the config set is a broadcast
    * join — per-channel metadata is tiny at any corpus scale.
    */
  /** The (channel_data_id → current name) mapping as a broadcastable
    * frame — the one resolution both stores' `readById` join against.
    */
  private[archive] def nameFrame(spark: org.apache.spark.sql.SparkSession,
                                 configs: Seq[ChannelConfig]): DataFrame = {
    import spark.implicits._
    configs.map(c => (c.channelDataId, c.name))
      .toDF("channel_data_id", "channel")
  }

  def withConfigs(samples: DataFrame,
                  configs: Seq[ChannelConfig]): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val meta = configs
      .map(c => (c.name, c.channelDataId, c.controlSystemType, c.enabled))
      .toDF("channel", "channel_data_id", "control_system_type", "enabled")
    samples.join(org.apache.spark.sql.functions.broadcast(meta), Seq("channel"), "left")
  }

  /** §2.8 Map — the reference keeps per-channel `options
    * map<text,text>` and `decimation_level_to_retention map<int,
    * bigint>` (ChannelMetaDataDAOImpl.java:2116-2122); here the same
    * shapes are native MapType columns built per channel, consumed
    * with `element_at` / `map_keys` / `size` — no blob, no UDF.
    */
  def configMap(samples: DataFrame): DataFrame =
    registry(samples).select(
      col("channel"),
      map(
        lit("unit"), concat(lit("u_"), col("channel")),
        lit("rate"), pmod(col("n_samples"), lit(100)).cast("string"))
        .as("options"),
      map(
        lit(0), lit(0L), // raw: keep forever
        lit(3600), lit(7L * 86400L),
        lit(21600), lit(30L * 86400L)).as("retention_sec"))
  /** Collapse the per-channel `decimation_level_to_retention` maps
    * (the [[configMap]] shape) into one per-level retention for the
    * cascade's write-triggered retention: the MAX across channels —
    * day buckets are shared by every channel, so dropping one deletes
    * all channels' rows, and the most-conservative retention is the
    * only safe per-partition rule (a channel wanting shorter retention
    * just keeps data a little longer; the converse would lose data).
    * Levels where any channel asks for 0 (keep forever) stay 0.
    */
  def levelRetention(cfg: DataFrame): Map[Long, Long] =
    cfg.select(explode(col("retention_sec")).as(Seq("level", "keep")))
      .groupBy("level")
      .agg(when(min(col("keep")) === 0L, 0L)
        .otherwise(max(col("keep"))).as("keep"))
      .collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap

  def dataIdFor(configs: Seq[ChannelConfig], name: String): Option[String] =
    configs.find(_.name == name).map(_.channelDataId)

  /** Ingest-side resolution: replace the transient channel name with
    * the permanent `channel_data_id` (broadcast join) so the store
    * layout survives renames. Unconfigured channels are dropped —
    * the reference likewise refuses samples for unknown channels.
    */
  def resolveToId(samples: DataFrame,
                  configs: Seq[ChannelConfig]): DataFrame = {
    val spark = samples.sparkSession
    import spark.implicits._
    val meta = configs.map(c => (c.name, c.channelDataId))
      .toDF("channel", "channel_data_id")
    samples.join(org.apache.spark.sql.functions.broadcast(meta),
      Seq("channel")).drop("channel")
  }

  /** F3 — compile a `*`/`?` glob into an anchored, case-insensitive
    * regex, quoting every other metacharacter — same contract as
    * Api10Controller.compileGlobPattern (:307-345), fresh
    * implementation.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("(?i)^")
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()<>+-=!?^$|".contains(c) => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** F3 — channel listing filtered by glob. */
  def channelsByGlob(samples: DataFrame, glob: String): DataFrame =
    registry(samples).where(col("channel").rlike(globToRegex(glob)))

  /** F4 — channel listing filtered by raw regexp (anchored, like the
    * reference's Pattern.matches).
    */
  def channelsByRegex(samples: DataFrame, regex: String): DataFrame =
    registry(samples).where(col("channel").rlike("^(?:" + regex + ")$"))
}
