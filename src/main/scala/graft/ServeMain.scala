package graft

import org.apache.spark.sql.SparkSession

import graft.archive.{ArchiveBackend, HttpArchiveServer, ManifestBackend}

/** The curl-able serving process: one Spark session + the archive-access
  * HTTP API over a config/store pair.
  *
  * {{{
  * sbt -batch "runMain graft.ServeMain <configPath> <storePath> [port]"
  * curl 'http://localhost:<port>/archive-access/api/1.0/archive/1/samples/ch0?start=0&end=9999999999999999999'
  * }}}
  *
  * `SPARK_GRAFT_BACKEND=archive` serves a raw-parquet [[ArchiveBackend]]
  * store instead of the default manifest-committed one.
  * `SPARK_GRAFT_REFUSE_DISABLED=true` turns disabled-channel serving
  * into 403 (default matches the reference: history serves).
  * `SPARK_GRAFT_ADMIN_AUTH=user:password` puts HTTP Basic auth on the
  * admin context (`/admin/api/...`); archive-access stays anonymous.
  *
  * Fleet bookkeeping: every instance registers in the server registry
  * at `<configPath>/_servers` (override `SPARK_GRAFT_REGISTRY=<dir>`,
  * disable `SPARK_GRAFT_REGISTRY=off`) with a 5 s renewal heartbeat —
  * `GET /admin/api/1.0/cluster-status` then shows the live fleet.
  * `SPARK_GRAFT_SERVER_ID` / `SPARK_GRAFT_SERVER_NAME` identify the
  * instance (default: a random UUID / the hostname). Maintenance
  * passes coordinate through the same registry's duty leases
  * ([[graft.archive.ServerRegistry.withDuty]]), so N instances over
  * one store run compaction/vacuum exactly once.
  */
object ServeMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ServeMain <configPath> <storePath> [port]")
    val (configPath, storePath) = (args(0), args(1))
    val port = if (args.length > 2) args(2).toInt else 8080
    val backend = sys.env.get("SPARK_GRAFT_BACKEND") match {
      case Some("archive") => ArchiveBackend
      case _ => ManifestBackend
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val refuseDisabled =
      sys.env.get("SPARK_GRAFT_REFUSE_DISABLED").contains("true")
    val adminAuth = sys.env.get("SPARK_GRAFT_ADMIN_AUTH").map { s =>
      val i = s.indexOf(':')
      require(i > 0, "SPARK_GRAFT_ADMIN_AUTH must be user:password")
      s.take(i) -> s.drop(i + 1)
    }
    val registryDir = sys.env.get("SPARK_GRAFT_REGISTRY") match {
      case Some("off") => None
      case Some(dir) => Some(dir)
      case None => Some(s"$configPath/_servers")
    }
    val serverId = sys.env.getOrElse("SPARK_GRAFT_SERVER_ID",
      java.util.UUID.randomUUID().toString)
    val serverName = sys.env.getOrElse("SPARK_GRAFT_SERVER_NAME",
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: java.net.UnknownHostException => "graft" })
    val running = HttpArchiveServer.start(spark, configPath, storePath,
      backend, port, refuseDisabled = refuseDisabled,
      adminAuth = adminAuth, registryDir = registryDir,
      serverId = serverId, serverName = serverName)
    println(s"[graft] serving ${running.baseUrl}/ (Ctrl-C to stop)")
    sys.addShutdownHook { running.stop(); spark.stop() }
    Thread.currentThread().join()
  }
}
