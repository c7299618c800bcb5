package graft.archive

import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Fleet liveness + duty coordination for N stateless serving
  * processes — the re-expression of the reference's cluster
  * bookkeeping (`ClusterManagementService.java:93`: each server
  * renews an "online" row every ~5 s and the fleet derives liveness
  * from renewal age; `InterNodeCommunicationServiceImpl.java` carries
  * the discovery) minus the inter-node RPC half that SURVEY scopes
  * out (Spark's runtime + the manifest CAS replace it).
  *
  * Two independent mechanisms, both plain files under one registry
  * directory (shared filesystem, same trust domain as the config log):
  *
  *  - '''presence''': each server owns `srv-<id>.json` and rewrites it
  *    (renewal) on a daemon heartbeat. Liveness is DERIVED — a record
  *    renewed within `onlineTimeoutMs` is online — so a SIGKILL'd
  *    server goes offline by omission; no cleanup, no tombstones. The
  *    record write is a plain overwrite (single writer per id): a
  *    reader that catches a torn write skips the record and sees it
  *    again fixed one heartbeat later, which is the right failure mode
  *    for a liveness hint.
  *  - '''duty leases''': maintenance duties (compaction, vacuum,
  *    decimation catch-up) must run on exactly one instance at a time.
  *    Each duty is a versioned lease log (`duty-<name>/v…json`)
  *    advanced through [[AtomicClaim]] — the same exclusive-claim
  *    primitive as the manifest commit — so two contenders racing for
  *    an expired lease publish the same next version and exactly one
  *    wins. The holder renews by publishing a further version;
  *    releasing publishes an already-expired version for immediate
  *    handover.
  *
  * Lease intervals compare wall clocks across machines — the same
  * assumption as the reference (which dedicates `ClockSkewMonitor.java`
  * to alarming on it) and the vacuum grace: keep leases in the tens of
  * seconds and skew in the seconds and the margin holds. A paused
  * holder whose lease expired must re-acquire before resuming work
  * (use [[holdsDuty]] around non-idempotent steps).
  */
object ServerRegistry {

  /** Reference renewal cadence (`ClusterManagementService.java:93`). */
  val DefaultRenewalMs = 5000L

  /** Three missed renewals = offline. */
  val DefaultOnlineTimeoutMs = 15000L

  final case class ServerInfo(serverId: String, serverName: String,
                              url: String, startedAt: Long,
                              renewedAt: Long, online: Boolean)

  final case class DutyLease(duty: String, holder: String,
                             acquiredAt: Long, expiresAt: Long)

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Registry file names embed caller-supplied ids; percent-encode
    * anything outside the portable set so a hostile id cannot escape
    * the directory or collide with the lease namespace.
    */
  private def enc(id: String): String =
    id.map { c =>
      if (c.isLetterOrDigit || c == '.' || c == '-') c.toString
      else "%" + f"${c.toInt}%04x"
    }.mkString

  private def srvPath(dir: String, id: String): Path =
    new Path(dir, s"srv-${enc(id)}.json")

  // ---- presence ------------------------------------------------------

  /** Register this process and start a daemon heartbeat renewing every
    * `renewalMs`. Close the returned registration on shutdown (it
    * deletes the record; a crash leaves it to age out).
    */
  def register(spark: SparkSession, registryDir: String, serverId: String,
               serverName: String, url: String,
               renewalMs: Long = DefaultRenewalMs,
               now: () => Long = () => System.currentTimeMillis())
      : Registration = {
    val reg = new Registration(fs(spark, registryDir), registryDir,
      serverId, serverName, url, now)
    reg.renew()
    reg.startHeartbeat(renewalMs)
    reg
  }

  final class Registration private[ServerRegistry] (
      f: FileSystem, dir: String, val serverId: String,
      serverName: String, url: String, now: () => Long)
      extends AutoCloseable {

    private val startedAt = now()
    private val exec =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
        (r: Runnable) => {
          val t = new Thread(r, s"graft-registry-$serverId")
          t.setDaemon(true)
          t
        })

    /** Rewrite the record with a fresh renewal stamp. Plain overwrite:
      * this id has one writer, and a torn read self-heals next beat.
      */
    def renew(): Unit = {
      val o = mapper.createObjectNode()
      o.put("serverId", serverId)
      o.put("serverName", serverName)
      o.put("url", url)
      o.put("startedAt", startedAt)
      o.put("renewedAt", now())
      val out = f.create(srvPath(dir, serverId), true)
      try out.write(mapper.writeValueAsString(o)
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }

    private[ServerRegistry] def startHeartbeat(renewalMs: Long): Unit =
      exec.scheduleAtFixedRate(
        () => try renew() catch { case NonFatal(_) => () },
        renewalMs, renewalMs, java.util.concurrent.TimeUnit.MILLISECONDS)

    /** Stop the heartbeat and remove the record (clean shutdown shows
      * the server gone, not lingering until the timeout).
      */
    override def close(): Unit = {
      exec.shutdownNow()
      try f.delete(srvPath(dir, serverId), false)
      catch { case NonFatal(_) => () }
    }
  }

  /** The fleet, id-sorted: every registered record with liveness
    * derived from renewal age. Unparseable records (a torn overwrite
    * caught mid-write) are skipped — they reappear one heartbeat later.
    */
  def list(spark: SparkSession, registryDir: String,
           onlineTimeoutMs: Long = DefaultOnlineTimeoutMs,
           nowMs: Long = System.currentTimeMillis()): Seq[ServerInfo] = {
    val f = fs(spark, registryDir)
    val dir = new Path(registryDir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("srv-") &&
        s.getPath.getName.endsWith(".json"))
      .flatMap { s =>
        try {
          val in = f.open(s.getPath)
          val n =
            try mapper.readTree(in)
            finally in.close()
          val renewed = n.get("renewedAt").asLong()
          Some(ServerInfo(n.get("serverId").asText(),
            n.get("serverName").asText(), n.get("url").asText(),
            n.get("startedAt").asLong(), renewed,
            online = nowMs - renewed <= onlineTimeoutMs))
        } catch { case NonFatal(_) => None }
      }
      .sortBy(_.serverId)
  }

  // ---- duty leases ---------------------------------------------------

  private def dutyDir(dir: String, duty: String): Path =
    new Path(dir, s"duty-${enc(duty)}")

  private def leasePath(d: Path, v: Long): Path =
    new Path(d, f"v$v%020d.json")

  private def latestLease(f: FileSystem, d: Path)
      : Option[(Long, DutyLease)] = {
    if (!f.exists(d)) return None
    val versions = f.listStatus(d).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("v") && n.endsWith(".json"))
        n.stripPrefix("v").stripSuffix(".json").toLongOption
      else None
    }
    versions.maxOption.flatMap { v =>
      try {
        val in = f.open(leasePath(d, v))
        val n =
          try mapper.readTree(in)
          finally in.close()
        Some(v -> DutyLease(n.get("duty").asText(),
          n.get("holder").asText(), n.get("acquiredAt").asLong(),
          n.get("expiresAt").asLong()))
      } catch { case NonFatal(_) => None }
    }
  }

  private def publishLease(f: FileSystem, d: Path, version: Long,
                           lease: DutyLease): Boolean = {
    f.mkdirs(d)
    val o = mapper.createObjectNode()
    o.put("duty", lease.duty)
    o.put("holder", lease.holder)
    o.put("acquiredAt", lease.acquiredAt)
    o.put("expiresAt", lease.expiresAt)
    val tmp = new Path(d,
      s".tmp-${java.util.UUID.randomUUID().toString}")
    val out = f.create(tmp, false)
    try out.write(mapper.writeValueAsString(o)
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val won = AtomicClaim.publish(f, tmp, leasePath(d, version))
    if (won) {
      // prune superseded lease versions (keep a short tail for
      // post-mortem reads; every version is immutable once published)
      f.listStatus(d).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("v") && n.endsWith(".json"))
          n.stripPrefix("v").stripSuffix(".json").toLongOption
        else None
      }.sorted.dropRight(3)
        .foreach(v => try f.delete(leasePath(d, v), false)
        catch { case NonFatal(_) => () })
    }
    won
  }

  /** Try to take (or, as the current holder, extend) `duty` for
    * `leaseMs`. Exactly one of N concurrent contenders for an expired
    * or absent lease succeeds — the winner is whoever publishes the
    * next lease version through [[AtomicClaim]].
    */
  def tryAcquireDuty(spark: SparkSession, registryDir: String,
                     duty: String, serverId: String, leaseMs: Long,
                     nowMs: Long = System.currentTimeMillis()): Boolean = {
    val f = fs(spark, registryDir)
    val d = dutyDir(registryDir, duty)
    latestLease(f, d) match {
      case Some((_, l)) if l.expiresAt > nowMs && l.holder != serverId =>
        false
      case other =>
        val next = other.map(_._1).getOrElse(0L) + 1
        publishLease(f, d, next,
          DutyLease(duty, serverId, nowMs, nowMs + leaseMs))
    }
  }

  /** Whether `serverId` holds an unexpired lease on `duty` right now —
    * the check a paused holder must make before a non-idempotent step.
    */
  def holdsDuty(spark: SparkSession, registryDir: String, duty: String,
                serverId: String,
                nowMs: Long = System.currentTimeMillis()): Boolean =
    latestLease(fs(spark, registryDir), dutyDir(registryDir, duty))
      .exists { case (_, l) =>
        l.holder == serverId && l.expiresAt > nowMs
      }

  /** Release `duty` for immediate handover: the holder publishes an
    * already-expired version. A non-holder release is a no-op (false).
    */
  def releaseDuty(spark: SparkSession, registryDir: String, duty: String,
                  serverId: String,
                  nowMs: Long = System.currentTimeMillis()): Boolean = {
    val f = fs(spark, registryDir)
    val d = dutyDir(registryDir, duty)
    latestLease(f, d) match {
      case Some((v, l)) if l.holder == serverId && l.expiresAt > nowMs =>
        publishLease(f, d, v + 1, DutyLease(duty, serverId, nowMs, nowMs))
      case _ => false
    }
  }

  /** Current lease state of `duty` (holder may be expired — check
    * `expiresAt` against the caller's clock).
    */
  def dutyLease(spark: SparkSession, registryDir: String,
                duty: String): Option[DutyLease] =
    latestLease(fs(spark, registryDir), dutyDir(registryDir, duty))
      .map(_._2)

  /** Run `body` only if the duty lease is acquired, releasing after —
    * the one-liner for "exactly one instance runs this maintenance
    * pass". Returns None when another holder has the lease.
    */
  def withDuty[A](spark: SparkSession, registryDir: String, duty: String,
                  serverId: String, leaseMs: Long)(body: => A)
      : Option[A] =
    if (!tryAcquireDuty(spark, registryDir, duty, serverId, leaseMs)) None
    else
      try Some(body)
      finally releaseDuty(spark, registryDir, duty, serverId)
}
