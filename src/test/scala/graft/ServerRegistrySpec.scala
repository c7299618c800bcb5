package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{HttpArchiveServer, ServerRegistry}

/** The fleet registry — the re-expression of the reference's cluster
  * liveness bookkeeping (`ClusterManagementService.java:93`: renewal-
  * derived online state) and its one-owner maintenance coordination,
  * over plain files + [[graft.archive.AtomicClaim]].
  */
class ServerRegistrySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.session

  private def tmp(): String =
    Files.createTempDirectory("srvreg").toString

  test("presence: register shows online, renewal age drives liveness, " +
      "close removes the record") {
    val dir = tmp()
    var t = 1000000L
    val reg = ServerRegistry.register(spark, dir, "s1", "node-a",
      "http://a:80", renewalMs = 3600000L, now = () => t)
    try {
      val live = ServerRegistry.list(spark, dir,
        onlineTimeoutMs = 15000L, nowMs = t)
      assert(live.map(s => (s.serverId, s.serverName, s.url, s.online)) ==
        Seq(("s1", "node-a", "http://a:80", true)))
      // past the timeout with no renewal: offline by omission
      assert(!ServerRegistry.list(spark, dir, 15000L, t + 15001L)
        .head.online)
      // a manual renewal at the later clock brings it back
      t += 15001L
      reg.renew()
      assert(ServerRegistry.list(spark, dir, 15000L, t).head.online)
    } finally reg.close()
    assert(ServerRegistry.list(spark, dir, 15000L, t).isEmpty)
  }

  test("presence: two servers list id-sorted; a torn record is skipped, " +
      "not fatal") {
    val dir = tmp()
    val a = ServerRegistry.register(spark, dir, "a", "a", "http://a",
      renewalMs = 3600000L, now = () => 5L)
    val b = ServerRegistry.register(spark, dir, "b", "b", "http://b",
      renewalMs = 3600000L, now = () => 5L)
    try {
      // a torn overwrite caught mid-write: unparseable JSON
      Files.write(java.nio.file.Paths.get(dir, "srv-torn.json"),
        "{\"serverId\": \"to".getBytes(StandardCharsets.UTF_8))
      assert(ServerRegistry.list(spark, dir, 15000L, 10L)
        .map(_.serverId) == Seq("a", "b"))
    } finally { a.close(); b.close() }
  }

  test("duty lease: one holder at a time, holder extends, expiry hands " +
      "over, release is immediate") {
    val dir = tmp()
    var t = 1000L
    assert(ServerRegistry.tryAcquireDuty(spark, dir, "compact", "s1",
      leaseMs = 500L, nowMs = t))
    assert(ServerRegistry.holdsDuty(spark, dir, "compact", "s1", t))
    // a second contender is refused while the lease is live
    assert(!ServerRegistry.tryAcquireDuty(spark, dir, "compact", "s2",
      500L, t + 100L))
    // the holder extends its own lease
    assert(ServerRegistry.tryAcquireDuty(spark, dir, "compact", "s1",
      500L, t + 400L))
    assert(!ServerRegistry.tryAcquireDuty(spark, dir, "compact", "s2",
      500L, t + 700L), "extension moved the expiry")
    // expiry: the other contender takes over
    t += 400L + 501L
    assert(ServerRegistry.tryAcquireDuty(spark, dir, "compact", "s2",
      500L, t))
    assert(!ServerRegistry.holdsDuty(spark, dir, "compact", "s1", t))
    // release hands over without waiting for expiry
    assert(ServerRegistry.releaseDuty(spark, dir, "compact", "s2", t + 10L))
    assert(ServerRegistry.tryAcquireDuty(spark, dir, "compact", "s1",
      500L, t + 20L))
    // a non-holder release is a no-op
    assert(!ServerRegistry.releaseDuty(spark, dir, "compact", "s2", t + 30L))
    // independent duties don't interact
    assert(ServerRegistry.tryAcquireDuty(spark, dir, "vacuum", "s2",
      500L, t + 30L))
  }

  test("duty lease: 8 racing contenders for an expired lease — exactly " +
      "one wins each round") {
    val dir = tmp()
    var now = 10000L
    (0 until 5).foreach { round =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val wins = (0 until 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = ServerRegistry.tryAcquireDuty(spark,
              dir, "race", s"srv-$i", leaseMs = 100L, nowMs = now)
          })
        }.count(_.get())
        assert(wins == 1, s"round $round: $wins winners")
      } finally pool.shutdown()
      now += 101L // expire before the next round
    }
  }

  test("withDuty runs the body only when the lease is won and releases " +
      "after") {
    val dir = tmp()
    var ran = 0
    val r1 = ServerRegistry.withDuty(spark, dir, "maint", "s1",
      leaseMs = 3600000L) { ran += 1; "did it" }
    assert(r1.contains("did it") && ran == 1)
    // released on exit: the next taker succeeds immediately
    val r2 = ServerRegistry.withDuty(spark, dir, "maint", "s2",
      leaseMs = 3600000L) { ran += 1; "also" }
    assert(r2.contains("also") && ran == 2)
    // a held lease blocks the body entirely
    assert(ServerRegistry.tryAcquireDuty(spark, dir, "maint", "s3",
      3600000L))
    val r3 = ServerRegistry.withDuty(spark, dir, "maint", "s4",
      3600000L) { ran += 1; "never" }
    assert(r3.isEmpty && ran == 2)
  }

  test("hostile ids stay inside the registry directory") {
    val parent = java.nio.file.Paths.get(tmp())
    val dir = parent.resolve("reg").toString
    Files.createDirectory(parent.resolve("reg"))
    val id = "../../x');<&> 😀"
    val reg = ServerRegistry.register(spark, dir, id, "n", "u",
      renewalMs = 3600000L, now = () => 7L)
    try {
      val live = ServerRegistry.list(spark, dir, 15000L, 7L)
      assert(live.map(_.serverId) == Seq(id))
      // nothing escaped above the registry dir: the parent holds ONLY
      // the registry dir itself
      val stream = Files.list(parent)
      val siblings =
        try stream.iterator().asScala.map(_.getFileName.toString).toVector
        finally stream.close()
      assert(siblings == Vector("reg"), s"escaped: $siblings")
      assert(ServerRegistry.tryAcquireDuty(spark, dir, "du/../ty", id,
        1000L, 7L))
    } finally reg.close()
  }

  test("cluster-status serves the live fleet when a registry is " +
      "configured; stop deregisters") {
    val dir = tmp()
    val cfgDir = Files.createTempDirectory("regcfg").toString
    val store = Files.createTempDirectory("regstore").toString
    val s1 = HttpArchiveServer.start(spark, cfgDir, store,
      registryDir = Some(dir), serverId = "alpha", serverName = "node-a")
    val s2 = HttpArchiveServer.start(spark, cfgDir, store,
      registryDir = Some(dir), serverId = "beta", serverName = "node-b")
    try {
      def fleet(port: Int): String = {
        val conn = URI.create(s"http://localhost:$port" +
          "/admin/api/1.0/cluster-status").toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        val text = new String(conn.getInputStream.readAllBytes(),
          StandardCharsets.UTF_8)
        conn.disconnect(); text
      }
      val seen = fleet(s1.port)
      assert(seen.contains("\"alpha\"") && seen.contains("\"beta\""))
      assert(seen.contains("\"online\":true"))
      assert(seen.contains("\"thisServer\":true"))
      // each instance marks ITSELF
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val fromS2 = mapper.readTree(fleet(s2.port))
      val self = (0 until fromS2.size()).map(fromS2.get)
        .filter(_.get("thisServer").asBoolean())
      assert(self.map(_.get("serverId").asText()) == Seq("beta"))
      // stopping beta deregisters it — alpha's view shrinks at once
      s2.stop()
      val after = fleet(s1.port)
      assert(after.contains("\"alpha\"") && !after.contains("\"beta\""))
    } finally { s1.stop(); if (s2.server != null) () }
  }
}
