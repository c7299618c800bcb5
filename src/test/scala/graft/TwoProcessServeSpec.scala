package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ChannelConfig, ConfigCommands, ConfiguredArchive,
  HttpAdminApi, HttpArchiveServer, ManifestStore}

/** The claimed deployment shape, proven across PROCESS boundaries: N
  * stateless serving processes over ONE manifest-committed store (the
  * reference needs its own cluster-management layer for this —
  * ClusterManagementService.java; here the store's exclusive-create
  * commits are the only coordination). Two real `ServeMain` JVMs serve
  * one config/store pair while commits land through one of them and
  * through a third writer (this test JVM):
  *
  *  - both processes serve byte-identical responses;
  *  - a config commit through server B is served by server A on its
  *    next request, no restart, no message passing — the versioned
  *    config log is the only channel;
  *  - a data commit while A is being hammered never yields a torn
  *    read: every in-flight response is a complete JSON array of
  *    either the old or the new snapshot (manifest atomicity);
  *  - concurrent admin commits through BOTH servers all land (the
  *    optimistic CAS loses no update across process boundaries —
  *    in-process this is ManifestStoreSpec's 8-thread race; this is
  *    the cross-JVM form).
  */
class TwoProcessServeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def http(method: String, url: String,
                   body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(2000)
    conn.setReadTimeout(60000)
    body.foreach { b =>
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      out.write(b.getBytes(StandardCharsets.UTF_8)); out.close()
    }
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text =
      if (in == null) ""
      else try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    (code, text)
  }

  /** Fork a real ServeMain JVM with this JVM's module opens. */
  private def forkServer(cfg: String, store: String, port: Int,
                         log: java.io.File): Process = {
    val rtArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    val addOpens = rtArgs.zipWithIndex.flatMap {
      case (a, i) if a == "--add-opens" && i + 1 < rtArgs.size =>
        Seq(a, rtArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case _ => Nil
    }
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++
      addOpens ++ Seq("-Xmx3g",
        "-cp", System.getProperty("java.class.path"),
        "graft.ServeMain", cfg, store, port.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    pb.start()
  }

  private def awaitUp(base: String, proc: Process, log: java.io.File): Unit = {
    val deadline = System.nanoTime() + 180L * 1000000000L
    var up = false
    while (!up && System.nanoTime() < deadline) {
      require(proc.isAlive,
        s"server process died: ${Files.readString(log.toPath).takeRight(2000)}")
      up = try http("GET", s"$base/")._1 == 200
      catch { case _: java.io.IOException => false }
      if (!up) Thread.sleep(500)
    }
    require(up, s"server at $base never came up")
  }

  test("two ServeMain processes over one store: identical bytes, " +
      "cross-process commit visibility, no torn reads, CAS survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("twoproc").toString
    val cfg = s"$dir/config"; val store = s"$dir/store"
    ConfigCommands.addChannel(spark, cfg, ChannelConfig("ch0", "id0", "ca",
      enabled = true, Map(), Map()))
    val nBefore = 1440
    def rows(name: String, ids: Range) = ids.map(i =>
        (name, T0 + i * 60L * NS, i.toDouble, "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.materialize(spark, cfg, store,
      rows("ch0", 0 until nBefore))

    val (pa, pb) = (freePort(), freePort())
    val (logA, logB) = (Files.createTempFile("srvA", ".log").toFile,
      Files.createTempFile("srvB", ".log").toFile)
    val procA = forkServer(cfg, store, pa, logA)
    val procB = forkServer(cfg, store, pb, logB)
    try {
      val baseA = s"http://localhost:$pa${HttpArchiveServer.ContextPath}"
      val baseB = s"http://localhost:$pb${HttpArchiveServer.ContextPath}"
      val admA = s"http://localhost:$pa${HttpAdminApi.ContextPath}"
      val admB = s"http://localhost:$pb${HttpAdminApi.ContextPath}"
      awaitUp(baseA, procA, logA)
      awaitUp(baseB, procB, logB)

      // 1. both processes serve byte-identical responses
      // window covers both snapshots whole, so in-flight counts are
      // exactly {nBefore, nAfter}
      val q = s"/1/samples/ch0?start=$T0&end=${T0 + 2L * 86400L * NS}"
      def countTimes(s: String): Int = {
        val pat = "{\"time\":"
        var i = s.indexOf(pat); var n = 0
        while (i >= 0) { n += 1; i = s.indexOf(pat, i + 1) }
        n
      }
      val (ca, ba) = http("GET", s"$baseA$q")
      val (cb, bb) = http("GET", s"$baseB$q")
      assert(ca == 200 && cb == 200)
      assert(ba == bb, "the two processes served different bytes")
      assert(countTimes(ba) >= nBefore)

      // 2. hammer A while a data commit lands from a third writer:
      // every response must be a COMPLETE array of either snapshot
      val counts = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val failures = new java.util.concurrent.atomic.AtomicReference[String]()
      val hammer = new Thread(() => {
        while (!stop.get()) {
          val (c, b) = http("GET", s"$baseA$q")
          if (c != 200 || !b.startsWith("[") || !b.endsWith("]"))
            failures.compareAndSet(null, s"torn response: code $c " +
              s"head ${b.take(40)} tail ${b.takeRight(10)}")
          else counts.add(countTimes(b))
        }
      })
      hammer.start()
      val nAfter = nBefore + 120
      // the store is keyed by the rename-stable data id (id0), like
      // every writer that lands data behind the config resolution
      ManifestStore.commit(rows("id0", nBefore until nAfter), store, 0L)
      // observe the new snapshot through BOTH processes
      val deadline = System.nanoTime() + 60L * 1000000000L
      def countOf(base: String): Int = countTimes(http("GET", s"$base$q")._2)
      while ((countOf(baseA) < nAfter || countOf(baseB) < nAfter) &&
          System.nanoTime() < deadline) Thread.sleep(200)
      stop.set(true); hammer.join()
      assert(failures.get() == null, s"${failures.get()}")
      assert(countOf(baseA) == nAfter && countOf(baseB) == nAfter,
        "data commit not visible through both processes")
      val distinct = counts.asScala.toSet
      assert(distinct.subsetOf(Set(nBefore, nAfter)),
        s"torn read: in-flight counts $distinct not in " +
          s"{$nBefore, $nAfter}")

      // 3. concurrent admin commits through BOTH servers: no lost update
      val threads = (0 until 2).map { t =>
        val adm = if (t == 0) admA else admB
        val th = new Thread(() => (0 until 5).foreach { i =>
          val (c, b) = http("POST",
            s"$adm/1.0/run-archive-configuration-commands",
            Some(s"""{"commands":[{"commandType":"add_channel",
              |"channelName":"pv:$t-$i","controlSystemType":"ca"}]}"""
              .stripMargin))
          require(c == 200 && b.contains("\"success\":true"),
            s"admin commit failed on $adm: $c $b")
        })
        th.start(); th
      }
      threads.foreach(_.join())
      // every add landed, visible from BOTH processes
      for (base <- Seq(admA, admB)) {
        val (lc, lb) = http("GET", s"$base/1.0/channels/all")
        assert(lc == 200)
        for (t <- 0 until 2; i <- 0 until 5)
          assert(lb.contains(s""""channelName":"pv:$t-$i""""),
            s"lost update: pv:$t-$i missing via $base")
      }

      // 4. a config commit through B serves through A (pattern listing)
      val (pc, pl) = http("GET", s"$baseA/1/channels-by-pattern/pv:1*")
      assert(pc == 200 && pl.contains("pv:1-4"))
    } finally {
      procA.destroy(); procB.destroy()
      procA.waitFor(); procB.waitFor()
    }
  }

  test("serving survives a hammering commit+compact+vacuum maintenance " +
      "writer (vacuum reference-grace, cross-process)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vacproc").toString
    val cfg = s"$dir/config"; val store = s"$dir/store"
    ConfigCommands.addChannel(spark, cfg, ChannelConfig("ch0", "id0", "ca",
      enabled = true, Map(), Map()))
    val nBefore = 720
    // materialize resolves channel NAMES; later direct commits land
    // behind the config resolution by the rename-stable data id
    def rows(ch: String, ids: Range) = ids.map(i =>
        (ch, T0 + i * 60L * NS, i.toDouble, "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.materialize(spark, cfg, store,
      rows("ch0", 0 until nBefore))

    val port = freePort()
    val log = Files.createTempFile("srvV", ".log").toFile
    val proc = forkServer(cfg, store, port, log)
    try {
      val base = s"http://localhost:$port${HttpArchiveServer.ContextPath}"
      awaitUp(base, proc, log)
      val rounds = 10
      val q = s"/1/samples/ch0?start=$T0&end=${T0 + 2L * 86400L * NS}"
      def countTimes(s: String): Int = {
        val pat = "{\"time\":"
        var i = s.indexOf(pat); var n = 0
        while (i >= 0) { n += 1; i = s.indexOf(pat, i + 1) }
        n
      }
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val failures = new java.util.concurrent.atomic.AtomicReference[String]()
      val served = new java.util.concurrent.atomic.AtomicInteger(0)
      val hammers = (0 until 3).map { _ =>
        val th = new Thread(() => {
          while (!stop.get() && failures.get() == null) {
            try {
              val (c, b) = http("GET", s"$base$q")
              val n = countTimes(b)
              if (c != 200 || !b.startsWith("[") || !b.endsWith("]") ||
                  n < nBefore || n > nBefore + rounds)
                failures.compareAndSet(null, s"bad response under " +
                  s"maintenance: code $c rows $n head ${b.take(60)}")
              else served.incrementAndGet()
            } catch {
              case e: java.io.IOException =>
                failures.compareAndSet(null, s"request failed: $e")
            }
          }
        })
        th.start(); th
      }
      // the maintenance writer: each round appends one sample (a fresh
      // fragment), compacts every fragmented day (dereferencing the
      // previous generation's files), and vacuums with a 2 s grace —
      // the reference protection must keep any file a <2 s-old version
      // still references, even though the FILE's own mtime is older,
      // while the serving process hammers reads
      var vacuumedTotal = 0
      for (r <- 0 until rounds) {
        ManifestStore.commit(rows("id0", nBefore + r until nBefore + r + 1),
          store, 0L)
        ManifestStore.compactAll(spark, store, levelSec = 0L)
        vacuumedTotal += ManifestStore.vacuum(spark, store,
          graceMs = 2000L).size
        if (failures.get() != null) fail(failures.get())
      }
      stop.set(true); hammers.foreach(_.join())
      assert(failures.get() == null, s"${failures.get()}")
      assert(served.get() > 20, s"only ${served.get()} responses served")
      assert(vacuumedTotal > 0,
        "the maintenance loop never actually vacuumed a file — the " +
          "test did not exercise deletion under load")
      val (fc, fb) = http("GET", s"$base$q")
      assert(fc == 200 && countTimes(fb) == nBefore + rounds)
    } finally { proc.destroy(); proc.waitFor() }
  }
}
