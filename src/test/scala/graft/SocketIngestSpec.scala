package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.ManifestStore
import graft.streaming.StreamingDecimation

/** ST1 over a real network transport: a TCP feeder (standing in for
  * the reference's EPICS CA monitor callbacks,
  * ChannelAccessControlSystemSupport.java) pushes the line protocol
  * through a live socket into [[StreamingDecimation.socketSamples]] →
  * the exactly-once manifest sink, and the drained store must equal
  * the SAME rows committed through the batch path — transport changes
  * nothing about the stored bytes.
  */
class SocketIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS

  test("wire-format parser: samples, marker rows, malformed lines dropped") {
    import spark.implicits._
    val lines = Seq(
      "ch:a\t100\t1.5\t1",
      "ch:a\t200\t\t2", // marker: empty value → NULL
      "ch:b\t100\t-3.25\t7",
      "garbage line", // no tabs → dropped
      "ch:c\tnotanum\t1.0\t9", // bad ts → dropped
      "ch:c\t300\tnotanum\t10", // bad value (non-empty, non-numeric) → dropped
      "\t300\t1.0\t11" // empty channel → dropped
    ).toDF("value")
    val got = StreamingDecimation.parseSampleLines(lines)
      .orderBy("channel", "ts").collect()
    assert(got.length == 3)
    assert(got(0).getString(0) == "ch:a" && got(0).getLong(1) == 100L &&
      got(0).getDouble(2) == 1.5)
    assert(got(1).getString(0) == "ch:a" && got(1).isNullAt(2)) // marker
    assert(got(2).getString(0) == "ch:b" && got(2).getDouble(2) == -3.25)
  }

  test("wire format round-trips arbitrary samples (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // channel names: printable, no TAB/newline (the TSV framing's one
    // reserved set — EPICS CA names are token-like and never carry
    // either; the parser doc pins the restriction)
    def chan(): String = {
      val alphabet =
        "abcXYZ019:/ +~#%&()[]{}?!.,;é中"
      (0 until 1 + rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = (0 until 300).map { i =>
      val v: Option[Double] =
        if (rnd.nextInt(10) == 0) None
        else Some(java.lang.Double.longBitsToDouble(rnd.nextLong())) match {
          case Some(d) if d.isNaN || d.isInfinite => Some(rnd.nextDouble())
          case other => other
        }
      (chan(), rnd.nextLong().abs, v, i.toLong)
    }
    val lines = rows.map(r =>
        s"${r._1}\t${r._2}\t${r._3.map(_.toString).getOrElse("")}\t${r._4}")
      .toDF("value")
    val parsed = StreamingDecimation.parseSampleLines(lines)
      .select("channel", "ts", "value", "sample_id")
      .as[(String, Long, Option[Double], Long)]
      .collect().toSeq.sortBy(_._4)
    assert(parsed == rows.sortBy(_._4),
      "format→parse must be the identity on valid samples")
  }

  test("socket → manifest store equals the batch-committed bytes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._

    val rows = (1 to 500).map { i =>
      val ch = s"net:${i % 3}"
      val v: Option[Double] = if (i % 97 == 0) None else Some(i * 0.5)
      (ch, T0 + i * 60L * NS, v, i.toLong)
    }
    def line(r: (String, Long, Option[Double], Long)): String =
      s"${r._1}\t${r._2}\t${r._3.map(_.toString).getOrElse("")}\t${r._4}"

    // feeder: accept one client (the Spark socket source), stream all
    // lines plus some noise the parser must survive, keep the socket
    // open until the query has drained
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    @volatile var feederError: Throwable = null
    val feeder = new Thread(() =>
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        rows.zipWithIndex.foreach { case (r, i) =>
          out.println(line(r))
          if (i == 250) out.println("NOISE not a sample")
        }
        out.flush()
        // hold the connection; closing early can race the source's read
        Thread.sleep(30000)
        sock.close()
      } catch { case t: Throwable => feederError = t })
    feeder.setDaemon(true)
    feeder.start()

    val store = Files.createTempDirectory("sockstore").toString
    val ckpt = Files.createTempDirectory("sockckpt").toString
    val q = StreamingDecimation.writeRawStreamManifest(
      StreamingDecimation.socketSamples(spark, "localhost", port),
      store, ckpt)
    try {
      // drain until every sample landed (the socket source has no
      // "all sent" signal — poll the committed store)
      val deadline = System.nanoTime() + 60L * 1000000000L
      var n = 0L
      while (n < rows.size && System.nanoTime() < deadline) {
        q.processAllAvailable()
        n = ManifestStore.read(spark, store, 0L).count()
        if (n < rows.size) Thread.sleep(200)
      }
      assert(feederError == null, s"feeder failed: $feederError")
      assert(n == rows.size, s"drained $n of ${rows.size}")
    } finally q.stop()

    // batch reference: the same rows through the batch commit
    val batchStore = Files.createTempDirectory("sockbatch").toString
    val batch = rows
      .toDF("channel", "ts", "value", "sample_id")
      .select(col("channel"), col("ts"), col("value"),
        org.apache.spark.sql.functions.lit("").as("str_value"),
        org.apache.spark.sql.functions.lit(0).as("severity"),
        org.apache.spark.sql.functions.lit(0).as("status"),
        col("sample_id"))
    ManifestStore.commit(batch, batchStore, 0L)

    val cols = Seq("channel", "ts", "value", "str_value", "severity",
      "status", "sample_id")
    val streamed = ManifestStore.read(spark, store, 0L)
      .select(cols.map(col): _*).collect().map(_.toSeq.toString).sorted
    val direct = ManifestStore.read(spark, batchStore, 0L)
      .select(cols.map(col): _*).collect().map(_.toSeq.toString).sorted
    assert(streamed.toSeq == direct.toSeq)

    // the HIGH-RATE transport (socket → write-ahead spool → file
    // source) must land the same bytes as the direct socket source —
    // small chunks force multiple atomic spool files
    val spoolDir = Files.createTempDirectory("sockspool").toString + "/sp"
    val store2 = Files.createTempDirectory("sockstore2").toString
    val ckpt2 = Files.createTempDirectory("sockckpt2").toString
    val server2 = new ServerSocket(0)
    val feeder2 = new Thread(() => {
      val sock = server2.accept()
      val out = new PrintWriter(sock.getOutputStream, false)
      rows.foreach(r => out.println(line(r)))
      out.flush()
      sock.close() // EOF ends the spool receiver
    })
    feeder2.setDaemon(true)
    feeder2.start()
    val receiver = StreamingDecimation.spoolSocket("localhost",
      server2.getLocalPort, spoolDir, linesPerChunk = 64)
    val q2 = StreamingDecimation.writeRawStreamManifest(
      StreamingDecimation.spooledSamples(spark, spoolDir), store2, ckpt2)
    try {
      receiver.join(60000)
      assert(!receiver.isAlive, "spool receiver did not finish")
      q2.processAllAvailable()
    } finally q2.stop()
    val spooled = ManifestStore.read(spark, store2, 0L)
      .select(cols.map(col): _*).collect().map(_.toSeq.toString).sorted
    assert(spooled.toSeq == direct.toSeq)
  }
}
