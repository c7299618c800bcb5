package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** The horizon-TTL near-dup stream ([[StreamingDedup.minhashStreamTtl]]):
  * semantics (pairs exist iff event times lie within the horizon —
  * across batches, enforced against evicted members) and state hygiene
  * (band-bucket state is bounded by one horizon window, not stream
  * lifetime — the SDUP100X growth the plain operator documents).
  */
class StreamingDedupTtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val T0ms = 1704067200000L
  private def ts(minute: Long): Timestamp = new Timestamp(T0ms + minute * 60000L)

  test("pairs obey the horizon across batches; expired buckets leave " +
      "the state store") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF.toDF("doc_id", "text", "event_time")
    val horizonMs = 60000L // one minute — one batch step
    val sink = "ttl_pairs"
    val q = StreamingDedup.minhashStreamTtl(df, horizonMs,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      val persistent = "the quick brown fox jumps over the lazy dog at shift change"
      for (i <- 0L until 10L) {
        // family A: identical text every batch — same buckets forever,
        // member eviction is what keeps them bounded
        val a = (1000L + i, persistent, ts(i))
        // family B: batch-unique text, two identical docs — fresh
        // buckets each batch, removed by the event-time timeout
        val bText = s"batch$i unique payload tokens alpha$i beta$i gamma$i delta$i"
        val b1 = (2000L + 2 * i, bText, ts(i))
        val b2 = (2001L + 2 * i, bText, ts(i))
        mem.addData(a, b1, b2)
        q.processAllAvailable()
      }
      // one far-future doc advances the watermark past every horizon
      mem.addData((9999L, "flush doc tokens one two three", ts(1000L)))
      q.processAllAvailable()
      mem.addData((10000L, "flush doc again tokens four five six", ts(1001L)))
      q.processAllAvailable()

      val pairs = spark.table(sink)
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
      // consecutive A docs are exactly one horizon apart — included
      for (i <- 1000L until 1009L)
        assert(pairs.contains((i, i + 1)),
          s"within-horizon pair ($i, ${i + 1}) missing")
      // two batches apart exceeds the horizon — excluded, even though
      // the bucket is the same (member eviction + the pairing rule)
      for (i <- 1000L until 1008L)
        assert(!pairs.contains((i, i + 2)),
          s"beyond-horizon pair ($i, ${i + 2}) leaked")
      // within-batch B pairs all present
      for (i <- 0L until 10L)
        assert(pairs.contains((2000L + 2 * i, 2001L + 2 * i)))

      // state hygiene: after the watermark passed every horizon, the
      // expired buckets are GONE — state is a horizon window's worth,
      // not ten batches' worth (family B alone planted ~8 buckets per
      // batch; un-evicted that is 80+ keys)
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows <= 24,
        s"state holds $stateRows rows after every horizon expired — " +
          "TTL eviction is not bounding it")
    } finally q.stop()
  }

  private implicit class ArrAsScala[A](a: Array[A]) {
    def asScala: Seq[A] = a.toSeq
  }
}
