package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Dedup
import graft.pipeline.Hashing.NumMinHashes

/** Streaming MinHash-LSH near-duplicate detection: the incremental
  * form of [[graft.pipeline.Dedup.minHashCandidates]] for a corpus
  * that ARRIVES rather than sits — every new document is checked
  * against everything ingested before it, and a candidate pair is
  * emitted the moment its second member lands.
  *
  * Shape, stage by stage, and why each is the scalable one:
  *   1. Per-row signatures ([[Dedup.signatureArray]]) — a pure
  *      projection, no shuffle, no pre-state aggregation.
  *   2. Banding explode — 8 rows per doc, identical (band, key)
  *      format to the batch banding, so batch indexes and streamed
  *      state agree on bucket identity.
  *   3. ONE stateful operator: flatMapGroupsWithState keyed on
  *      (band, key). Bucket state holds (doc_id, signature) of every
  *      member; a new arrival compares against members only — work is
  *      proportional to bucket co-membership, exactly the batch
  *      equi-join's output size, never all-pairs.
  *
  * Emission contract — at-least-once per pair, duplicates confined to
  * ONE micro-batch: a pair sharing several bands is emitted by EVERY
  * shared under-cap bucket (mirroring the batch band self-join, whose
  * output the trailing `dropDuplicates` collapses). All emissions of
  * one pair land in the micro-batch where its LATER member arrives —
  * every shared bucket sees that member in the same batch — so a
  * per-batch distinct (foreachBatch `.dropDuplicates` on the way to a
  * sink, or `dropDuplicatesWithinWatermark` when the stream carries
  * event time) restores exactly-once without unbounded state. The
  * deduped drain is then the batch candidate set row for row (same
  * pairs, same est_jaccard — identical across emissions), which is
  * what lets `stream_dedup_minhash` share `dedup_minhash_lsh`'s
  * DuckDB oracle.
  *
  * Why not dedup inside the operator: an earlier form emitted only
  * from the pair's [[firstSharedBand]] — exactly-once with no
  * downstream dedup — but that rule interacts wrongly with the
  * saturation guard: a pair whose first shared bucket is SATURATED
  * but which co-resides in a later under-cap bucket was silently
  * dropped there (the later bucket refused: "not my band"), losing
  * pairs the capped BATCH path keeps. Emit-everywhere restores the
  * batch cap's recall shape: a pair is lost only when EVERY shared
  * bucket is saturated — the boilerplate-family case the cap
  * deliberately drops.
  *
  * Scale guard (the streaming analog of
  * [[graft.pipeline.Dedup.capBandSize]]): a boilerplate (band, key)
  * bucket grows O(members) state and O(members) comparisons per
  * arrival. At `maxBucketSize` the bucket SATURATES — it stops
  * storing and stops emitting, so a pathological key costs O(cap)
  * forever instead of quadratically exploding state and output. The
  * semantics necessarily differ from the batch cap (which drops
  * oversized buckets retroactively, pairs and all — a stream cannot
  * un-emit): saturation is prospective — the first `maxBucketSize`
  * members pair normally, later arrivals are ignored by this bucket.
  *
  * Replays are free: a doc_id already in bucket state is dropped, so
  * at-least-once upstream delivery adds no new emissions.
  */
object StreamingDedup {

  case class BandIn(band: Int, key: String, doc_id: Long, sig: Seq[Long])
  case class Member(docId: Long, sig: Seq[Long])
  case class BucketState(members: List[Member], saturated: Boolean)
  case class PairOut(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Fraction of matching signature components — the LSH Jaccard
    * estimate, same formula as the batch candidate join's zip_with.
    */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var m = 0
    var i = 0
    while (i < NumMinHashes) {
      if (a(i) == b(i)) m += 1
      i += 1
    }
    m.toDouble / NumMinHashes
  }

  /** Candidate near-dup pairs over a document stream. Input needs
    * `doc_id` (long) and `textCol`; docs with fewer than k tokens have
    * no signature and are skipped, like the batch path.
    */
  def minhashStream(stream: DataFrame, k: Int = 3,
                    textCol: String = "text",
                    maxBucketSize: Int = 4096): Dataset[PairOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // the batch banding projection runs unchanged on a stream — ONE
    // definition of the (band, key) format for batch indexes, batch
    // joins, and streamed state
    val bands = Dedup.minHashBandsPerRow(stream, k, textCol).as[BandIn]
    bands.groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processBucket(maxBucketSize))
  }

  // ---- horizon-TTL variant ------------------------------------------

  case class BandTsIn(band: Int, key: String, doc_id: Long,
                      sig: Seq[Long], event_time: java.sql.Timestamp)
  case class MemberT(docId: Long, sig: Seq[Long], tsMs: Long)
  case class BucketTState(members: List[MemberT], saturatedUntilMs: Long)

  /** [[minhashStream]] with a DEDUP HORIZON — the state-TTL form for
    * unbounded streams (the plain operator's band state grows with
    * every distinct under-cap document forever; SDUP100X documents
    * it). Semantics: a pair is a candidate iff its members' event
    * times lie within `horizonMs` of each other — the "near-dup
    * within a rolling window" contract a perpetual ingest pipeline
    * actually wants. State hygiene falls out of the semantics: a
    * member older than `watermark − horizon` can never pair with any
    * future arrival, so it is EVICTED on the bucket's next activity,
    * and an idle bucket's whole state is removed by an event-time
    * timeout at `newest member + horizon` — total state is bounded by
    * the docs of one horizon window, not the stream's lifetime.
    * Saturation recovers for the same reason: the cap marks the
    * bucket saturated only until its horizon passes.
    *
    * Input must carry an event-time TIMESTAMP column; the watermark
    * (`watermarkDelay` behind max event time) is applied here.
    * Within-horizon pairs are byte-identical to the batch candidate
    * set filtered to the horizon — the `stream_dedup_minhash_ttl`
    * gate's contract.
    */
  def minhashStreamTtl(stream: DataFrame, horizonMs: Long,
                       k: Int = 3, textCol: String = "text",
                       tsCol: String = "event_time",
                       watermarkDelay: String = "10 seconds",
                       maxBucketSize: Int = 4096): Dataset[PairOut] = {
    require(horizonMs > 0, "horizonMs must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    val bands = Dedup.minHashBandsPerRow(
        stream.withWatermark(tsCol, watermarkDelay), k, textCol,
        carry = Seq(tsCol))
      .withColumnRenamed(tsCol, "event_time").as[BandTsIn]
    bands.groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        processBucketTtl(maxBucketSize, horizonMs))
  }

  private def processBucketTtl(maxBucketSize: Int, horizonMs: Long)(
      bucket: (Int, String), rows: Iterator[BandTsIn],
      state: GroupState[BucketTState]): Iterator[PairOut] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st = state.getOption.getOrElse(BucketTState(Nil, 0L))
    val wm = state.getCurrentWatermarkMs()
    // eviction: a member whose horizon has passed the watermark can
    // never pair with a future arrival — state hygiene, not semantics
    var members = st.members.filter(_.tsMs >= wm - horizonMs)
    val saturated = st.saturatedUntilMs > wm
    val seen = scala.collection.mutable.HashSet.empty[Long]
    members.foreach(m => seen += m.docId)
    val fresh = rows
      .filter(r => !seen.contains(r.doc_id) && seen.add(r.doc_id))
      .toArray.sortBy(_.doc_id)
    var nMembers = members.size
    var nowSaturated = saturated
    var satUntil = st.saturatedUntilMs
    val out = List.newBuilder[PairOut]
    var i = 0
    while (i < fresh.length && !nowSaturated) {
      val n = fresh(i)
      val nMs = n.event_time.getTime
      var ms = members
      while (ms.nonEmpty) {
        val e = ms.head
        // the horizon IS the pairing rule, applied symmetrically —
        // eviction above only makes it cheap, never decides it
        if (math.abs(nMs - e.tsMs) <= horizonMs) {
          val (a, b) =
            if (e.docId < n.doc_id) (e.docId, n.doc_id)
            else (n.doc_id, e.docId)
          out += PairOut(a, b, estJaccard(n.sig, e.sig))
        }
        ms = ms.tail
      }
      members = MemberT(n.doc_id, n.sig, nMs) :: members
      nMembers += 1
      if (nMembers >= maxBucketSize) {
        nowSaturated = true
        satUntil = nMs + horizonMs
        members = Nil
      }
      i += 1
    }
    if (members.isEmpty && !nowSaturated) state.remove()
    else {
      state.update(BucketTState(members,
        if (nowSaturated) satUntil else 0L))
      val newest =
        if (nowSaturated) satUntil
        else members.map(_.tsMs).max + horizonMs
      // idle-bucket GC: when the watermark passes every member's
      // horizon the state is removed without any arrival
      if (newest > wm) state.setTimeoutTimestamp(newest)
      else state.setTimeoutTimestamp(wm + 1)
    }
    out.result().iterator
  }

  private def processBucket(maxBucketSize: Int)(
      bucket: (Int, String), rows: Iterator[BandIn],
      state: GroupState[BucketState]): Iterator[PairOut] = {
    val st = state.getOption.getOrElse(BucketState(Nil, saturated = false))
    if (st.saturated) return Iterator.empty
    val seen = scala.collection.mutable.HashSet.empty[Long]
    st.members.foreach(m => seen += m.docId)
    // doc_id order is the canonical replay order inside a micro-batch
    // (iterator order is not deterministic); it only decides WHICH
    // members survive a saturating batch — the pair set below cap is
    // order-independent.
    val fresh = rows.filter(r => !seen.contains(r.doc_id) && seen.add(r.doc_id))
      .toArray.sortBy(_.doc_id)
    var members = st.members
    var nMembers = members.size
    var saturated = false
    val out = List.newBuilder[PairOut]
    var i = 0
    while (i < fresh.length && !saturated) {
      val n = fresh(i)
      var ms = members
      while (ms.nonEmpty) {
        val e = ms.head
        // emit unconditionally: bucket co-membership IS band sharing;
        // cross-band duplicates of this pair land in this same
        // micro-batch (see the emission contract above) and the
        // downstream per-batch distinct collapses them
        val (a, b) =
          if (e.docId < n.doc_id) (e.docId, n.doc_id) else (n.doc_id, e.docId)
        out += PairOut(a, b, estJaccard(n.sig, e.sig))
        ms = ms.tail
      }
      members = Member(n.doc_id, n.sig) :: members
      nMembers += 1
      if (nMembers >= maxBucketSize) saturated = true
      i += 1
    }
    state.update(
      if (saturated) BucketState(Nil, saturated = true)
      else BucketState(members, saturated = false))
    out.result().iterator
  }
}
