package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Dedup
import graft.pipeline.Hashing.{NumBands, NumMinHashes, RowsPerBand}

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
  * Exactly-once pair emission WITHOUT a second stateful dedup
  * operator: a pair sharing several bands would be emitted by several
  * buckets, but each bucket holds both FULL signatures, so every
  * bucket computes the same [[firstSharedBand]] locally and only the
  * bucket whose band equals it emits. The drained stream is therefore
  * the batch candidate set row for row (same pairs, same
  * est_jaccard), which is what lets `stream_dedup_minhash` share
  * `dedup_minhash_lsh`'s DuckDB oracle.
  *
  * Scale guard (the streaming analog of
  * [[graft.pipeline.Dedup.capBandSize]]): a boilerplate (band, key)
  * bucket grows O(members) state and O(members) comparisons per
  * arrival. At `maxBucketSize` the bucket SATURATES — it stops
  * storing and stops emitting, so a pathological key costs O(cap)
  * forever instead of quadratically exploding state and output. The
  * semantics necessarily differ from the batch cap (which drops
  * oversized buckets retroactively, pairs and all — a stream cannot
  * un-emit), so saturation is prospective: the first `maxBucketSize`
  * members pair normally, later arrivals are ignored by this bucket
  * (a differing pair still meets in a less-common band, the same
  * recall argument as the batch cap).
  *
  * Replays are free: a doc_id already in bucket state is dropped, so
  * at-least-once upstream delivery still yields exactly-once pairs.
  */
object StreamingDedup {

  case class BandIn(band: Int, key: String, doc_id: Long, sig: Seq[Long])
  case class Member(docId: Long, sig: Seq[Long])
  case class BucketState(members: List[Member], saturated: Boolean)
  case class PairOut(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Smallest band index whose RowsPerBand signature components all
    * match (equal components ⇔ equal band key — the "_"-joined key is
    * unambiguous). Both docs of a candidate pair share at least one
    * band by construction, so this is always >= 0 for bucket
    * co-members.
    */
  def firstSharedBand(a: Seq[Long], b: Seq[Long]): Int = {
    var band = 0
    while (band < NumBands) {
      var r = 0
      var same = true
      while (same && r < RowsPerBand) {
        val i = band * RowsPerBand + r
        same = a(i) == b(i)
        r += 1
      }
      if (same) return band
      band += 1
    }
    -1
  }

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

  private def processBucket(maxBucketSize: Int)(
      bucket: (Int, String), rows: Iterator[BandIn],
      state: GroupState[BucketState]): Iterator[PairOut] = {
    val st = state.getOption.getOrElse(BucketState(Nil, saturated = false))
    if (st.saturated) return Iterator.empty
    val thisBand = bucket._1
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
        if (firstSharedBand(n.sig, e.sig) == thisBand) {
          val (a, b) =
            if (e.docId < n.doc_id) (e.docId, n.doc_id) else (n.doc_id, e.docId)
          out += PairOut(a, b, estJaccard(n.sig, e.sig))
        }
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
