package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Retrieval, Sampling, Similarity, TextAnalysis}

/** Round-7 training-data-preparation operators: chunking, vocabulary
  * construction + id encoding, inverted index, semantic
  * decontamination, source interleaving, and the mergeable HLL
  * vocabulary sketch.
  */
class TrainingPrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("s"), col("doc_id") % 3))

  // ---- chunking ------------------------------------------------------

  test("chunkDocs tiles exactly when stride == chunk and reconstructs the corpus") {
    val d = docs(
      1L -> (1 to 10).map(i => s"t$i").mkString(" "), // 10 toks → 3+3+3+1
      2L -> "a b c",                                   // short single chunk
      3L -> "   ",                                     // empty → no chunks
      4L -> "x")                                       // 1 tok
    val c = TextAnalysis.chunkDocs(d, chunkTokens = 3, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(!c.exists(_._1 == 3L), "empty doc produced a chunk")
    val doc1 = c.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._2).sameElements(Array(0L, 1L, 2L, 3L)))
    assert(doc1.map(_._3).sameElements(Array(3L, 3L, 3L, 1L)))
    // exact tiling reconstructs the tokenized document
    assert(doc1.map(_._4).mkString(" ") ==
      (1 to 10).map(i => s"t$i").mkString(" "))
    assert(c.filter(_._1 == 2L).map(_._4).toSeq == Seq("a b c"))
    assert(c.filter(_._1 == 4L).map(_._4).toSeq == Seq("x"))
  }

  test("chunkDocs with stride < chunk overlaps by chunk - stride tokens") {
    val d = docs(1L -> (1 to 10).map(i => s"w$i").mkString(" "))
    val c = TextAnalysis.chunkDocs(d, chunkTokens = 4, stride = 2)
      .orderBy("chunk_id").collect()
    // starts 0,2,4,6,8 → 5 chunks; consecutive chunks share 2 tokens
    assert(c.length == 5)
    val texts = c.map(_.getString(3))
    assert(texts(0) == "w1 w2 w3 w4" && texts(1) == "w3 w4 w5 w6")
    assert(texts(4) == "w9 w10") // natural short tail, no padding
    // every token position is covered by at least one chunk
    val covered = c.flatMap { r =>
      val start = r.getLong(1) * 2
      start until (start + r.getLong(2))
    }.toSet
    assert(covered == (0L until 10L).toSet)
  }

  // ---- vocabulary + encoding ----------------------------------------

  test("vocabulary ranks by count desc then token asc with dense ids from 0") {
    val d = docs(1L -> "b b b a a c", 2L -> "a c c d")
    val v = TextAnalysis.vocabulary(d, vocabSize = 3)
      .orderBy("token_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // counts: a=3 b=3 c=3 d=1 → ties broken token-asc, top-3 cuts d
    assert(v.toSeq == Seq(("a", 0, 3L), ("b", 1, 3L), ("c", 2, 3L)))
  }

  test("encodeIds round-trips through a covering vocabulary and flags OOV as -1") {
    val d = docs(1L -> "the quick fox", 2L -> "the lazy dog")
    val full = TextAnalysis.vocabulary(d, vocabSize = 100)
    val enc = TextAnalysis.encodeIds(d, full)
    // decode through the vocabulary and compare to the tokenization
    val decoded = enc.join(full, Seq("token_id"))
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("token")))),
        s => s.getField("token"))).as("rt"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(decoded.sameElements(Array("the quick fox", "the lazy dog")))
    // a 1-token vocabulary leaves everything else at -1, positions intact
    val tiny = TextAnalysis.vocabulary(d, vocabSize = 1) // "the" (count 2)
    val enc1 = TextAnalysis.encodeIds(d, tiny).orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(enc1.toSeq == Seq((1L, 0L, 0), (1L, 1L, -1), (1L, 2L, -1),
      (2L, 0L, 0), (2L, 1L, -1), (2L, 2L, -1)))
  }

  // ---- inverted index ------------------------------------------------

  test("invertedIndex applies the df band and emits sorted postings") {
    val d = docs(
      1L -> "alpha beta gamma",
      2L -> "alpha beta",
      3L -> "alpha stop stop", // within-doc dup counts once
      4L -> "alpha")
    val ix = Retrieval.invertedIndex(d, minDf = 2L, maxDf = 3L)
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // alpha df=4 > maxDf (hot key banded out); gamma/stop df=1 < minDf
    assert(ix.toSeq == Seq(("beta", 2L, "1,2")))
  }

  // ---- semantic decontamination --------------------------------------

  test("semanticDecontaminate flags near-eval vectors and excludes self-pairs") {
    val mk = (id: Long, v: Seq[Double]) => (id, v.map(_.toFloat).toArray)
    val e = Seq(
      mk(0L, Seq(1.0, 0.0, 0.0, 0.0)),   // eval
      mk(1L, Seq(0.0, 1.0, 0.0, 0.0)),   // eval
      mk(10L, Seq(0.99, 0.01, 0.0, 0.0)), // near eval 0 → contaminated
      mk(11L, Seq(0.0, 0.0, 1.0, 0.0)),   // orthogonal → clean
      mk(12L, Seq(-1.0, 0.0, 0.0, 0.0)))  // anti-parallel → clean
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(
        e, e.where(col("vec_id") < 2), minCos = 0.9)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(10L)._3 && byId(10L)._2 > 0.99)
    assert(!byId(11L)._3 && byId(11L)._2 == 0.0)
    assert(!byId(12L)._3 && byId(12L)._2 == 0.0) // max vs OTHER eval, not -1
    // eval vectors score against the OTHER eval vector, never themselves
    assert(byId(0L)._2 == 0.0 && byId(1L)._2 == 0.0)
    assert(out.length == 5)
  }

  // ---- interleaving ---------------------------------------------------

  test("interleave round-robins sources and train_ord is strictly increasing") {
    val d = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("source", concat(lit("s"), col("doc_id") % 3))
    val out = Sampling.interleave(d).orderBy("train_ord").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 30)
    assert(out.map(_._4).distinct.length == 30, "train_ord must be unique")
    // equal-size sources: a full round-robin — every consecutive
    // 3-window of the global order sees all three sources
    out.grouped(3).foreach { g =>
      assert(g.map(_._2).toSet == Set("s0", "s1", "s2"), g.mkString(","))
    }
    // rank_in_source is dense 0..9 per source
    out.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(0L until 10L))
    }
    // determinism: same input → identical order
    val again = Sampling.interleave(d).orderBy("train_ord").collect()
      .map(r => r.getLong(0))
    assert(again.sameElements(out.map(_._1)))
  }

  test("interleave stays strictly increasing when sources exhaust unevenly") {
    val d = (0L until 21L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("source",
        when(col("doc_id") < 18, lit("big")).otherwise(lit("small")))
    val ord = Sampling.interleave(d).orderBy("train_ord")
      .select("train_ord").collect().map(_.getLong(0))
    assert(ord.length == 21 && ord.distinct.length == 21)
    assert(ord.sameElements(ord.sorted))
  }

  // ---- HLL vocabulary sketch ------------------------------------------

  test("vocabSketch estimate tracks the exact distinct and shard merge ≈ whole") {
    // synthetic corpus: per-lang vocab sizes spanning the coupon and
    // HLL regimes at lgK=12
    val d = (0L until 4000L).map { i =>
      val lang = if (i % 2 == 0) "en" else "zh"
      // en: 200-token vocab (coupon regime); zh: 2000 (estimation)
      val tok = if (lang == "en") s"e${i % 200}" else s"z${i % 2000}"
      (i, s"$tok $tok fill${i % 7}", lang)
    }.toDF("doc_id", "text", "lang")
    val exact = d.select(col("lang"),
        explode(Dedup.tokens("text")).as("tok"))
      .groupBy("lang").agg(countDistinct("tok").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = TextAnalysis.vocabEstimate(TextAnalysis.vocabSketch(d))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, n) =>
      val est = whole(lang)
      assert(math.abs(est - n).toDouble / n < 0.05,
        s"$lang: est $est vs exact $n")
    }
    // mergeability: two disjoint doc_id shards, sketched independently
    // and merged, estimate within the same bound
    val shA = TextAnalysis.vocabSketch(d.where(col("doc_id") % 2 === 0))
    val shB = TextAnalysis.vocabSketch(d.where(col("doc_id") % 2 =!= 0))
    val merged = TextAnalysis.vocabEstimate(
        TextAnalysis.vocabSketchMerge(shA, shB))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, n) =>
      assert(math.abs(merged(lang) - n).toDouble / n < 0.05,
        s"merged $lang: ${merged(lang)} vs exact $n")
    }
    // coupon regime is exact: the 200-token lang estimates exactly
    assert(whole("en") == exact("en") && merged("en") == exact("en"))
  }

  // ---- curriculum ordering (round 8) ---------------------------------

  test("curriculumOrder assigns a 1..n permutation matching the total order") {
    val d = docs((0L until 60L).map { i =>
      // varied stopword density → a spread of quality scores with ties
      val stops = "the and is of " * (i % 5).toInt
      i -> s"$stops tok$i alpha beta gamma delta"
    }: _*)
    val out = Sampling.curriculumOrder(d, parts = 7).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._3).sorted.sameElements(1L to 60L),
      "positions are not a 1..n permutation")
    // position order == (quality desc, doc_id asc) total order
    val byPos = out.sortBy(_._3)
    val expected = out.sortBy(t => (-t._2, t._1))
    assert(byPos.map(_._1).sameElements(expected.map(_._1)))
    // partition count must not change the ordinals
    val alt = Sampling.curriculumOrder(d, parts = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.forall { case (id, _, pos) => alt(id) == pos },
      "positions depend on the range partition count")
  }

  // ---- sequential shard packing (round 8) ----------------------------

  test("packSequential fills shards to the budget via a distributed prefix sum") {
    val d = docs((0L until 40L).map(i =>
      i -> (1 to (3 + (i % 5)).toInt).map(j => s"w$j").mkString(" ")): _*)
    val out = Sampling.packSequential(d, budgetTokens = 20L, parts = 5)
      .orderBy("train_ord").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // shards are contiguous runs in training order, starting at 0
    val shards = out.map(_._4)
    assert(shards.head == 0L && shards.sameElements(shards.sorted))
    // shard boundaries honor the prefix-sum law: a doc's shard is
    // tokens-before div budget
    var cum = 0L
    out.foreach { case (_, _, nTok, shard) =>
      assert(shard == cum / 20L); cum += nTok
    }
    // every shard except possibly the last spans ≥ budget tokens from
    // its start (overflow bounded by one doc per boundary)
    val perShard = out.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
    perShard.toSeq.sortBy(_._1).dropRight(1).foreach { case (sh, toks) =>
      assert(toks >= 20L - 7L, s"shard $sh underfilled: $toks")
    }
    // partition count must not change the assignment
    val alt = Sampling.packSequential(d, budgetTokens = 20L, parts = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out.forall { case (id, _, _, sh) => alt(id) == sh })
  }

  // ---- fixed-length sequence packing (round 9) -----------------------

  test("packSequences cuts the EOS-joined global token stream every seqLen ids") {
    // doc 0: 5 tokens + EOS = 6; doc 1: 3 + EOS = 4; doc 2: 2 + EOS = 3
    // stream (L=4): [d0t0 d0t1 d0t2 d0t3 | d0t4 EOS d1t0 d1t1 |
    //                d1t2 EOS d2t0 d2t1 | EOS]
    val d = docs(
      0L -> "a b c d e",
      1L -> "a b zz",   // zz is OOV with vocabSize 2 → −1
      2L -> "b b")
    val out = Sampling.packSequences(d, vocabSize = 2, seqLen = 4L)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // every sequence but the last is exactly seqLen ids
    assert(out.dropRight(1).forall(_._2 == 4L) && out.last._2 == 1L)
    // vocab: b (4 occurrences) = 0, a (2) = 1; OOV −1; EOS −2
    assert(out(0)._4 == "1,0,-1,-1") // a b c d (c,d OOV)
    assert(out(1)._4 == "-1,-2,1,0") // e EOS a b
    assert(out(2)._4 == "-1,-2,0,0") // zz EOS b b
    assert(out(3)._4 == "-2")        // trailing EOS
    // n_docs counts boundary crossings: seq 1 spans docs 0 and 1
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 2L, 1L))
    // token conservation: Σ n_tokens = Σ (len + 1 EOS)
    assert(out.map(_._2).sum == (5 + 1) + (3 + 1) + (2 + 1))
  }

  // ---- hybrid RRF retrieval (round 8) --------------------------------

  test("hybridRrf fuses BM25 and cosine ranks by 1/(60+r) with doc_id ties") {
    val d = docs(
      0L -> "hash stuff here",
      1L -> "hash hash hash",
      2L -> "hash",
      3L -> "unrelated words only")
    val e = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(1f, 0.05f)))
      .toDF("vec_id", "embedding")
    val lex = Retrieval.bm25TopK(d, Seq("hash"), 50).orderBy(
        col("score").desc, col("doc_id")).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }
      .toMap
    val sem = Similarity.bruteForceTopK(e, e.where(col("vec_id") === 0L), 50)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    val expected = (0L to 3L).flatMap { id =>
      val s = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        sem.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      if (s > 0) Some(id -> math.round(s * 1e6) / 1e6) else None
    }.sortBy(t => (-t._2, t._1))
    val out = Retrieval.hybridRrf(d, e, Seq("hash"), probeVecId = 0L,
        n = 50, k = 10).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == expected,
      s"fused ranking mismatch: got ${out.toSeq} want $expected")
    // a doc present in BOTH lists outranks one with a single, equal-
    // or-worse contribution: doc 1 (lex 1, sem 2) beats doc 3 (sem 1)
    assert(out.head._1 == 1L)
  }

  // ---- per-language length quantiles (round 8) -----------------------

  test("lengthQuantiles interpolates exactly and counts above the median") {
    val d = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "en", 40L),
      (5L, "de", 5L), (6L, "de", 7L), (7L, "de", 9L))
      .toDF("doc_id", "lang", "n_chars")
    val out = TextAnalysis.lengthQuantiles(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))).toMap
    // en: p·(n−1) over [10,20,30,40] → p25 = 17.5, p50 = 25, p75 = 32.5
    assert(out("en") == ((4L, 17.5, 25.0, 32.5, 2L)))
    // de: odd count → p50 is the middle value; all-above count incl. it
    assert(out("de") == ((3L, 6.0, 7.0, 8.0, 2L)))
  }
}
