package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Hashing._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two tiers:
  *
  *  - brute-force cosine top-k for a small probe set: broadcast the
  *    probes, scan the corpus once — the exact baseline, linear in
  *    corpus size and embarrassingly parallel;
  *  - random-hyperplane LSH bucketing: each vector gets a bucket id
  *    from the sign pattern of `NumPlanes` fixed ±1 hyperplane dot
  *    products; candidates are restricted to same-bucket vectors, so
  *    the join is an equi-join on bucket — the shape that survives
  *    10^9 vectors (bucket count grows with NumPlanes; skewed buckets
  *    split by AQE).
  *
  * Hyperplane coefficients are fixed ±1 constants derived from the
  * shared hash constants, embedded literally in both the Spark plan
  * and the oracle SQL.
  */
object Similarity {

  val Dim = 64
  val NumPlanes = 8

  /** Deterministic ±1 hyperplane coefficients [plane][dim]. */
  val Planes: IndexedSeq[IndexedSeq[Double]] =
    (0 until NumPlanes).map { p =>
      (0 until Dim).map { d =>
        val h = (0x9E3779B1L * (p * Dim + d + 1)) % M31
        if (h % 2 == 0) 1.0 else -1.0
      }
    }

  /** Cosine similarity between two double-array columns. Uses the
    * native codegen'd [[graft.functions.VectorDot]] expression; its
    * sequential left-to-right summation is bit-identical to the
    * `zip_with`+`aggregate` fold it replaces, so oracle parity holds.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vector_cosine(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force top-k: for each probe vector, the k nearest corpus
    * vectors by cosine. Probes are broadcast; ranking is on the
    * 6dp-rounded similarity with vec_id tie-break (deterministic).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.as("c")
      .join(broadcast(probes.as("p")), col("c.vec_id") =!= col("p.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("vec_id"),
        round(cosine(asDouble(col("p.embedding")), asDouble(col("c.embedding"))), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** LSH bucket id: bit p set iff plane p's dot product is >= 0. */
  def bucketId(embedding: Column): Column =
    (0 until NumPlanes).map { p =>
      val dot = graft.functions.VectorExpressions.vector_dot(
        asDouble(embedding), lit(Planes(p).toArray))
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style assignment: each vector goes to its nearest seed
    * centroid (deterministic seeds = the first `k` vectors). One
    * broadcast of k centroids against a single corpus scan — the
    * coarse-quantizer shape of an IVF index build; a probe search then
    * touches only its cluster's inverted list instead of the corpus.
    */
  def ivfAssign(corpus: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seeds = corpus.where(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("embedding").as("seed_emb"))
    val scored = corpus.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cluster"),
        round(cosine(asDouble(col("embedding")), asDouble(col("seed_emb"))), 6)
          .as("cos_to_centroid"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_to_centroid").desc, col("cluster"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cluster"), col("cos_to_centroid"))
  }

  /** Embedding-cosine near-dup: candidate pairs from shared LSH
    * buckets, kept when exact cosine clears `minCos`. Same
    * never-all-pairs shape as the text dedup family.
    */
  def embeddingNearDup(corpus: DataFrame, minCos: Double): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      bucketId(col("embedding")).as("bucket"))
    b.as("a").join(b.as("bb"),
        col("a.bucket") === col("bb.bucket") &&
        col("a.vec_id") < col("bb.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("bb.vec_id").as("vec_b"),
        round(cosine(asDouble(col("a.embedding")),
          asDouble(col("bb.embedding"))), 6).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }

  /** Bucketed ANN: per vector, its best same-bucket neighbour (by
    * rounded cosine, vec_id tie-break) plus bucket occupancy. At scale
    * the same-bucket self-join replaces the quadratic all-pairs scan.
    */
  def lshNearestInBucket(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = corpus.select(col("vec_id"), col("embedding"),
      bucketId(col("embedding")).as("bucket"))
    val withN = b.withColumn("n_in_bucket",
      count(lit(1)).over(Window.partitionBy("bucket")))
    val pairs = withN.as("a").join(b.as("bb"),
        col("a.bucket") === col("bb.bucket") &&
        col("a.vec_id") =!= col("bb.vec_id"), "left")
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("a.n_in_bucket").as("n_in_bucket"),
        col("bb.vec_id").as("mate_id"),
        when(col("bb.vec_id").isNotNull,
          round(cosine(asDouble(col("a.embedding")),
            asDouble(col("bb.embedding"))), 6)).as("cos_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim").desc_nulls_last, col("mate_id").asc_nulls_last)
    pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("bucket"), col("n_in_bucket"),
        col("mate_id").as("best_mate"), col("cos_sim").as("best_cos"))
  }
}
