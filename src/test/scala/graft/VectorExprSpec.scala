package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

class VectorExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, -0.5, 0.0), Array(1.0, 1.0, 1.0))
  ).toDF("id", "a", "b")

  test("vector_dot equals the zip_with+aggregate fold bit-for-bit") {
    val fold = aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _)
    val rows = df.select(
      VectorExpressions.vector_dot(col("a"), col("b")).as("native"),
      fold.as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(32.0, 0.0))
  }

  test("vector_dot null and type behavior") {
    val withNull = Seq((Option.empty[Array[Double]], Option(Array(1.0))))
      .toDF("a", "b")
    assert(withNull.select(VectorExpressions.vector_dot(col("a"), col("b")))
      .head.isNullAt(0))
    val err = intercept[Exception] {
      df.select(VectorExpressions.vector_dot(col("id"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("vector_dot") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch") ||
      err.getMessage.toLowerCase.contains("cannot resolve"))
  }

  test("vector_dot is registered for SQL and survives codegen") {
    VectorExpressions.register(spark)
    df.createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT id, vector_dot(a, b) AS d FROM vecs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 32.0, 2L -> 0.0))
  }

  test("vector_cosine matches Similarity.cosine on float embeddings") {
    val e = Seq((Array(1.0f, 0.0f), Array(0.6f, 0.8f))).toDF("a", "b")
    val c = e.select(graft.pipeline.Similarity.cosine(
      col("a").cast("array<double>"), col("b").cast("array<double>")).as("c"))
      .head.getDouble(0)
    assert(math.abs(c - 0.6) < 1e-7)
  }

  test("nfc_normalize composes, maps singletons, fast-paths NFC text, is SQL-registered") {
    import graft.functions.StringExpressions
    val d = Seq(
      (1L, "Cafe\u0301"),  // e + combining acute -> e-acute
      (2L, "\u212B"),     // ANGSTROM SIGN → Å (NFC singleton)
      (3L, "already ascii"),       // fast path: returned untouched
      (4L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val got = d.select(col("id"),
        StringExpressions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "Caf\u00e9" && got(1L).length == 4)
    assert(got(2L) == "\u00c5")
    assert(got(3L) == "already ascii")
    assert(got(4L) == null)
    // codegen path via SQL registration
    StringExpressions.register(spark)
    d.createOrReplaceTempView("nfc_t")
    val viaSql = spark.sql(
      "SELECT id, length(nfc_normalize(s)) AS l FROM nfc_t WHERE s IS NOT NULL ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == Map(1L -> 4, 2L -> 1, 3L -> 13))
    // type check fires on non-strings
    val err = intercept[Exception] {
      d.select(StringExpressions.nfc_normalize(col("id"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("nfc_normalize") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
