package graft

import scala.sys.process._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reproduce-then-guard probes for the documented Spark↔DuckDB oracle
  * gotchas (the engine's verification notes): each class of engine
  * divergence that once cost a red hash gate is pinned as a named test
  * against the SAME DuckDB the oracle gate runs (via python3, like
  * scripts/check.py), so a behavior change in either engine surfaces
  * here instead of as an undiagnosed gate failure. Skips cleanly when
  * python3/duckdb are unavailable (the library itself never needs
  * them).
  */
class OracleParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  /** One duckdb query → stdout lines of its single column. */
  private def duck(sql: String): Option[Seq[String]] = {
    val script =
      s"""import duckdb
         |for r in duckdb.sql(${"\"\"\""}$sql${"\"\"\""}).fetchall():
         |    print(r[0])
         |""".stripMargin
    try Some(Seq("python3", "-c", script).!!.trim.split("\n").toSeq)
    catch { case _: Exception => None }
  }

  private def assumeDuck(): Unit =
    assume(duck("SELECT 1").contains(Seq("1")), "python3+duckdb unavailable")

  test("gotcha: DuckDB decimal down-cast truncates where Spark rounds (guard: round before cast)") {
    assumeDuck()
    val x = "1.2345675"
    // Spark: HALF_UP on the cast
    val sparkVal = spark.range(1)
      .select(lit(x).cast("decimal(18,7)").cast("decimal(18,6)")
        .cast("string"))
      .head.getString(0)
    assert(sparkVal == "1.234568")
    // DuckDB: the bare cast truncates toward zero — the divergence
    val duckBare =
      duck(s"SELECT CAST(CAST('$x' AS DECIMAL(18,7)) AS DECIMAL(18,6))").get.head
    assert(duckBare == "1.234567", "DuckDB cast behavior changed — " +
      "re-audit every oracle decimal cast")
    // the documented guard: round(x, 6) matches Spark's HALF_UP
    val duckGuarded =
      duck(s"SELECT round(CAST('$x' AS DECIMAL(18,7)), 6)").get.head
    assert(duckGuarded == "1.234568")
  }

  test("gotcha: DECIMAL(38,12) sums stay DECIMAL in both engines and round-trip exactly") {
    assumeDuck()
    // pin the type algebra every decimal-routed oracle sum relies on.
    // (This container's DuckDB 1.0.0 CAPS add/sum precision at 38 —
    // it does NOT degrade to DOUBLE as a round-3 note claimed; if this
    // assertion ever sees DOUBLE, every decimal mirror needs re-audit.)
    val duckAdd = duck(
      "SELECT typeof(CAST(1 AS DECIMAL(38,12)) + CAST(1 AS DECIMAL(38,12)))")
      .get.head
    assert(duckAdd == "DECIMAL(38,12)", s"add type changed: $duckAdd")
    val duckSum = duck(
      "SELECT typeof(sum(CAST(x AS DECIMAL(38,12)))) FROM (VALUES (1), (2)) t(x)")
      .get.head
    assert(duckSum == "DECIMAL(38,12)", s"sum type changed: $duckSum")
    // Spark's sum over DECIMAL(38,12) stays decimal too (overflow →
    // null, never silent doubles)
    val sparkType = spark.range(1)
      .select(sum(lit(1).cast("decimal(38,12)")))
      .schema.fields(0).dataType.typeName
    assert(sparkType.startsWith("decimal"), sparkType)
    // and the value-level contract the gates hash: an order-scrambled
    // decimal-routed sum is identical across the engines at the edge
    val vals = (1 to 200).map(i => i * 0.0123456789)
    import spark.implicits._
    val sparkSum = vals.toDF("x")
      .select(sum(col("x").cast("decimal(38,12)")).cast("double"))
      .head.getDouble(0)
    val exprs = vals.reverse
      .map(v => "(" + String.format(java.util.Locale.ROOT, "%.17g", Double.box(v)) + ")")
      .mkString(", ")
    val duckVal = duck(
      s"SELECT CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) " +
        s"FROM (VALUES $exprs) t(x)").get.head.toDouble
    assert(sparkSum == duckVal)
  }

  test("gotcha: DuckDB sum(BIGINT) widens to HUGEINT → float in the gate (guard: CAST AS BIGINT)") {
    assumeDuck()
    // the r3 red-gate root cause: the type, not the value
    assert(duck("SELECT typeof(sum(x)) FROM (VALUES (1), (2)) t(x)").get.head
      == "HUGEINT")
    assert(duck(
      "SELECT typeof(CAST(sum(x) AS BIGINT)) FROM (VALUES (1), (2)) t(x)")
      .get.head == "BIGINT")
  }

  test("gotcha: round(x, 6) diverges at 6dp ties; the scaled sequence does not") {
    assumeDuck()
    // exact-ratio values of the corpus_stats/compression shape: n/d at
    // 6-7 significant digits lands on representation-dependent 6dp
    // ties where the engines' round(x, 6) paths may disagree
    val pairs = for (d <- 16 to 64; n <- Seq(7 * d + d / 2, 13 * d + d / 2))
      yield (n.toLong, d.toLong)
    val vals = pairs.map { case (n, d) => n.toDouble / d.toDouble }
    import spark.implicits._
    val df = vals.toDF("x")
    val sparkPlain = df.select(round(col("x"), 6)).collect().map(_.getDouble(0))
    val sparkScaled = df.select(
        (round(col("x") * 1e6).cast("long").cast("double") / 1e6))
      .collect().map(_.getDouble(0))
    val exprs = vals
      .map(v => "(" + String.format(java.util.Locale.ROOT, "%.17g", Double.box(v)) + ")")
      .mkString(", ")
    // cast to DOUBLE: a bare VALUES literal parses as DECIMAL and the
    // ×1e6 multiply overflows DECIMAL(18) — the gates always round
    // DOUBLE columns
    val duckPlain = duck(
      s"SELECT round(CAST(x AS DOUBLE), 6) FROM (VALUES $exprs) t(x)")
      .get.map(_.toDouble)
    val duckScaled = duck(
      s"SELECT CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) / 1000000.0 " +
        s"FROM (VALUES $exprs) t(x)").get.map(_.toDouble)
    // the GUARD must hold everywhere — this is what every gated 6dp
    // output edge relies on
    (sparkScaled, duckScaled).zipped.zipWithIndex.foreach {
      case ((s, d), i) =>
        assert(s == d, s"scaled-round diverged at ${vals(i)}: $s vs $d")
    }
    // plain round(x, 6) agreement is NOT guaranteed — record whether a
    // tie reproduced (informational: both outcomes are acceptable, the
    // gates never use the plain form on exact ratios)
    val divergent = (sparkPlain, duckPlain).zipped.count(p => p._1 != p._2)
    info(s"plain round(x,6): $divergent/${vals.size} tie divergences " +
      "(scaled sequence: 0)")
  }

  test("gotcha: Column Long/Long division is double math — ns→µs must route DECIMAL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2024-epoch ns values need 61 bits; the double cast rounds them
    // to multiples of 256 BEFORE a `/ 1000`, leaving ~1.5% of µs-
    // aligned conversions one µs low. This pins the DECIMAL-routed
    // form (ArchiveStore.microsCol / Samples.rawTsFromNs) against
    // driver-side exact integer division.
    val ns = (0 until 2000).map(i => 1704067200000000000L + i.toLong * 1000L)
    val df = ns.toDF("ts")
    val decimalRouted = df.select(
        ((col("ts") - pmod(col("ts"), lit(1000L))).cast("decimal(20,0)")
          / lit(1000L)).cast("long").as("us"))
      .collect().map(_.getLong(0))
    val doubleDivided = df.select(
        ((col("ts") - pmod(col("ts"), lit(1000L))) / lit(1000L))
          .cast("long").as("us"))
      .collect().map(_.getLong(0))
    val exact = ns.map(Math.floorDiv(_, 1000L))
    assert(decimalRouted.toSeq == exact,
      "DECIMAL-routed ns→µs must be exact")
    val off = (doubleDivided, exact).zipped.count(p => p._1 != p._2)
    info(s"double-division form: $off/2000 off by one µs (DECIMAL form: 0)")
    assert(off > 0, "expected the double form to reproduce the rounding bug")
  }
}
