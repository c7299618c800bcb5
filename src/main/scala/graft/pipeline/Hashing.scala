package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for the dedup / similarity
  * operators. Two tiers:
  *
  *  - [[md5Hash60]]: first 60 bits of md5 as a non-negative Long. Bit-
  *    identical in Spark (`conv(substring(md5(x),1,15),16,10)`) and in
  *    DuckDB (`('0x'||substr(md5(x),1,15))::BIGINT`) — used by every
  *    oracle-checked query.
  *  - [[fastHash64]]: Spark's native xxhash64 — the production choice
  *    at 100 TB (one codegen'd instruction stream, no md5 string
  *    round-trip). Operators take the hash as a parameter so callers
  *    choose parity (oracle tests) or speed (production).
  *
  * MinHash permutations are universal hashes h_i(x) = (a_i·x + b_i)
  * mod M31 over the 2^31−1 prime field; coefficients are fixed
  * constants derived from the golden-ratio multipliers so both the
  * Spark plan and the generated oracle SQL embed identical literals.
  */
object Hashing {

  /** 2^31 − 1, prime. Field for permutation hashes: keeps a·h + b
    * within 2^62 (no Long overflow) in both engines.
    */
  val M31: Long = 2147483647L

  val NumMinHashes = 16
  /** 8 bands × 2 rows — candidate probability 1−(1−j²)^8. */
  val NumBands = 8
  val RowsPerBand: Int = NumMinHashes / NumBands

  /** Fixed (a, b) pairs for the minhash permutations. */
  val Perms: IndexedSeq[(Long, Long)] = (1 to NumMinHashes).map { i =>
    val a = (0x9E3779B1L * i) % M31
    val b = (0x85EBCA77L * i) % M31
    (if (a == 0) 1L else a, b)
  }

  /** First 60 bits of md5(x) as Long — portable across engines. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same, reduced into the M31 field (input to permutations). */
  def md5HashM31(c: Column): Column = md5Hash60(c) % M31

  /** Production hash: codegen'd xxhash64 (not oracle-portable). */
  def fastHash64(c: Column): Column = xxhash64(c)

  /** Permutation i applied to a field element. */
  def perm(h: Column, i: Int): Column = {
    val (a, b) = Perms(i)
    (lit(a) * h + lit(b)) % lit(M31)
  }

  // ---- DuckDB SQL fragments with the same semantics ----

  def md5Hash60Sql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  def md5HashM31Sql(e: String): String = s"(${md5Hash60Sql(e)} % $M31)"

  def permSql(hExpr: String, i: Int): String = {
    val (a, b) = Perms(i)
    s"(($a * $hExpr + $b) % $M31)"
  }
}
