package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing, built from md5 (bit-identical in
  * every engine) rather than Spark's xxhash64/Murmur3 (whose seeds and
  * variants differ across systems). Used by dedup/minhash/simhash so the
  * DuckDB oracle can reproduce results exactly.
  *
  * `hash64(s)` = first 15 hex digits of md5(s) as a non-negative int64
  * (60 bits — fits a BIGINT in both engines):
  *   Spark : CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)
  *   DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT
  *
  * Everything here is built-in codegen'd expressions — no UDFs, so the
  * hot path stays inside whole-stage codegen and scales columnar.
  */
object Hashing {
  val Mod: Long = 1000000007L

  /** 60-bit portable hash of a string column. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash families h_i(s) = hash64(i ':' s). */
  def hash64(c: Column, seed: Int): Column =
    hash64(concat(lit(seed.toString), lit(":"), c))

  /** Driver-side evaluation of [[hash64]] for CONSTANT strings —
    * bit-identical to the Column form. Use when the hash input is a
    * literal (centroids, LSH planes): md5 inside a Catalyst lambda is
    * not constant-folded, so the Column form would recompute the md5
    * per row. */
  def hash64Const(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15), 16)

  /** The DuckDB SQL fragment equivalent to [[hash64]], for oracle SQL. */
  def duckHash64(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  def duckHash64(expr: String, seed: Int): String =
    duckHash64(s"'$seed:' || $expr")

  // ---- universal hashing family (MinHash permutations) ----
  // h_i(x) = (A_i * (hash64(x) mod P) + B_i) mod P over the Mersenne
  // prime P = 2^31-1: ONE md5 per input + k cheap affine maps, instead
  // of k md5s. Operands stay < 2^62 so the arithmetic is overflow-free
  // (and thus portable) in any engine's int64.
  val MersenneP: Long = 2147483647L

  def affineA(i: Int): Long = ((i * 2654435761L + 1013904223L) % (MersenneP - 1)) + 1
  def affineB(i: Int): Long = (i * 2246822519L + 3266489917L) % MersenneP

  /** i-th universal hash of a 31-bit base hash. */
  def affine(base: Column, i: Int): Column =
    pmod(lit(affineA(i)) * base + lit(affineB(i)), lit(MersenneP))

  /** 31-bit base hash of a string column, input to [[affine]]. */
  def base31(c: Column): Column = pmod(hash64(c), lit(MersenneP))

  def duckBase31(expr: String): String = s"(${duckHash64(expr)} % $MersenneP)"

  def duckAffine(baseExpr: String, i: Int): String =
    s"((${affineA(i)} * $baseExpr + ${affineB(i)}) % $MersenneP)"
}
