package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for extreme key skew — the manual escape hatch for
  * the case AQE's skew-join split cannot fix (a single key so hot that
  * one task would own it, with a probe side too large to broadcast).
  *
  * Shape: the skewed (big) side gets a deterministic per-row salt in
  * [0, salts); the build (smaller, but not broadcastable) side is
  * replicated `salts` times; the join key becomes (key, salt), so the
  * hot key's rows spread over `salts` tasks instead of one. Cost:
  * build-side volume × salts — choose `salts` ≈ (hot-key rows /
  * rows-per-healthy-task), not larger.
  *
  * Semantics: exactly the plain inner/left equi-join — every big-side
  * row meets every build-side row of its key exactly once (the row's
  * single salt × the replica carrying that salt).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic, uniformly-spread salt: hash of the whole row spreads
    // even identical keys (monotonically_increasing_id would too, but
    // hashing keeps the salt stable under re-execution of a task)
    val bigSalted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val cond: Column = (keys.map(k => bigSalted(k) === smallSalted(k)) :+
      (bigSalted("_salt") === smallSalted("_salt"))).reduce(_ && _)
    keys.foldLeft(
      bigSalted.join(smallSalted, cond, joinType)
        .drop(smallSalted("_salt")).drop(bigSalted("_salt"))
    )((df, k) => df.drop(smallSalted(k)))
  }
}
