package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("deterministic HLL estimates within the m=256 error envelope") {
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val est = Sketches.hllDistinct(li, Seq(col("l_returnflag")), col("l_partkey"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // standard error 1.04/sqrt(256) ≈ 6.5%; allow 3σ
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) / n < 0.20, s"$k: est $e vs exact $n")
    }
  }

  test("HLL estimate is invariant to partitioning (mergeable state)") {
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllDistinct(df, Seq(lit(1).as("g")), col("l_partkey"))
        .collect().head.getDouble(1)
    assert(run(li.repartition(1)) == run(li.repartition(13)))
  }
}
