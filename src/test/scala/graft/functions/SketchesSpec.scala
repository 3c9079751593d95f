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

  test("count-min: estimates upper-bound truth; heavy hitters surface in order") {
    import spark.implicits._
    val data = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c") ++
      (1 to 40).map(i => s"x$i")).toDF("v")
    val top = Sketches.countMinTopK(data, col("v"), k = 3)
      .as[(String, Long)].collect()
    val truth = Map("a" -> 50L, "b" -> 30L, "c" -> 5L)
    // CM never underestimates; with 43 keys in 4x512 cells overshoot is
    // bounded by colliding mass (each colliding key adds its full count)
    top.foreach { case (v, est) =>
      assert(est >= truth.getOrElse(v, 1L), s"$v underestimated: $est")
    }
    assert(top.head._1 == "a" && top(1)._1 == "b",
      s"heavy hitters out of order: ${top.toSeq}")
  }

  test("count-min support pruning: heavy hitters kept, tail dropped, same ests") {
    import spark.implicits._
    // N=1000: two heavy values (30%/20%) over a 500-value tail
    val data = (Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (1 to 500).map(i => s"tail$i")).toDF("v")
    val pruned = Sketches.countMinTopK(data, col("v"), k = 5, minSupport = 0.1)
      .as[(String, Long)].collect().toSeq
    // pruned output ≡ unpruned output filtered at the same φN threshold
    // (est ≥ φN ⟺ every row's cell ≥ φN — min over rows)
    val full = Sketches.countMinTopK(data, col("v"), k = 600)
      .as[(String, Long)].collect().toSeq
    val expected = full.filter(_._2 >= 0.1 * 1000.0).take(5)
    assert(pruned == expected, s"pruned=$pruned expected=$expected")
    assert(pruned.map(_._1) == Seq("hot1", "hot2"),
      s"only the heavy values clear 10% support: $pruned")
  }

  test("count-min estimate is invariant to partitioning (mergeable cells)") {
    import spark.implicits._
    val data = (1 to 500).map(i => s"k${i % 37}").toDF("v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinTopK(df, col("v"), k = 5)
        .as[(String, Long)].collect().toSeq
    assert(run(data.repartition(1)) == run(data.repartition(13)))
  }

  test("count-min DEFAULT prunes at the sketch noise floor (1/width)") {
    import spark.implicits._
    // N=1000 over a long tail: the default (AutoSupport) must equal an
    // EXPLICIT minSupport = 1/width run — the threshold is derived
    // from the sketch, not hardcoded zero
    val data = (Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (1 to 500).map(i => s"tail$i")).toDF("v")
    def run(ms: Double) = Sketches.countMinTopK(data, col("v"), k = 600,
        minSupport = ms).as[(String, Long)].collect().toSeq
    val auto = run(Sketches.AutoSupport)
    assert(auto == run(1.0 / 512))
    // the floor binds: sub-noise tail cells (count < N/width ~ 1.95)
    // are gone from the candidate flow, heavy hitters stay in order
    assert(auto.size < run(0.0).size)
    assert(auto.take(2).map(_._1) == Seq("hot1", "hot2"))
    // the pruning is PUSHED: the sketch filter sits under the broadcast
    // join, so light candidates die map-side inside the join
    val plan = Sketches.countMinTopK(data, col("v"), k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("(cnt#") && plan.contains(">="),
      s"sketch support filter not in the plan:\n${plan.take(2000)}")
  }
}
