package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PromQL vector set ops, histogram_quantile bucket interpolation, and
  * the holt_winters fold — semantics pinned on hand-computable inputs. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: (String, String, Long, Double)*) =
    rows.toSeq.toDF("labels.name", "labels.user", "time", "value")

  test("and/unless/or follow PromQL set semantics on(user)") {
    val left = iv(("m", "a", 10L, 1.0), ("m", "b", 10L, 2.0))
    val right = iv(("w", "b", 20L, 9.0), ("w", "c", 20L, 8.0))
    def users(df: org.apache.spark.sql.DataFrame) =
      df.select(col("`labels.user`"), col("value"))
        .as[(String, Double)].collect().toSet

    // and: left series with a match in right — value stays left's
    assert(users(VectorOps.vectorAnd(left, right, Seq("user"))) ===
      Set(("b", 2.0)))
    // unless: left series with NO match in right
    assert(users(VectorOps.vectorUnless(left, right, Seq("user"))) ===
      Set(("a", 1.0)))
    // or: all of left + right-only series (right's value fills)
    assert(users(VectorOps.vectorOr(left, right, Seq("user"))) ===
      Set(("a", 1.0), ("b", 2.0), ("c", 8.0)))
  }

  test("set-op right sides broadcast (no shuffle of the vector)") {
    val left = iv(("m", "a", 10L, 1.0))
    val right = iv(("w", "a", 20L, 9.0))
    val plan = VectorOps.vectorAnd(left, right, Seq("user"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast semi join, got:\n$plan")
  }

  private def buckets(rows: (String, Double, Double)*) =
    rows.toSeq.toDF("g", "le", "cum")

  test("histogram_quantile interpolates inside the located bucket") {
    // group x: les 10,20,+Inf cum 2,8,10; q=0.5 → rank 5 → bucket (10,20]:
    // 10 + (20-10)*(5-2)/(8-2) = 15
    val b = buckets(("x", 10.0, 2.0), ("x", 20.0, 8.0),
      ("x", Double.PositiveInfinity, 10.0))
    val out = VectorOps.histogramQuantile(b, Seq("g"), q = 0.5)
      .as[(String, Long, Double)].collect().toSet
    assert(out === Set(("x", 10L, 15.0)))
  }

  test("histogram_quantile: first bucket interpolates from lower bound 0") {
    // rank 1 lands in the first bucket: 0 + (10-0)*(1-0)/(4-0) = 2.5
    val b = buckets(("x", 10.0, 4.0), ("x", Double.PositiveInfinity, 4.0))
    val out = VectorOps.histogramQuantile(b, Seq("g"), q = 0.25)
      .as[(String, Long, Double)].collect().toSet
    assert(out === Set(("x", 4L, 2.5)))
  }

  test("histogram_quantile: rank in +Inf bucket returns highest finite le") {
    // rank 0.9*10=9 > cum(20)=8 → +Inf bucket → 20.0
    val b = buckets(("x", 10.0, 2.0), ("x", 20.0, 8.0),
      ("x", Double.PositiveInfinity, 10.0))
    val out = VectorOps.histogramQuantile(b, Seq("g"), q = 0.9)
      .as[(String, Long, Double)].collect().toSet
    assert(out === Set(("x", 10L, 20.0)))
  }

  test("holt_winters ≡ the sequential reference recursion") {
    val sf = 0.5; val tf = 0.3
    val vs = Seq(10.0, 12.0, 11.0, 15.0, 14.0)
    // reference model: level=v0, trend=v1-v0, fold v1..
    var level = vs.head; var trend = vs(1) - vs.head
    vs.tail.foreach { x =>
      val l2 = sf * x + (1 - sf) * (level + trend)
      trend = tf * (l2 - level) + (1 - tf) * trend
      level = l2
    }
    val df = vs.zipWithIndex
      .map { case (v, i) => (i * 1000L, v, "s") }
      .toDF("time", "value", "labels.s")
    val out = RangeVectors.holtWinters(df, stepMs = 86400000L,
      sf = 0.5, sfC = 0.5, tf = 0.3, tfC = 0.7)
      .select(col("n"), col("hw")).as[(Long, Double)].head()
    assert(out._1 === 5L)
    assert(math.abs(out._2 - level) < 1e-6, s"got ${out._2}, want $level")
  }

  test("holt_winters drops single-sample buckets (PromQL needs ≥ 2)") {
    val df = Seq((1000L, 5.0, "s")).toDF("time", "value", "labels.s")
    assert(RangeVectors.holtWinters(df, 86400000L, 0.5, 0.5, 0.3, 0.7).count() === 0)
  }
}
