package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for the native-histogram family plus parity with
  * the classic le-series quantile path on identical binning. */
class NativeHistogramSpec extends SparkSpec {
  import spark.implicits._
  import NativeHistogram._

  // 10 observations for group "a": buckets (0,10]=4, (10,20]=3, (20,+Inf]=3
  private val values =
    Seq(1.0, 5.0, 7.0, 10.0, 12.0, 15.0, 20.0, 25.0, 30.0, 100.0)
  private lazy val hist = build(
    values.map(("a", _)).toDF("g", "v"),
    Seq(col("g")), col("v"), Seq(10.0, 20.0))

  test("build materializes count/sum and every bucket, empties included") {
    val r = hist.select(col("g"), col("hist.count"), col("hist.sum"),
      col("hist.les"), col("hist.counts"))
      .as[(String, Double, Double, Seq[Double], Seq[Double])].head()
    assert(r == (("a", 10.0, values.sum,
      Seq(10.0, 20.0, Double.PositiveInfinity), Seq(4.0, 3.0, 3.0))))
  }

  test("histogram_count/sum/avg read the struct") {
    val (n, s, a) = hist.select(histCount(col("hist")), histSum(col("hist")),
      histAvg(col("hist"))).as[(Double, Double, Double)].head()
    assert(n == 10.0 && s == values.sum && a == values.sum / 10)
  }

  test("fraction: exact on boundaries, interpolated inside a bucket") {
    def frac(lo: Double, hi: Double): Double =
      hist.select(histFraction(col("hist"), lit(lo), lit(hi)))
        .as[Double].head()
    assert(frac(0, 10) == 0.4)          // whole first bucket
    assert(frac(10, 20) == 0.3)         // whole second bucket
    assert(frac(0, 15) == (4.0 + 3.0 * 0.5) / 10)  // half of (10,20]
    assert(frac(0, 100) == 0.7)         // finite x in +Inf bucket: no interp
  }

  test("quantile interpolates inside the chosen bucket; +Inf returns max finite le") {
    def phi(q: Double): Double =
      hist.select(histQuantile(col("hist"), q)).as[Double].head()
    // rank 0.5*10=5 → second bucket (cum 4→7): 10 + 10*(5-4)/3
    assert(math.abs(phi(0.5) - (10.0 + 10.0 / 3)) < 1e-12)
    // rank 2 → first bucket: 0 + 10*(2-0)/4 = 5
    assert(phi(0.2) == 5.0)
    // rank 9 → +Inf bucket → highest finite bound
    assert(phi(0.9) == 20.0)
  }

  test("stddev/stdvar estimate from bucket midpoints (+Inf at its lower bound)") {
    // buckets (0,10]=4 @5, (10,20]=3 @15, (20,+Inf]=3 @20; mean = 22.5
    val mean = values.sum / 10
    val expectedVar =
      (4 * math.pow(5 - mean, 2) + 3 * math.pow(15 - mean, 2) +
        3 * math.pow(20 - mean, 2)) / 10
    val (sv, sd) = hist.select(histStdvar(col("hist")), histStddev(col("hist")))
      .as[(Double, Double)].head()
    assert(math.abs(sv - expectedVar) < 1e-9, s"stdvar=$sv expected=$expectedVar")
    assert(sd == math.sqrt(sv))
  }

  test("merge sums counts element-wise and quantiles the merged histogram") {
    val two = (values.map(("a", _)) ++ Seq(("b", 3.0), ("b", 50.0)))
      .toDF("g", "v")
    val per = build(two, Seq(col("g")), col("v"), Seq(10.0, 20.0))
    val m = merge(per, Seq(lit("all").as("g")), nBoundaries = 2)
    val r = m.select(col("hist.count"), col("hist.sum"), col("hist.counts"))
      .as[(Double, Double, Seq[Double])].head()
    assert(r == ((12.0, values.sum + 53.0, Seq(5.0, 3.0, 4.0))))
  }

  test("histAdd merges two histograms element-wise, per row") {
    val two = Seq(
      ("a", Seq(1.0, 5.0, 12.0)), ("b", Seq(15.0, 25.0)))
      .flatMap { case (g, vs) => vs.map((g, _)) }.toDF("g", "v")
    val per = build(two, Seq(col("g")), col("v"), Seq(10.0, 20.0))
    val pair = per.where(col("g") === "a").select(col("hist").as("ha"))
      .crossJoin(per.where(col("g") === "b").select(col("hist").as("hb")))
    val m = pair.select(histAdd(col("ha"), col("hb")).as("hist"))
      .select(col("hist.count"), col("hist.sum"), col("hist.counts"))
      .as[(Double, Double, Seq[Double])].head()
    assert(m == ((5.0, 58.0, Seq(2.0, 2.0, 1.0))))
  }

  test("native quantile equals the classic le-series path on the same binning") {
    // classic: explode the same observations into cumulative le series
    val obs = values.map(("a", _)).toDF("g", "v")
    val le = when(col("v") > 20.0, lit(Double.PositiveInfinity))
      .otherwise(when(col("v") > 10.0, lit(20.0)).otherwise(lit(10.0)))
    val binned = obs.groupBy(col("g"), le.as("le")).agg(count(lit(1)).as("cnt"))
    val cum = binned.withColumn("cum",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("le").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    for (q <- Seq(0.1, 0.2, 0.5, 0.65, 0.9)) {
      val classic = VectorOps.histogramQuantile(cum, Seq("g"), q)
        .select(col("phi")).as[Double].head()
      val native = hist.select(round(histQuantile(col("hist"), q), 6))
        .as[Double].head()
      assert(native == classic, s"q=$q: native=$native classic=$classic")
    }
  }
}
