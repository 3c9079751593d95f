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

  test("quantile edge contract: q<0 → -Inf, q>1 → +Inf (Prometheus bucketQuantile)") {
    val (lo, hi) = hist.select(
      histQuantile(col("hist"), -0.5), histQuantile(col("hist"), 1.5))
      .as[(Double, Double)].head()
    assert(lo == Double.NegativeInfinity && hi == Double.PositiveInfinity)
  }

  test("quantile q=0 skips empty leading buckets instead of dividing 0/0") {
    // every observation above the first bucket: (−inf,10]=0, (10,20]=2
    val h = build(Seq(("a", 12.0), ("a", 15.0)).toDF("g", "v"),
      Seq(col("g")), col("v"), Seq(10.0, 20.0))
    val phi = h.select(histQuantile(col("hist"), 0.0)).as[Double].head()
    assert(phi == 10.0, s"q=0 over an empty first bucket gave $phi (was NaN)")
  }

  test("exponential schema 0 derives exact base-2 bounds; schema s refines by 2^s") {
    assert(exponentialLes(0, 0, 9) == (0 to 9).map(i => math.pow(2.0, i)))
    // schema 2: base 2^(1/4); bound i = 2^(i/4), exact at multiples of 4
    val s2 = exponentialLes(2, -2, 8)
    assert(s2.size == 11 && s2(2) == 1.0 && s2(6) == 2.0 && s2(10) == 4.0)
    assert(s2.zip(s2.tail).forall { case (a, b) => a < b })
    assert(math.abs(s2(3) - math.pow(2.0, 0.25)) == 0.0)
  }

  test("buildExp ≡ build on the schema-derived grid plus the zero bucket") {
    val df = values.map(("a", _)).toDF("g", "v")
    val exp = buildExp(df, Seq(col("g")), col("v"),
      schema = 0, minExp = 0, maxExp = 7)
    val manual = build(df, Seq(col("g")), col("v"),
      0.0 +: (0 to 7).map(i => math.pow(2.0, i)))
    val (a, b) = (exp.select(col("hist")).head(), manual.select(col("hist")).head())
    assert(a == b)
    // spot semantics: zero bucket empty, (4,8]={5,7}, (64,128]={100},
    // +Inf overflow empty (max value 100 ≤ 128)
    val counts = exp.select(col("hist.counts")).as[Seq[Double]].head()
    assert(counts.head == 0.0 && counts(4) == 2.0 &&
      counts(8) == 1.0 && counts.last == 0.0)
  }

  test("histAdd and merge refuse mismatched bucket layouts instead of truncating") {
    val h2 = build(values.map(("a", _)).toDF("g", "v"),
      Seq(col("g")), col("v"), Seq(10.0, 20.0))
    val h3 = build(values.map(("b", _)).toDF("g", "v"),
      Seq(col("g")), col("v"), Seq(10.0, 20.0, 30.0))
    val pair = h2.select(col("hist").as("ha"))
      .crossJoin(h3.select(col("hist").as("hb")))
    val addErr = intercept[Exception] {
      pair.select(histAdd(col("ha"), col("hb")).as("h"))
        .select(col("h.counts")).collect()
    }
    assert(addErr.getMessage.contains("incompatible bucket layouts") ||
      Option(addErr.getCause).exists(_.getMessage.contains("incompatible bucket layouts")))
    val mixed = h2.unionByName(h3)
    val mergeErr = intercept[Exception] {
      merge(mixed, Seq(lit("all").as("g")), nBoundaries = 2)
        .select(col("hist.counts")).collect()
    }
    assert(mergeErr.getMessage.contains("incompatible bucket layouts") ||
      Option(mergeErr.getCause).exists(_.getMessage.contains("incompatible bucket layouts")))
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
