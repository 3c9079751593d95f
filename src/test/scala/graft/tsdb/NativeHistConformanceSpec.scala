package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conformance sweep for the NATIVE-HISTOGRAM PromQL tier using
  * promqltest-style histogram literals — the `{{schema:0 count:7
  * sum:12 z_bucket:1 offset:0 buckets:[2 3 1]}}` syntax Prometheus's
  * own test corpus loads native-histogram series with. Literals are
  * parsed here, landed on the engine's dense exponential grid (the
  * [[graft.tsdb.RemoteWrite.denseFromSparse]] index mapping), and the
  * queries run through [[PromQLHist.eval]] — the same text front end
  * as the float tier.
  *
  * Bucket-index convention (the prompb/native one the engine uses
  * throughout): sparse index i covers `(base^(i−1), base^i]` with
  * `base = 2^(2^−schema)`; `offset` is the index of the FIRST bucket
  * in `buckets`, consecutive after that.
  */
class NativeHistConformanceSpec extends SparkSpec {

  // grid every case lands on: schema 0, les = [0, 1, 2, 4, 8, +Inf]
  private val Schema = 0
  private val MinExp = 0
  private val MaxExp = 3
  private val Les: Seq[Double] =
    (0.0 +: NativeHistogram.exponentialLes(Schema, MinExp, MaxExp)) :+
      Double.PositiveInfinity

  private case class HL(count: Double, sum: Double, zBucket: Double,
                        offset: Int, buckets: Seq[Double])

  /** `{{schema:0 count:7 sum:12 z_bucket:1 offset:0 buckets:[2 3 1]}}` */
  private def parseLiteral(s: String): HL = {
    def num(field: String): Option[Double] =
      (field + """:(-?\d+(?:\.\d+)?)""").r.findFirstMatchIn(s)
        .map(_.group(1).toDouble)
    val buckets = """buckets:\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1).trim.split("\\s+").toSeq.filter(_.nonEmpty)
        .map(_.toDouble)).getOrElse(Nil)
    require(num("schema").forall(_ == Schema),
      s"this sweep's grid is schema $Schema only")
    HL(num("count").getOrElse(buckets.sum + num("z_bucket").getOrElse(0.0)),
      num("sum").getOrElse(0.0), num("z_bucket").getOrElse(0.0),
      num("offset").map(_.toInt).getOrElse(0), buckets)
  }

  /** Sparse literal → the dense grid counts (denseFromSparse mapping:
    * index i ≤ MinExp → position 1, i ∈ (MinExp, MaxExp] →
    * i − MinExp + 1, i > MaxExp → the +Inf tail; z_bucket → 0). */
  private def denseCounts(h: HL): Seq[Double] = {
    val out = Array.fill(Les.size)(0.0)
    out(0) = h.zBucket
    h.buckets.zipWithIndex.foreach { case (c, j) =>
      val i = h.offset + j
      val p = if (i <= MinExp) 1
        else if (i <= MaxExp) i - MinExp + 1
        else Les.size - 1
      out(p) += c
    }
    out.toSeq
  }

  /** One series line: `h{case="a"} {{...}} {{...}}` — slot k at
    * time k·stepMs. */
  private def frame(stepMs: Long, lines: Seq[String]): DataFrame = {
    val litRe = """\{\{[^}]*\}\}""".r
    val rows = lines.flatMap { line =>
      val sel = line.substring(0, line.indexOf('}') + 1)
      val name = "^[a-zA-Z_:][a-zA-Z0-9_:]*".r.findFirstIn(sel.trim)
      val labels = """([a-zA-Z_][a-zA-Z0-9_]*)="([^"]*)"""".r
        .findAllMatchIn(sel).map(m => m.group(1) -> m.group(2)).toMap ++
        name.map("__name__" -> _)
      litRe.findAllIn(line.substring(sel.length)).toSeq.zipWithIndex.map {
        case (tok, slot) =>
          val h = parseLiteral(tok)
          Row(slot * stepMs, labels.get("__name__").orNull,
            labels.get("case").orNull, h.count, h.sum,
            denseCounts(h))
      }
    }
    val schema = StructType(Seq(
      StructField("time", LongType, nullable = false),
      StructField("labels.__name__", StringType),
      StructField("labels.case", StringType),
      StructField("cnt", DoubleType), StructField("sm", DoubleType),
      StructField("counts", ArrayType(DoubleType))))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toList, 2), schema)
      .select(col("time"), col("`labels.__name__`"), col("`labels.case`"),
        struct(col("cnt").as("count"), col("sm").as("sum"),
          array(Les.map(lit(_)): _*).as("les"),
          col("counts").as("counts")).as("hist"))
  }

  private val load = frame(300000L, Seq(
    """h{case="a"} {{schema:0 count:7 sum:12 z_bucket:1 offset:0 buckets:[2 3 1]}}""",
    """h{case="b"} {{schema:0 count:4 sum:10 offset:1 buckets:[4]}}"""))

  private def run(q: String): Map[String, Double] =
    PromQLHist.eval(PromQL.parse(q), load, at = 60000L,
        lookbackMs = 300000L, start = 0L, end = 60000L,
        nLes = Les.size)
      .collect().map { r =>
        val cols = r.schema.fieldNames
        val key = cols.indexOf("labels.case") match {
          case -1 => ""
          case i => Option(r.get(i)).map(_.toString).getOrElse("")
        }
        key -> r.getDouble(cols.indexOf("value"))
      }.toMap

  private def near(got: Double, want: Double): Boolean =
    math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want))

  test("histogram_count / _sum / _avg over literal-loaded series") {
    assert(run("histogram_count(h)") === Map("a" -> 7.0, "b" -> 4.0))
    assert(run("histogram_sum(h)") === Map("a" -> 12.0, "b" -> 10.0))
    val avg = run("histogram_avg(h)")
    assert(near(avg("a"), 12.0 / 7) && near(avg("b"), 2.5))
  }

  test("histogram_quantile interpolates on the exponential grid") {
    val q = run("histogram_quantile(0.5, h)")
    // a: cum [1, 3, 6, 7, 7]; rank 3.5 lands in (1,2] → 1 + 0.5/3
    assert(near(q("a"), 1.0 + 0.5 / 3))
    // b: all mass in (1,2]; rank 2 → 1 + 2/4
    assert(near(q("b"), 1.5))
  }

  test("histogram_fraction is edge-exact on bucket boundaries") {
    val f = run("histogram_fraction(1, 2, h)")
    assert(near(f("a"), 3.0 / 7) && near(f("b"), 1.0))
  }

  test("sum-merge then scalar: histogram_count(sum(h))") {
    val m = run("histogram_count(sum(h))")
    assert(m.values.toSeq === Seq(11.0))
  }

  test("selector matchers apply to literal series") {
    assert(run("""histogram_count(h{case="b"})""") === Map("b" -> 4.0))
  }

  // ---- arithmetic + over-time forms (promqltest histograms.test
  // shapes: `hist_a + hist_b`, scalar scaling, range folds) ----------

  // two METRICS sharing the `case` label — default matching pairs them
  // per case, the metric name excluded
  private val pair = frame(300000L, Seq(
    """ha{case="x"} {{schema:0 count:7 sum:12 z_bucket:1 offset:0 buckets:[2 3 1]}}""",
    """hb{case="x"} {{schema:0 count:4 sum:10 offset:1 buckets:[4]}}"""))

  private def runOn(f: DataFrame, q: String): Map[String, Double] =
    PromQLHist.eval(PromQL.parse(q), f, at = 60000L,
        lookbackMs = 300000L, start = 0L, end = 60000L, nLes = Les.size)
      .collect().map { r =>
        val cols = r.schema.fieldNames
        val key = cols.indexOf("labels.case") match {
          case -1 => cols.indexOf("case") match {
            case -1 => ""
            case i => Option(r.get(i)).map(_.toString).getOrElse("")
          }
          case i => Option(r.get(i)).map(_.toString).getOrElse("")
        }
        key -> r.getDouble(cols.indexOf("value"))
      }.toMap

  test("hist + hist / hist - hist under default matching (literals)") {
    assert(runOn(pair, "histogram_count(ha + hb)") === Map("x" -> 11.0))
    assert(runOn(pair, "histogram_sum(ha + hb)") === Map("x" -> 22.0))
    assert(runOn(pair, "histogram_count(ha - hb)") === Map("x" -> 3.0))
    assert(runOn(pair, "histogram_sum(ha - hb)") === Map("x" -> 2.0))
    // merged dense counts [1,2,7,1,0,0], count 11 → rank 5.5 lands in
    // (1,2] after cum 3 → 1 + 2.5/7
    val q = runOn(pair, "histogram_quantile(0.5, ha + hb)")
    assert(near(q("x"), 1.0 + 2.5 / 7))
  }

  test("hist × scalar / hist ÷ scalar (literals)") {
    assert(run("histogram_count(h * 2)") === Map("a" -> 14.0, "b" -> 8.0))
    assert(run("histogram_sum(h / 2)") === Map("a" -> 6.0, "b" -> 5.0))
    assert(run("histogram_count(2 * h)") === Map("a" -> 14.0, "b" -> 8.0))
  }

  test("sum/avg/last_over_time fold literal snapshot series") {
    // two snapshots of one series (slots 0 and 1 → t = 0, 300000)
    val series = frame(300000L, Seq(
      """hs{case="a"} {{schema:0 count:2 sum:2 offset:1 buckets:[2]}} {{schema:0 count:4 sum:5 offset:1 buckets:[4]}}"""))
    def fold(q: String): Map[String, Double] =
      PromQLHist.eval(PromQL.parse(q), series, at = 600000L,
          lookbackMs = 300000L, start = -1L, end = 600000L,
          nLes = Les.size)
        .collect().map { r =>
          val cols = r.schema.fieldNames
          Option(r.get(cols.indexOf("labels.case"))).map(_.toString)
            .getOrElse("") -> r.getDouble(cols.indexOf("value"))
        }.toMap
    assert(fold("histogram_count(sum_over_time(hs[10m]))") ===
      Map("a" -> 6.0))
    assert(fold("histogram_sum(sum_over_time(hs[10m]))") ===
      Map("a" -> 7.0))
    assert(fold("histogram_count(avg_over_time(hs[10m]))") ===
      Map("a" -> 3.0))
    assert(fold("histogram_count(last_over_time(hs[10m]))") ===
      Map("a" -> 4.0))
    // gauge delta: last − first (counts 2 → 4, sums 2 → 5)
    assert(fold("histogram_count(delta(hs[10m]))") === Map("a" -> 2.0))
    assert(fold("histogram_sum(delta(hs[10m]))") === Map("a" -> 3.0))
    // count_over_time: snapshots per window, a float vector
    assert(fold("count_over_time(hs[10m])") === Map("a" -> 2.0))
  }

  test("hist ÷ × float-VECTOR matching (promqltest binop forms)") {
    // ha / histogram_count(hb): every additive component ÷ 4, matched
    // per case under default matching (metric name excluded)
    assert(runOn(pair, "histogram_count(ha / histogram_count(hb))") ===
      Map("x" -> 1.75))
    assert(runOn(pair, "histogram_sum(ha / histogram_count(hb))") ===
      Map("x" -> 3.0))
    // the commuted product: 4 × 7
    assert(runOn(pair, "histogram_count(histogram_count(hb) * ha)") ===
      Map("x" -> 28.0))
    // scaling preserves the histogram's SHAPE: the quantile of the
    // scaled histogram equals the original's
    val q0 = runOn(pair, "histogram_quantile(0.5, ha)")
    val q1 = runOn(pair,
      "histogram_quantile(0.5, ha / histogram_count(hb))")
    assert(near(q1("x"), q0("x")), s"$q1 vs $q0")
    // float ÷ hist is not a histogram — loud, as in Prometheus
    intercept[IllegalArgumentException](
      runOn(pair, "histogram_count(hb) / ha"))
  }

  test("histogram-valued subquery inners + limitk (literals)") {
    val series = frame(300000L, Seq(
      """hq{case="a"} {{schema:0 count:2 sum:2 offset:1 buckets:[2]}} {{schema:0 count:4 sum:5 offset:1 buckets:[4]}}"""))
    def fold(q: String): Map[String, Double] =
      PromQLHist.eval(PromQL.parse(q), series, at = 600000L,
          lookbackMs = 600000L, start = -1L, end = 600000L,
          nLes = Les.size)
        .collect().map { r =>
          val cols = r.schema.fieldNames
          Option(r.get(cols.indexOf("labels.case"))).map(_.toString)
            .getOrElse("") -> r.getDouble(cols.indexOf("value"))
        }.toMap
    // hq[10m:5m] @ 600000 → absolute grid points 300000, 600000
    // (left-open); the 10m lookback resolves BOTH to the t=300000
    // snapshot (count 4) — the merge doubles it, last picks one
    assert(fold("histogram_count(sum_over_time(hq[10m:5m]))") ===
      Map("a" -> 8.0))
    assert(fold("histogram_count(last_over_time(hq[10m:5m]))") ===
      Map("a" -> 4.0))
    assert(fold("count_over_time(hq[10m:5m])") === Map("a" -> 2.0))
    // limitk over the two-case literal load: the k FIRST series in
    // label order (case=a sorts first); its histogram is untouched
    assert(run("histogram_count(limitk(1, h))") === Map("a" -> 7.0))
  }
}
