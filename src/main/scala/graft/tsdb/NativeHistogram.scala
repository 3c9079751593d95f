package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native-histogram data model + function family
  * (`histogram_count/sum/avg/fraction/quantile` and histogram `sum()`
  * aggregation), the Prometheus feature the reference scopes out
  * (hello.go:490 consumes `ValFloat` only; SURVEY §1.2).
  *
  * A histogram SAMPLE here is one struct value per series —
  * `{count, sum, les, counts}` with `les` the ascending bucket upper
  * bounds (last = +Inf) and `counts` the per-bucket NON-cumulative
  * observation counts — i.e. Prometheus's "native histograms with custom
  * buckets" (NHCB) shape, where a whole histogram travels as one value
  * instead of classic `le`-labeled series. That single-column form is
  * what makes the family cheap at scale: building is ONE map-side
  * partial aggregation over samples, merging (`sum(h)` across series) is
  * ONE aggregation over fixed-width arrays, and every scalar function is
  * a per-row expression over an ~8-element array — no joins, no windows,
  * no shuffle beyond the one the grouping itself requires.
  *
  * Quantile/fraction interpolation follows Prometheus's bucketQuantile
  * contract, bit-matching [[VectorOps.histogramQuantile]] on the same
  * binning: linear inside the chosen bucket, the first bucket's lower
  * bound taken as 0 (non-negative data), a rank landing in the +Inf
  * bucket returning the highest finite bound.
  */
object NativeHistogram {

  /** Build one histogram struct per group from raw sample values: bucket
    * i counts observations in `(les(i-1), les(i)]` (first bucket
    * `(-Inf, les(0)]`, an implicit `+Inf` overflow bucket last). Each
    * bucket count is a `sum(when(...))` — all partial-aggregatable, so
    * the shuffle carries |groups| rows of ~|buckets| doubles, never
    * samples. */
  def build(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
            boundaries: Seq[Double]): DataFrame =
    df.groupBy(groupCols: _*).agg(histAgg(valueCol, boundaries).as("hist"))

  /** Upper bounds for a STANDARD exponential schema (Prometheus native
    * histograms proper, schemas −4..8, as opposed to the custom-bucket
    * NHCB shape the rest of this family takes verbatim): bucket i covers
    * `(base^(i−1), base^i]` with `base = 2^(2^−schema)`, so this returns
    * `les = base^minExp .. base^maxExp` ascending. Computed as
    * `2^(i·2^−schema)` — one exp2 per bound, the same formulation
    * Prometheus uses, exact for schema ≤ 0 (integer powers of two) and
    * a shared deterministic grid for positive schemas. The NHCB kernels
    * (quantile/fraction/stddev/merge/rate) consume the result unchanged:
    * an exponential histogram is just a derived binning. */
  def exponentialLes(schema: Int, minExp: Int, maxExp: Int): Seq[Double] = {
    require(schema >= -4 && schema <= 8,
      s"standard schemas are -4..8 (factor 2^(2^-schema)): $schema")
    require(minExp <= maxExp, s"empty bucket range: $minExp..$maxExp")
    val invScale = math.pow(2.0, -schema) // 2^-schema, exact
    (minExp to maxExp).map(i => math.pow(2.0, i * invScale))
  }

  /** [[build]] over schema-derived exponential boundaries. A `0.0`
    * boundary is prepended — Prometheus's ZERO BUCKET — so non-positive
    * observations get their own bucket and every exponential bucket
    * keeps strictly positive width (interpolation stays well-defined).
    * Merge compatibility across frames reduces to equal (schema,
    * minExp, maxExp), which [[merge]]/[[histAdd]] enforce by layout
    * size. */
  def buildExp(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
               schema: Int, minExp: Int, maxExp: Int): DataFrame =
    build(df, groupCols, valueCol,
      0.0 +: exponentialLes(schema, minExp, maxExp))

  /** The histogram as a raw AGGREGATE EXPRESSION, usable under any
    * grouping — batch groupBy above, or a watermarked streaming window
    * ([[graft.streaming.EventStreams.histogramRule]]): every component
    * (count/sum/conditional bucket sums) partial-aggregates, which is
    * also exactly what incremental streaming state needs. */
  def histAgg(valueCol: Column, boundaries: Seq[Double]): Column = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      s"boundaries must be ascending: $boundaries")
    val les = boundaries :+ Double.PositiveInfinity
    val bucketCounts = les.zipWithIndex.map { case (le, i) =>
      val lower = if (i == 0) Double.NegativeInfinity else les(i - 1)
      sum(when(valueCol > lower && valueCol <= le, 1.0).otherwise(0.0))
    }
    struct(
      count(lit(1)).cast("double").as("count"),
      sum(valueCol).as("sum"),
      array(les.map(lit(_)): _*).as("les"),
      array(bucketCounts: _*).as("counts"))
  }

  /** PromQL vector `sum(h)` — merge histograms across series (same
    * boundary layout, enforced by the builder). One aggregation:
    * counts merge element-wise via per-index sums, so partial (map-side)
    * aggregation applies and the exchange carries merged structs only.
    * Layout compatibility is CHECKED per group (a cheap min/max over
    * `size(les)` — two more partial-aggregatable scalars): summing
    * counts positionally across different binnings would silently
    * produce wrong buckets. Same-size layouts with different bounds
    * remain the caller's contract (checking contents would mean
    * shuffling the arrays themselves). */
  def merge(df: DataFrame, groupCols: Seq[Column], nBoundaries: Int,
            h: Column = col("hist")): DataFrame = {
    val les = h.getField("les")
    val mergedCounts = (0 to nBoundaries).map(i =>
      sum(element_at(h.getField("counts"), i + 1)))
    val layoutOk = assert_true(min(size(les)) === max(size(les)),
      lit("NativeHistogram.merge: incompatible bucket layouts in group"))
    // the guard rides on les AND counts — the two fields whose positional
    // meaning a layout mismatch corrupts (count/sum stay well-defined
    // regardless); nested-schema pruning keeps it free when neither is read
    df.groupBy(groupCols: _*).agg(
      struct(
        sum(h.getField("count")).as("count"),
        sum(h.getField("sum")).as("sum"),
        when(layoutOk.isNull, first(les)).as("les"),
        when(layoutOk.isNull, array(mergedCounts: _*)).as("counts")).as("hist"))
  }

  /** Pairwise histogram addition (same boundary layout — CHECKED by
    * bucket-array size, since `zip_with` would silently truncate to the
    * shorter counts array; equal-size different-bounds layouts remain
    * the caller's contract): the kernel under windowed-rate composition
    * — merging two window histograms of one series is a per-row
    * `zip_with`, no aggregation at all. */
  def histAdd(a: Column, b: Column): Column = {
    val layoutOk = assert_true(
      size(a.getField("les")) === size(b.getField("les")),
      lit("NativeHistogram.histAdd: incompatible bucket layouts"))
    struct(
      (a.getField("count") + b.getField("count")).as("count"),
      (a.getField("sum") + b.getField("sum")).as("sum"),
      when(layoutOk.isNull, a.getField("les")).as("les"),
      when(layoutOk.isNull,
        zip_with(a.getField("counts"), b.getField("counts"),
          (x, y) => x + y)).as("counts"))
  }

  /** Turn per-window OBSERVATION histograms into a CUMULATIVE COUNTER
    * histogram series — the shape a Prometheus scrape exposes (each
    * scrape reports totals since process start), and what
    * [[PromQLHist]]'s `rate()`/`increase()` consume with counter
    * semantics (monotone by construction, so resets never fire). One
    * running-window pass per series: count, sum and each of the `nLes`
    * bucket counts accumulate element-wise (static per-index unroll —
    * no array shuffling). */
  def cumulate(df: DataFrame, partitionCols: Seq[Column], orderCol: Column,
               nLes: Int, h: Column = col("hist")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols: _*).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cumCounts = (1 to nLes).map(i =>
      sum(element_at(h.getField("counts"), i)).over(w))
    df.withColumn("hist", struct(
      sum(h.getField("count")).over(w).as("count"),
      sum(h.getField("sum")).over(w).as("sum"),
      h.getField("les").as("les"),
      array(cumCounts: _*).as("counts")))
  }

  /** `histogram_count(h)` — observation count. */
  def histCount(h: Column): Column = h.getField("count")

  /** `histogram_sum(h)` — sum of observations. */
  def histSum(h: Column): Column = h.getField("sum")

  /** `histogram_avg(h)` — mean observation. */
  def histAvg(h: Column): Column = h.getField("sum") / h.getField("count")

  /** Buckets as `array<struct<lower, le, c>>` with explicit lower
    * bounds (first = 0, the non-negative-data contract). */
  private def buckets(h: Column): Column = {
    val les = h.getField("les")
    val counts = h.getField("counts")
    val idx = sequence(lit(0), size(les) - 1)
    transform(idx, i => struct(
      when(i === 0, lit(0.0)).otherwise(element_at(les, i)).as("lower"),
      element_at(les, i + 1).as("le"),
      element_at(counts, i + 1).as("c")))
  }

  /** Interpolated count of observations ≤ x: full buckets below x, plus
    * the straddling bucket's count scaled linearly by how far x sits
    * inside it. A finite x inside the +Inf bucket contributes none of
    * that bucket (no width to interpolate over — Prometheus returns the
    * same shape). */
  def cumAt(h: Column, x: Column): Column =
    aggregate(buckets(h), lit(0.0), (acc, b) => {
      val lower = b.getField("lower"); val le = b.getField("le")
      val c = b.getField("c")
      acc + when(le <= x, c)
        .when(lower >= x, lit(0.0))
        .when(le === lit(Double.PositiveInfinity), lit(0.0))
        .otherwise(c * (x - lower) / (le - lower))
    })

  /** `histogram_fraction(lo, hi, h)` — interpolated fraction of
    * observations in `(lo, hi]`. Exact when lo/hi sit on bucket
    * boundaries; linearly interpolated inside straddled buckets. */
  def histFraction(h: Column, lo: Column, hi: Column): Column =
    (cumAt(h, hi) - cumAt(h, lo)) / h.getField("count")

  /** `histogram_stdvar(h)` — the bucket-geometry variance ESTIMATE
    * (Prometheus semantics: observations are not retained, so each
    * bucket's mass sits at its midpoint `(lower+le)/2`; the +Inf
    * bucket's at its lower bound). Mean is the exact `sum/count`. */
  def histStdvar(h: Column): Column = {
    val mean = histAvg(h)
    val acc = aggregate(buckets(h), lit(0.0), (a, b) => {
      val mid = when(b.getField("le") === lit(Double.PositiveInfinity),
        b.getField("lower"))
        .otherwise((b.getField("lower") + b.getField("le")) / 2)
      val d = mid - mean
      a + b.getField("c") * d * d
    })
    acc / h.getField("count")
  }

  /** `histogram_stddev(h)` — √[[histStdvar]]. */
  def histStddev(h: Column): Column = sqrt(histStdvar(h))

  /** `histogram_quantile(q, h)` over ONE histogram value: a single
    * left-to-right fold over the bucket array (codegen-free HOF, but
    * over ≤ a few dozen elements per row — negligible next to the scan).
    * Matches [[VectorOps.histogramQuantile]]'s classic-bucket math.
    * Edge contract per Prometheus bucketQuantile: q<0 → -Inf, q>1 →
    * +Inf; zero-count buckets are skipped before interpolating, so a
    * rank of 0 (q=0) lands at the lower bound of the first NON-empty
    * bucket instead of dividing 0/0. */
  def histQuantile(h: Column, q: Double): Column = {
    if (q < 0) return lit(Double.NegativeInfinity)
    if (q > 1) return lit(Double.PositiveInfinity)
    val rank = lit(q) * h.getField("count")
    val zero = struct(lit(0.0).as("cum"), lit(null).cast("double").as("res"))
    aggregate(buckets(h), zero, (acc, b) => {
      val cum0 = acc.getField("cum"); val res0 = acc.getField("res")
      val lower = b.getField("lower"); val le = b.getField("le")
      val c = b.getField("c")
      val cum1 = cum0 + c
      val res1 = when(res0.isNotNull, res0)
        .when(cum1 >= rank && c > 0,
          when(le === lit(Double.PositiveInfinity), lower)
            .otherwise(lower + (le - lower) * (rank - cum0) / c))
        .otherwise(lit(null).cast("double"))
      struct(cum1.as("cum"), res1.as("res"))
    }, acc => acc.getField("res"))
  }
}
