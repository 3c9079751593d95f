package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL vector set operators (`and` / `or` / `unless`) and the classic
  * `histogram_quantile` over `le`-labeled cumulative bucket series — the
  * remaining binary/aggregation surface of the PromQL layer the reference
  * was building toward (README.md:125 "making querier generic"; the
  * reference itself never reached any PromQL operator).
  *
  * Scale shape: an instant vector has one row per SERIES (not per
  * sample), so the right-hand side of `and`/`unless` is series-cardinality
  * data — broadcastable in any realistic deployment (millions of series ≪
  * sample volume). The joins below broadcast the right side explicitly;
  * `or`'s union is map-side over the two vectors.
  */
object VectorOps {

  private def onCols(on: Seq[String]): Seq[String] =
    on.map(TsdbSchema.labelColName)

  private def keyCols(on: Seq[String]): Seq[Column] =
    onCols(on).map(c => col(s"`$c`"))

  /** `left and right` — series of `left` whose `on(...)` label values
    * also appear in `right`; values come from `left` (PromQL filter
    * semantics). Left-semi broadcast join: no shuffle of the left. */
  def vectorAnd(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(broadcast(right.select(keyCols(on): _*).distinct()),
      onCols(on), "left_semi")

  /** `left unless right` — series of `left` with NO `on(...)` match in
    * `right`. Left-anti broadcast join. */
  def vectorUnless(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(broadcast(right.select(keyCols(on): _*).distinct()),
      onCols(on), "left_anti")

  /** `left or right` — all series of `left`, plus the series of `right`
    * whose `on(...)` labels have no match in `left`. Columns are aligned
    * by name (both sides must be instant vectors over the same wide
    * schema). */
  def vectorOr(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame = {
    val rightOnly = right.join(
      broadcast(left.select(keyCols(on): _*).distinct()), onCols(on), "left_anti")
    left.unionByName(rightOnly.select(left.columns.map(c => col(s"`$c`")): _*))
  }

  /** PromQL `histogram_quantile(q, buckets)` over an instant vector of
    * cumulative `le` bucket series (the classic Prometheus histogram:
    * one series per upper bound, counts cumulative, `le = +Inf` = total).
    *
    * Input: one row per (`groupCols`, `le`) with cumulative count `cum`.
    * Per group: rank = q·total (total = the +Inf bucket's count); the
    * chosen bucket is the lowest `le` with `cum >= rank`; the result
    * interpolates linearly inside it —
    * `lower + (le - lower)·(rank - cumBelow)/(cum - cumBelow)` with
    * `lower = 0` for the first bucket (Prometheus's bucketQuantile). A
    * rank landing in the +Inf bucket returns the highest finite `le`;
    * a rank landing in a FIRST bucket whose upper bound ≤ 0 returns
    * that bound outright (negative buckets have no known lower edge);
    * q outside [0, 1] returns ∓Inf and NaN propagates — all exactly
    * Prometheus's bucketQuantile edge contract.
    *
    * Execution: every window below shares the same partitioning keys, so
    * Catalyst plans ONE exchange on `groupCols`; with per-series bucket
    * counts already aggregated, the windowed data is |groups|·|les| rows
    * — tiny relative to samples at any scale. */
  def histogramQuantile(buckets: DataFrame, groupCols: Seq[String],
                        q: Double, leCol: String = "le",
                        cumCol: String = "cum"): DataFrame = {
    val gs = groupCols.map(c => col(s"`$c`"))
    val w = Window.partitionBy(gs: _*)
    val le = col(s"`$leCol`")
    val cum = col(s"`$cumCol`").cast("double")
    if (q.isNaN || q < 0 || q > 1) {
      // Prometheus: quantile outside (0,1) short-circuits to ∓Inf (NaN
      // propagates) — one representative row per group, no interpolation
      val v = if (q < 0) Double.NegativeInfinity
        else if (q > 1) Double.PositiveInfinity else Double.NaN
      return buckets
        .withColumn("total", max(cum).over(w))
        .withColumn("_max_le", max(le).over(w))
        .where(le === col("_max_le"))
        .select(gs :+ col("total").cast("long").as("n") :+
          lit(v).as("phi"): _*)
    }
    buckets
      .withColumn("total", max(cum).over(w))
      .withColumn("rank", lit(q) * col("total"))
      .withColumn("chosen_le", min(when(cum >= col("rank"), le)).over(w))
      .withColumn("max_finite_le",
        max(when(!le.isin(Double.PositiveInfinity), le)).over(w))
      .withColumn("cum_below",
        max(when(le < col("chosen_le"), cum)).over(w))
      .withColumn("le_below",
        max(when(le < col("chosen_le"), le)).over(w))
      .where(le === col("chosen_le"))
      .select(gs :+ col("total").cast("long").as("n") :+
        round(
          when(col("chosen_le") === Double.PositiveInfinity, col("max_finite_le"))
            // first bucket with non-positive upper bound: the bound IS
            // the answer (no zero lower edge to interpolate from)
            .when(col("le_below").isNull && col("chosen_le") <= 0.0,
              col("chosen_le"))
            .otherwise(
              coalesce(col("le_below"), lit(0.0)) +
                (col("chosen_le") - coalesce(col("le_below"), lit(0.0))) *
                  (col("rank") - coalesce(col("cum_below"), lit(0.0))) /
                  (cum - coalesce(col("cum_below"), lit(0.0)))),
          6).as("phi"): _*)
  }
}
