package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL-flavored range-vector aggregates over the wide TSDB table —
  * the query layer the reference was building toward ("Querying Apache
  * Parquet files with PromQL" is its title; the PromQL layer was never
  * reached, README.md:125). Each function evaluates per series over
  * tumbling `stepMs` buckets: one groupBy on (labels, bucket), partial-
  * aggregated map-side, so the shuffle carries one row per
  * (series, bucket) — not per sample.
  *
  * Determinism with duplicate timestamps: first/last are defined by the
  * lexicographic (time, value) order — `min/max` over a 2-element array
  * — which both Spark and the DuckDB oracle total-order identically
  * (time < 2^53, so the double cast is exact).
  */
object RangeVectors {

  /** PromQL instant-vector evaluation: for each series, the most recent
    * sample in the lookback window ending at `at` (Prometheus's staleness
    * rule: a series with no sample in the window drops out of the
    * vector). One partial-aggregated groupBy; with the time-sorted
    * storage layout the scan itself is pruned to the window, so the cost
    * at 100 TB is ∝ one lookback window of data, not history.
    *
    * Duplicate-timestamp ties resolve by lexicographic (time, value) max
    * — same total order as [[overTime]], replayed identically by the
    * oracle. */
  def instant(wide: DataFrame, at: Long, lookbackMs: Long): DataFrame = {
    val labels = TsdbSchema.dynCols(wide)
    val tv: Column = array(col(TsdbSchema.TimeCol).cast("double"), col(TsdbSchema.ValueCol))
    wide
      .where(col(TsdbSchema.TimeCol) > at - lookbackMs &&
        col(TsdbSchema.TimeCol) <= at)
      .groupBy(labels: _*)
      .agg(
        max(col(TsdbSchema.TimeCol)).as("time"),
        max(tv).getItem(1).as("value"))
  }

  /** PromQL `increase()` with counter-reset handling: per series, sum of
    * consecutive-sample deltas where a negative delta (counter reset)
    * contributes the new raw value instead (Prometheus's reset rule).
    * One window pass (lag over series-partitioned, time-ordered rows) +
    * one aggregation — both partial-shuffle-friendly; the window's sort
    * is free on time-sorted storage partitions.
    *
    * Duplicate timestamps: ordered by (time, value) so the lag sequence
    * is a total order both engines replay identically. */
  def increase(wide: DataFrame): DataFrame = {
    val labels = TsdbSchema.dynCols(wide)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(labels: _*)
      .orderBy(col(TsdbSchema.TimeCol).asc, col(TsdbSchema.ValueCol).asc)
    val d = col(TsdbSchema.ValueCol) - lag(col(TsdbSchema.ValueCol), 1).over(w)
    wide
      .withColumn("d",
        when(d.isNull, lit(0.0)) // first sample of a series: no delta
          .when(d < 0, col(TsdbSchema.ValueCol)) // counter reset
          .otherwise(d))
      .groupBy(labels: _*)
      .agg(count(lit(1)).as("n"), round(sum(col("d")), 6).as("increase"))
  }

  /** avg/min/max/count_over_time + delta + rate per (series, bucket). */
  def overTime(wide: DataFrame, stepMs: Long): DataFrame = {
    val labels = TsdbSchema.dynCols(wide)
    val bucket = (floor(col(TsdbSchema.TimeCol) / stepMs.toDouble) * stepMs)
      .cast("long").as("bucket")
    val tv: Column = array(col(TsdbSchema.TimeCol).cast("double"), col(TsdbSchema.ValueCol))
    val firstV = min(tv).getItem(1)
    val lastV = max(tv).getItem(1)
    val spanSec = (max(col(TsdbSchema.TimeCol)) - min(col(TsdbSchema.TimeCol))) / 1000.0
    wide
      .groupBy(labels :+ bucket: _*)
      .agg(
        count(lit(1)).as("n"),
        round(avg(col(TsdbSchema.ValueCol)), 6).as("avg_v"),
        min(col(TsdbSchema.ValueCol)).as("min_v"),
        max(col(TsdbSchema.ValueCol)).as("max_v"),
        round(lastV - firstV, 6).as("delta"),
        // rate ≡ delta / elapsed-seconds within the bucket (simplified:
        // no PromQL boundary extrapolation, no counter-reset handling —
        // gauges/monotone-in-bucket counters only)
        round((lastV - firstV) / nullif(spanSec, lit(0.0)), 6).as("rate"))
  }
}
