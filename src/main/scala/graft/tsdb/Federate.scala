package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Matcher

/** The `/federate` endpoint — Prometheus's hierarchy-scaling surface: a
  * downstream server scrapes an upstream's CURRENT samples of the
  * series matching the repeated `match[]` selectors, in text exposition
  * format. Semantically it is the instant vector at the scrape time
  * (newest in-lookback sample per matched series) rendered as
  * exposition lines — so this composes the pieces the engine already
  * verifies: [[TsdbTable.selectAny]] (repeated-selector union, one
  * OR-combined pruned scan), [[RangeVectors.instant]] (latest-in-
  * lookback with the staleness rule), and
  * [[SampleReaders.toOpenMetricsLines]] (the deterministic exporter the
  * parser round-trips under the oracle).
  *
  * Scale shape: one pruned scan + one partial-agg groupBy (the instant
  * kernel) + a map-side render — the response is bounded by matched
  * SERIES count, never sample count. (Reference adjacency: hello.go's
  * commented federation goal, README.md:125's "query across blocks".)
  */
object Federate {

  /** Exposition lines for the newest in-lookback sample of every series
    * matching ANY of `selectors`, at scrape instant `at`. The table's
    * metric-name label (`labels.name`) renders as the metric name;
    * every other non-absent label renders inside the braces, keys
    * sorted (deterministic output, as the exporter contract).
    *
    * `externalLabels` reproduce Prometheus's federation contract: each
    * configured external label is added to every exported series that
    * does NOT already carry that label name — the series' own value
    * always wins (the hierarchical-federation dedup mechanism). */
  def federate(t: TsdbTable, selectors: Seq[Seq[Matcher]],
               at: Long, lookbackMs: Long,
               externalLabels: Seq[(String, String)] = Nil): DataFrame = {
    val slice = t.selectAny(Long.MinValue, Long.MaxValue, selectors)
    val iv = RangeVectors.instant(slice, at, lookbackMs)
    val lf = longForm(iv)
    val withExt =
      if (externalLabels.isEmpty) lf
      else {
        val ext = map(externalLabels.flatMap { case (k, v) =>
          Seq(lit(k), lit(v)) }: _*)
        lf.withColumn("labels", map_concat(
          map_filter(ext, (k, _) => !map_contains_key(col("labels"), k)),
          col("labels")))
      }
    SampleReaders.toOpenMetricsLines(withExt)
  }

  /** Wide instant-vector rows → the long `(time, value, labels MAP)`
    * form the exporter consumes: `labels.name` becomes `__name__`,
    * absent (NULL or `""`) labels drop out of the map. */
  private[tsdb] def longForm(iv: DataFrame): DataFrame = {
    val labelCols = TsdbSchema.labelColumns(iv)
    val entries = labelCols.map { c =>
      val key = c.stripPrefix(TsdbSchema.LabelPrefix) match {
        case "name" => "__name__"
        case other  => other
      }
      struct(lit(key).as("key"), nullif(col(s"`$c`"), lit("")).as("value"))
    }
    iv.select(
      col("time"), col("value"),
      map_from_entries(filter(array(entries: _*),
        e => e.getField("value").isNotNull)).as("labels"))
  }
}
