package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Matcher, Series}

/** The queryable TSDB relation — reference entry point 2 (SURVEY.md §3.2;
  * hello.go:513-538): ScanTable → Filter(time ∧ matchers) →
  * Project(DynCol("labels"), time, value) → regroup into series.
  *
  * Everything is declarative DataFrame API, so Catalyst does what FrostDB
  * did for the reference and more: equality matchers + the time range
  * push to the parquet scan (row-group pruning against the write-time
  * sort order), label columns not projected are never read (column
  * pruning ≡ DynCol projection), regex evaluates post-scan in codegen
  * (same placement as FrostDB's in-engine regex). The regroup is the one
  * shuffle — keyed on the full label set, partial-aggregated map-side.
  */
final case class TsdbTable(df: DataFrame) {
  import TsdbSchema._

  /** The reference's exact query shape (hello.go:518-530):
    * time ∈ (start, end) EXCLUSIVE ∧ all matchers, projected to
    * (every labels.* column, time, value). */
  def select(start: Long, end: Long, matchers: Seq[Matcher]): DataFrame = {
    val pred = MatcherCompiler.timeRange(start, end) &&
      MatcherCompiler.compileAll(matchers, knownLabels) &&
      partitionPrune(matchers)
    df.where(pred)
      .select(dynCols(df) :+ col(TimeCol) :+ col(ValueCol): _*)
  }

  /** UNION of several matcher sets over ONE scan (the API's repeated
    * `match[]` parameter — Prometheus unions the selectors): the sets
    * compile to an OR of conjunctions, which still reaches the parquet
    * scan (Or filters push down), so a multi-selector metadata query
    * costs one pruned pass, never |selectors| scans. */
  def selectAny(start: Long, end: Long,
                selectors: Seq[Seq[Matcher]]): DataFrame = {
    require(selectors.nonEmpty, "selectAny needs at least one matcher set")
    val anyOf = selectors
      .map(MatcherCompiler.compileAll(_, knownLabels)).reduce(_ || _)
    val prune = selectors.map(partitionPrune).reduce(_ || _)
    df.where(MatcherCompiler.timeRange(start, end) && anyOf && prune)
      .select(dynCols(df) :+ col(TimeCol) :+ col(ValueCol): _*)
  }

  /** Matchers only (no time bounds) — the `Select(MinInt64, MaxInt64, …)`
    * full-range form (hello.go:442-447). */
  def select(matchers: Seq[Matcher]): DataFrame =
    df.where(MatcherCompiler.compileAll(matchers, knownLabels) &&
        partitionPrune(matchers))
      .select(dynCols(df) :+ col(TimeCol) :+ col(ValueCol): _*)

  /** Metric-partitioned layout support (TsdbIngest.writePartitionedByMetric):
    * an equality matcher on `__name__` is duplicated onto the `__metric`
    * partition directory column, so Catalyst turns it into a
    * PartitionFilter — whole directories are skipped at planning, the
    * row-level matcher semantics are untouched. */
  private def partitionPrune(matchers: Seq[Matcher]): Column =
    if (!df.columns.contains("__metric")) lit(true)
    else matchers.collect {
      case Matcher.Eq("__name__", v) if v.nonEmpty => col("__metric") === lit(v)
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Label names with a materialized column in this table. */
  def knownLabels: Set[String] =
    labelColumns(df).map(_.stripPrefix(LabelPrefix)).toSet

  /** Series regrouping (A1/A2/R1/R3, hello.go:319-428): group rows by the
    * full label set, collect (time, value) sorted by time. One global
    * shuffle subsumes the reference's client-side per-batch hash-group +
    * 2-way sorted merge (A2/R1) — groupBy is already global. Duplicate
    * timestamps are KEPT (the reference merge never dedups,
    * hello.go:380-418); `sort_array` on (time, value) structs gives a
    * deterministic total order where the reference's was arrival-biased.
    * Null and EMPTY-STRING label values are dropped from the label set
    * (hello.go:339-349 — `label="" ≡ absent`, Prometheus semantics). */
  def regroup(selected: DataFrame): Dataset[Series] = {
    val spark = selected.sparkSession
    import spark.implicits._
    val labels = labelColumns(selected)
    // Group by the DECODED label set: empty-string values are dropped
    // before hashing in the reference (hello.go:339-352), so "" and NULL
    // must land in the SAME group — normalize with nullif first.
    val normalized = labels.map(c => nullif(col(s"`$c`"), lit("")).as(c))
    val pairs = labels.flatMap { c =>
      Seq(lit(c.stripPrefix(LabelPrefix)), col(s"`$c`"))
    }
    selected
      .select(normalized :+ col(TimeCol) :+ col(ValueCol): _*)
      .groupBy(labels.map(c => col(s"`$c`")): _*)
      .agg(sort_array(collect_list(struct(col(TimeCol), col(ValueCol)))).as("tv"))
      .select(
        map_filter(
          map(pairs: _*),
          (_, v) => v.isNotNull
        ).as("labels"),
        col("tv.time").as("ts"),
        col("tv.value").as("v"))
      .as[Series]
  }

  def series(start: Long, end: Long, matchers: Seq[Matcher]): Dataset[Series] =
    regroup(select(start, end, matchers))
}

object TsdbTable {
  def load(spark: SparkSession, path: String): TsdbTable =
    TsdbTable(TsdbIngest.read(spark, path))
}
