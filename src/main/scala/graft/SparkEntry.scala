package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Matcher
import graft.queries.{PipelineQueries, RelationalQueries, Tables, TsdbQueries}
import graft.tsdb.TsdbTable

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families:
  *   tsdb_*  — reference-parity surface (SURVEY §2.6 Q1-Q5) over `events`
  *             viewed as the wide dynamic-column TSDB table;
  *   rel_*   — relational operator classes (joins, windows, rollup, set
  *             ops, top-k, as-of) over the star schema;
  *   pipe_*  — training-data pipeline operators (dedup, minhash/simhash,
  *             text analysis, ANN similarity, multimodal);
  *   stream_* — Structured Streaming surface driven to completion.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's hard-coded query shape (hello.go:514-530) — time
    * range (exclusive) ∧ equality matchers → series regroup. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val t = TsdbTable(Tables.eventsAsTsdb(spark, dir))
    t.regroup(t.select(Tables.RangeStart, Tables.RangeEnd,
      Seq(Matcher.Eq("name", "purchase")))).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsdbQueries.queries ++ RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (LSH-ANN internals, streaming,
    * multimodal) get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    TsdbQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles
}
