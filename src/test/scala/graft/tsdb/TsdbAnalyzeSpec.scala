package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `promtool tsdb analyze` analog: per-block cardinality sections
  * (metric / label / pair) with exact hand-computed expectations over
  * a tiny engine-written block — including the chunk column the SQL
  * oracle (`tsdb_q163_block_analyze`) cannot see. */
class TsdbAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  test("analyze sections: series, samples, label cardinality, chunks") {
    val long = Seq(
      (1000L, 1.0, Map("__name__" -> "up", "job" -> "a")),
      (2000L, 2.0, Map("__name__" -> "up", "job" -> "a")),
      (3000L, 3.0, Map("__name__" -> "up", "job" -> "b")),
      (4000L, 4.0, Map("__name__" -> "lat", "job" -> "a", "le" -> "1")))
      .toDF("time", "value", "labels")
    val db = graft.queries.Tables.scratchDir("graft_analyze_db")
    val dirs = graft.sources.tsdbblock.TsdbBlockWriter.write(
      long, db, blockRangeMs = 7200000L)
    assert(dirs.size == 1)
    val a = TsdbAnalyze.analyze(spark, s"$db/${dirs.head}")
    def section(s: String): Map[String, (Long, Long, Long, Long)] =
      a.where(col("section") === s)
        .select(col("key"), col("n_series"), col("n_values"),
          col("n_samples"), col("n_chunks"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // metric: up has 2 series / 3 samples, lat 1 series / 1 sample;
    // each series lands in one chunk at this size
    assert(section("metric") == Map(
      "up" -> ((2L, 0L, 3L, 2L)), "lat" -> ((1L, 0L, 1L, 1L))))
    // label: __name__ on all 3 series with 2 distinct values; job on 3
    // with 2 values; le on 1 series with 1 value
    assert(section("label") == Map(
      "__name__" -> ((3L, 2L, 0L, 0L)), "job" -> ((3L, 2L, 0L, 0L)),
      "le" -> ((1L, 1L, 0L, 0L))))
    // pair: the most-common-label-pairs section
    assert(section("pair") == Map(
      "__name__=up" -> ((2L, 0L, 0L, 0L)),
      "__name__=lat" -> ((1L, 0L, 0L, 0L)),
      "job=a" -> ((2L, 0L, 0L, 0L)),
      "job=b" -> ((1L, 0L, 0L, 0L)),
      "le=1" -> ((1L, 0L, 0L, 0L))))
  }
}
