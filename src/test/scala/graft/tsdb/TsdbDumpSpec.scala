package graft.tsdb

import graft.SparkSpec
import graft.model.Matcher
import org.apache.spark.sql.functions._

/** `promtool tsdb dump` analog: data dir (blocks + WAL head) →
  * OpenMetrics text, with promtool's flags — `--match` selectors,
  * `--min-time` inclusive, `--max-time` exclusive. The FULL-dump
  * identity (`parse(dump(db)) ≡ source`) is oracle-pinned as
  * `tsdb_q154_tsdb_dump`; this spec covers the flags. */
class TsdbDumpSpec extends SparkSpec {
  import spark.implicits._

  private def mkDb(): String = {
    val long = Seq(
      (1000L, 1.0, Map("__name__" -> "up", "job" -> "a")),
      (2000L, 2.0, Map("__name__" -> "up", "job" -> "a")),
      (3000L, 3.0, Map("__name__" -> "up", "job" -> "b")),
      (4000L, 4.0, Map("__name__" -> "lat", "job" -> "a")))
      .toDF("time", "value", "labels")
    val db = graft.queries.Tables.scratchDir("graft_dump_db")
    // blocks for the old range, WAL head for the newest sample —
    // the live-shaped data dir the reference opens read-only
    graft.sources.tsdbblock.TsdbBlockWriter.write(
      long.where(col("time") < 4000L), db, blockRangeMs = 7200000L)
    graft.sources.tsdbblock.TsdbWalWriter.write(
      long.where(col("time") >= 4000L), s"$db/wal")
    db
  }

  private def parsed(lines: org.apache.spark.sql.DataFrame)
      : Set[(Long, Double, String, String)] =
    SampleReaders.fromOpenMetricsLines(lines)
      .select(col("time"), col("value"),
        col("labels").getItem("__name__").as("n"),
        col("labels").getItem("job").as("j"))
      .as[(Long, Double, String, String)].collect().toSet

  test("full dump covers blocks AND the WAL head") {
    val db = mkDb()
    assert(parsed(TsdbDump.dumpOpenMetrics(spark, db)) === Set(
      (1000L, 1.0, "up", "a"), (2000L, 2.0, "up", "a"),
      (3000L, 3.0, "up", "b"), (4000L, 4.0, "lat", "a")))
  }

  test("min-time inclusive, max-time exclusive, matchers select") {
    val db = mkDb()
    // [2000, 4000): 2000 in, 4000 out — promtool's bounds
    assert(parsed(TsdbDump.dumpOpenMetrics(spark, db,
      minTime = 2000L, maxTime = 4000L)) === Set(
      (2000L, 2.0, "up", "a"), (3000L, 3.0, "up", "b")))
    // --match {job="a"} picks both metrics of that job
    assert(parsed(TsdbDump.dumpOpenMetrics(spark, db,
      matchers = Seq(Matcher.Eq("job", "a")))) === Set(
      (1000L, 1.0, "up", "a"), (2000L, 2.0, "up", "a"),
      (4000L, 4.0, "lat", "a")))
    // combined: matcher + window
    assert(parsed(TsdbDump.dumpOpenMetrics(spark, db,
      minTime = 2000L, maxTime = 4000L,
      matchers = Seq(Matcher.Eq("__name__", "up"),
        Matcher.Eq("job", "a")))) === Set((2000L, 2.0, "up", "a")))
  }
}
