package graft.tsdb

import graft.SparkSpec
import graft.sources.tsdbblock.{BlockMeta, TsdbDb, TsdbBlockWriter, TsdbWalWriter}
import org.apache.spark.sql.functions._

/** promtool-parity tooling: OpenMetrics backfill into real blocks and
  * the snapshot admin API (hard-linked blocks + head flush). */
class BackfillSpec extends SparkSpec {

  private def longRows(n: Int) = (0 until n).map { i =>
    (i.toLong * 60000L, i / 4.0,
      Map("__name__" -> (if (i % 2 == 0) "up" else "req"),
        "job" -> ("j" + (i % 3))))
  }

  test("openmetrics text backfills into readable 2h blocks") {
    val s = spark; import s.implicits._
    val rows = longRows(600) // 10h of minutes
    val text = tmpDir("graft_bf_text_")
    SampleReaders.toOpenMetricsLines(rows.toDF("time", "value", "labels"))
      .write.mode("overwrite").text(text)
    val dest = tmpDir("graft_bf_blocks_")
    val names = Backfill.openMetrics(spark, text, dest)
    assert(names.size === 5) // 10h / 2h default promtool slicing
    val back = TsdbDb.read(spark, dest)
      .select(col("time"), col("value"),
        col("labels")("__name__").as("n"), col("labels")("job").as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
      .toSet
    assert(back === rows.map(r =>
      (r._1, r._2, r._3("__name__"), r._3("job"))).toSet)
  }

  test("snapshot: links blocks, flushes the WAL head, original untouched") {
    val s = spark; import s.implicits._
    val rows = longRows(600)
    val (old, recent) = rows.partition(_._1 < 300L * 60000L)
    val db = tmpDir("graft_snap_db_")
    TsdbBlockWriter.write(old.toDF("time", "value", "labels"), db,
      blockRangeMs = 2 * 3600 * 1000L)
    TsdbWalWriter.write(recent.toDF("time", "value", "labels"), s"$db/wal")
    val origBlocks = BlockMeta.list(db).map(_.dir).toSet

    val snap = tmpDir("graft_snap_out_")
    val names = Backfill.snapshot(spark, db, snap)
    // snapshot = the linked blocks + the head flushed as block(s)
    assert(names.toSet === BlockMeta.list(snap)
      .map(m => java.nio.file.Paths.get(m.dir).getFileName.toString).toSet)
    assert(!new java.io.File(snap, "wal").exists, "no wal/ in a snapshot")
    // original untouched: same block set, wal still there
    assert(BlockMeta.list(db).map(_.dir).toSet === origBlocks)
    assert(new java.io.File(db, "wal").isDirectory)

    def canon(dir: String) = TsdbDb.read(spark, dir)
      .select(col("time"), col("value"),
        col("labels")("__name__").as("n"), col("labels")("job").as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
      .toSet
    assert(canon(snap) === canon(db))
    assert(canon(snap) === rows.map(r =>
      (r._1, r._2, r._3("__name__"), r._3("job"))).toSet)
  }

  test("rules backfill: recorded series land as blocks; alert-only files refuse") {
    import spark.implicits._
    val wide = Seq(
      (0L, 2.0, "err", "a"), (43200000L, 3.0, "err", "a"),
      (43200000L, 5.0, "err", "b"))
      .toDF("time", "value", "labels.name", "labels.user")
    val dest = tmpDir("rules_backfill")
    val names = Backfill.fromRules(
      """groups:
        |  - name: g
        |    interval: 12h
        |    rules:
        |      - record: user_err
        |        expr: sum by (user) ({name="err"})
        |""".stripMargin,
      wide, start = 0L, end = 43200000L, defaultStepMs = 1L,
      lookbackMs = 43200000L, dest, blockRangeMs = 86400000L)
    assert(names.nonEmpty)
    val back = names.map(n => spark.read.format("tsdb-block")
        .load(s"$dest/$n")).reduce(_ unionByName _)
      .select(col("labels").getItem("__name__"),
        col("labels").getItem("user"), col("time"), col("value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(back === Set(
      ("user_err", "a", 0L, 2.0),
      ("user_err", "a", 43200000L, 3.0),
      ("user_err", "b", 43200000L, 5.0)))
    // a file with no recording rules cannot backfill
    intercept[IllegalArgumentException](Backfill.fromRules(
      "groups:\n  - name: g\n    rules:\n      - alert: a\n        expr: up\n",
      wide, 0L, 1L, 1L, 1L, tmpDir("rules_backfill_bad")))
  }
}
