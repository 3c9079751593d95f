package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction lifecycle: streaming micro-batch directories (with a
  * replayed batch and an evolving schema) rewritten into few large
  * time-sorted files with contents exactly preserved. */
class TsdbCompactSpec extends SparkSpec {
  import spark.implicits._

  private def longForm(rows: Seq[(Long, Double, Map[String, String])]) =
    rows.toDF("time", "value", "labels")

  test("compact merges batch dirs, drops the batch column, keeps contents") {
    val path = tmpDir("compact_")
    val batchA = longForm(Seq(
      (30L, 1.0, Map("name" -> "a", "user" -> "1")),
      (10L, 2.0, Map("name" -> "a", "user" -> "2"))))
    // batch B arrives later with a NEW label name (dynamic columns §1.4)
    val batchB = longForm(Seq(
      (20L, 3.0, Map("name" -> "b", "user" -> "1", "k" -> "7"))))
    graft.streaming.TsdbStreamIngest.writeBatch(batchA, path, 0L, timePartitions = 2)
    graft.streaming.TsdbStreamIngest.writeBatch(batchB, path, 1L, timePartitions = 2)
    // at-least-once replay of batch 0 — the idempotence gate must absorb it
    graft.streaming.TsdbStreamIngest.writeBatch(batchA, path, 0L, timePartitions = 2)

    val preCompact = TsdbIngest.read(spark, path)
    assert(preCompact.columns.contains("batch"), "batch partition col pre-compact")
    assert(preCompact.count() === 3, "replay must not duplicate rows")

    val stats = TsdbCompact.compact(spark, path)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected fewer files, got $stats")

    val after = TsdbIngest.read(spark, path)
    assert(!after.columns.contains("batch"), "batch col dropped by compaction")
    // schema union materialized: batch-A rows have labels.k NULL
    val got = after
      .select(col("time"), col("value"), col("`labels.name`"),
        col("`labels.user`"), col("`labels.k`"))
      .as[(Long, Double, String, String, Option[String])]
      .collect().toSet
    assert(got === Set(
      (30L, 1.0, "a", "1", None),
      (10L, 2.0, "a", "2", None),
      (20L, 3.0, "b", "1", Some("7"))))

    // layout: every output file is internally time-sorted (row-group
    // min/max pruning depends on this)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(path)))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val times = spark.read.parquet(f.getPath.toString)
        .select("time").as[Long].collect()
      assert(times.sameElements(times.sorted), s"${f.getPath} not time-sorted")
    }
    // crash-safety leftovers are cleaned up
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".compacting")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".precompact")))
  }

  test("compact sizes output partitions from input bytes") {
    val path = tmpDir("compact_sz_")
    val rows = longForm((0 until 2000).map(i =>
      (i.toLong, i.toDouble, Map("name" -> s"m${i % 3}"))))
    graft.streaming.TsdbStreamIngest.writeBatch(rows, path, 0L, timePartitions = 8)
    // tiny target ⇒ multiple output files, each a tight time slice
    val stats = TsdbCompact.compact(spark, path, targetFileBytes = 8 * 1024)
    assert(stats.filesAfter > 1, s"expected a multi-file rewrite, got $stats")
    assert(TsdbIngest.read(spark, path).count() === 2000)
  }
}
