package graft.sources

import graft.SparkSpec
import graft.sources.tsdbblock.{TsdbWalWriter, WalReader}
import org.apache.spark.sql.functions._

/** WAL checkpointing: folding segments into `checkpoint.N`, truncating
  * the folded segments, replay order (checkpoint first, then live
  * segments > N), re-checkpointing on top of a checkpoint, and append
  * numbering that never reuses a folded index. */
class WalCheckpointSpec extends SparkSpec {

  // many distinct series: the writer groups per series, so filling N
  // segments requires ≥ N series (one series always lands in one task)
  private def longForm(times: Seq[Long], name: String) = {
    val s = spark
    import s.implicits._
    times.toDF("time")
      .withColumn("value", col("time").cast("double") * 0.5)
      .withColumn("labels", map(
        lit("__name__"), lit(name),
        lit("i"), (col("time") % 16).cast("string")))
  }

  test("checkpoint drops pre-horizon samples, keeps series, truncates") {
    val dir = tmpDir("graft_cp_")
    TsdbWalWriter.write(longForm(0L until 1000L, "a"), dir, partitions = 4)
    assert(WalReader.segments(dir).size === 4)

    val folded = TsdbWalWriter.checkpoint(spark, dir, keepTime = 600L)
    assert(folded === 4)
    val segs = WalReader.segments(dir)
    assert(segs.forall(_.contains("checkpoint.00000003")),
      "all live segments folded ⇒ only checkpoint contents replay")
    assert(new java.io.File(dir).listFiles().count(_.isFile) === 0,
      "folded segments must be deleted")

    val back = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0))
    assert(back.toSet === (600L until 1000L).toSet,
      "exactly the at/after-horizon samples survive, refs resolved " +
        "through the checkpoint's series records")
  }

  test("append after checkpoint numbers past it; replay merges both") {
    val dir = tmpDir("graft_cp_app_")
    TsdbWalWriter.write(longForm(0L until 100L, "a"), dir, partitions = 2)
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 50L)
    TsdbWalWriter.write(longForm(100L until 200L, "a"), dir, partitions = 2)
    val names = new java.io.File(dir).listFiles()
      .filter(_.isFile).map(_.getName).sorted
    assert(names.toSeq === Seq("00000002", "00000003"),
      "fresh segments must start past the checkpoint index")
    val back = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0))
    assert(back.toSet === (50L until 200L).toSet)
  }

  test("re-checkpoint folds checkpoint + new segments, supersedes it") {
    val dir = tmpDir("graft_cp_re_")
    TsdbWalWriter.write(longForm(0L until 100L, "a"), dir, partitions = 2)
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 10L)
    TsdbWalWriter.write(longForm(100L until 200L, "a"), dir, partitions = 2)
    val folded = TsdbWalWriter.checkpoint(spark, dir, keepTime = 150L)
    assert(folded === 2, "only LIVE segments count as folded")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(dirs.map(_.getName).toSeq === Seq("checkpoint.00000003"),
      "the superseded checkpoint.00000001 must be deleted")
    val back = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0))
    assert(back.toSet === (150L until 200L).toSet,
      "the horizon re-applies to previously checkpointed samples too")
  }

  test("checkpoint with nothing live to fold is a no-op") {
    val dir = tmpDir("graft_cp_noop_")
    TsdbWalWriter.write(longForm(0L until 10L, "a"), dir, partitions = 1)
    assert(TsdbWalWriter.checkpoint(spark, dir, keepTime = 0L) === 1)
    // everything already folded: second call must not touch the layout
    assert(TsdbWalWriter.checkpoint(spark, dir, keepTime = 5L) === 0)
    val back = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0))
    assert(back.toSet === (0L until 10L).toSet)
  }

  test("`through` bounds the fold; later segments stay live") {
    val dir = tmpDir("graft_cp_thru_")
    TsdbWalWriter.write(longForm(0L until 100L, "a"), dir, partitions = 4)
    val folded = TsdbWalWriter.checkpoint(spark, dir, keepTime = 0L, through = 1)
    assert(folded === 2)
    val live = new java.io.File(dir).listFiles().filter(_.isFile)
      .map(_.getName).sorted
    assert(live.toSeq === Seq("00000002", "00000003"))
    // nothing dropped (keepTime 0): full replay survives the split
    val back = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0))
    assert(back.toSet === (0L until 100L).toSet)
  }
}
