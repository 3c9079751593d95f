package graft.tsdb

import graft.SparkSpec
import graft.sources.tsdbblock.{BlockMeta, TsdbBlockWriter}
import org.apache.spark.sql.functions._

/** The data-dir maintenance loop: planner semantics as pure-function
  * truth tables (the Prometheus LeveledCompactor rules), then the
  * compact/retain loops end-to-end against real block directories. */
class CompactorSpec extends SparkSpec {

  private def m(dir: String, mint: Long, maxtExcl: Long,
                level: Int = 1): BlockMeta =
    // maxTime is exclusive throughout (the Prometheus convention)
    BlockMeta(dir, dir, mint, maxtExcl, level, Seq(dir))

  private val H = 3600 * 1000L
  private val ranges = Seq(2 * H, 10 * H, 50 * H)

  test("exponentialRanges builds the 2h·5·5 ladder") {
    assert(Compactor.exponentialRanges() ===
      Seq(2 * H, 10 * H, 50 * H))
    assert(Compactor.exponentialRanges(60000L, 4, 3) ===
      Seq(60000L, 180000L, 540000L, 1620000L))
  }

  test("planner: full 10h window of 2h blocks is selected") {
    val blocks = (0 until 5).map(i => m(s"b$i", i * 2 * H, (i + 1) * 2 * H))
    val Some((parents, iv)) = Compactor.plan(blocks, ranges)
    assert(parents.map(_.dir) === (0 until 5).map(i => s"b$i"))
    assert(iv === 10 * H)
  }

  test("planner: partial window selected only when before the newest block") {
    // three blocks in [0,10h): not a full window, and the newest block
    // IS the last of them ⇒ premature, no plan
    val open = (0 until 3).map(i => m(s"b$i", i * 2 * H, (i + 1) * 2 * H))
    assert(Compactor.plan(open, ranges).isEmpty)
    // same three plus a newer block in the NEXT window ⇒ the stale
    // partial group compacts (maxt <= highTime)
    val withNewer = open :+ m("new", 10 * H, 12 * H)
    val Some((parents, iv)) = Compactor.plan(withNewer, ranges)
    assert(parents.map(_.dir) === Seq("b0", "b1", "b2"))
    assert(iv === 10 * H)
  }

  test("planner: single block per window never selected; crossers skipped") {
    // one block filling a whole window → nothing to do
    assert(Compactor.plan(Seq(m("a", 0, 10 * H, level = 2)), ranges).isEmpty)
    // a boundary-crossing block neither joins a group nor blocks others
    val blocks = Seq(
      m("cross", 8 * H, 12 * H), // crosses the 10h boundary
      m("c0", 20 * H, 22 * H), m("c1", 22 * H, 24 * H),
      m("c2", 24 * H, 26 * H), m("c3", 26 * H, 28 * H),
      m("c4", 28 * H, 30 * H))
    val Some((parents, _)) = Compactor.plan(blocks, ranges)
    assert(parents.map(_.dir) === Seq("c0", "c1", "c2", "c3", "c4"))
  }

  test("planner: ladder climbs — 10h blocks group into the 50h range") {
    val blocks = (0 until 5).map(i =>
      m(s"t$i", i * 10 * H, (i + 1) * 10 * H, level = 2))
    val Some((parents, iv)) = Compactor.plan(blocks, ranges)
    assert(parents.size === 5)
    assert(iv === 50 * H)
  }

  test("planner: overlapping blocks compact first (vertical compaction)") {
    val blocks = Seq(m("o1", 0, 4 * H), m("o2", 3 * H, 6 * H)) ++ // overlap
      (0 until 5).map(i => m(s"f$i", (10 + 2 * i) * H, (12 + 2 * i) * H))
    val Some((parents, _)) = Compactor.plan(blocks, ranges)
    assert(parents.map(_.dir) === Seq("o1", "o2"))
    // touching (maxExcl == next min) is NOT overlap
    assert(Compactor.plan(Seq(m("a", 0, 2 * H), m("b", 2 * H, 4 * H),
      m("far", 100 * H, 102 * H)), ranges).map(_._1.map(_.dir))
      === Some(Seq("a", "b"))) // range rule, not overlap: a+b fill [0,4h)⊂[0,10h) before `far`
  }

  test("compactDb runs the ladder to quiescence with lineage") {
    val s = spark; import s.implicits._
    val root = tmpDir("graft_cdb_")
    // 10 two-hour blocks: [0,20h) → ladder [2h,10h,50h] compacts the
    // two full 10h windows; then the two level-2 blocks sit in ONE 50h
    // window wholly before... no newer block, window not full ⇒ stop.
    val rows = (0 until 1200).map { i =>
      (i.toLong * 60000L, i.toDouble, Map("__name__" -> "m", "j" -> (i % 3).toString))
    }
    TsdbBlockWriter.write(rows.toDF("time", "value", "labels"), root, 2 * H)
    assert(BlockMeta.list(root).size === 10)
    val produced = Compactor.compactDb(spark, root, ranges)
    val after = BlockMeta.list(root)
    assert(after.size === 2, after.map(b => (b.dir, b.minTime, b.maxTime)))
    assert(after.forall(_.level === 2))
    // sources = the ORIGINAL level-1 ulids (5 each), parents recorded
    assert(after.forall(_.sources.size === 5))
    assert(produced.toSet === after.map(_.dir.split('/').last).toSet)
    // content identical through the loop
    val back = graft.sources.tsdbblock.TsdbDb.read(spark, root)
      .select(col("time"), col("value"), col("labels")("j").as("j"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(back === rows.map(r => (r._1, r._2, r._3("j"))).toSet)
  }

  test("retainTime drops exactly the wholly-expired blocks") {
    val s = spark; import s.implicits._
    val root = tmpDir("graft_rt_")
    val rows = (0 until 600).map { i =>
      (i.toLong * 60000L, 1.0, Map("__name__" -> "m"))
    } // 10h of minutes → 5 two-hour blocks
    TsdbBlockWriter.write(rows.toDF("time", "value", "labels"), root, 2 * H)
    assert(BlockMeta.list(root).size === 5)
    // horizon at 5h: blocks [0,2h) and [2h,4h) expire; [4h,6h) survives
    // whole (retention is block-granular — samples in it before 5h stay)
    val deleted = Compactor.retainTime(root, retentionMs = 5 * H, nowMs = 10 * H)
    assert(deleted.size === 2)
    val kept = BlockMeta.list(root)
    assert(kept.size === 3)
    assert(kept.map(_.minTime).min === 4 * H)
  }

  test("retainSize keeps newest-first within the budget, WAL counted") {
    val s = spark; import s.implicits._
    val root = tmpDir("graft_rs_")
    val rows = (0 until 600).map { i =>
      (i.toLong * 60000L, i.toDouble, Map("__name__" -> "m"))
    }
    TsdbBlockWriter.write(rows.toDF("time", "value", "labels"), root, 2 * H)
    val sizes = BlockMeta.list(root)
      .sortBy(m => -m.maxTime).map(m => BlockMeta.dirSize(m.dir))
    // budget for exactly the newest two blocks
    val budget = sizes.take(2).sum + sizes(2) / 2
    val deleted = Compactor.retainSize(root, budget)
    assert(deleted.size === 3)
    val kept = BlockMeta.list(root)
    assert(kept.size === 2)
    assert(kept.map(_.minTime).min === 6 * H) // the two newest survive
    // an over-budget WAL head forces every block out
    val root2 = tmpDir("graft_rs2_")
    TsdbBlockWriter.write(rows.take(120).toDF("time", "value", "labels"), root2, 2 * H)
    graft.sources.tsdbblock.TsdbWalWriter.write(
      rows.take(120).toDF("time", "value", "labels"), s"$root2/wal")
    val walSize = BlockMeta.dirSize(s"$root2/wal")
    assert(Compactor.retainSize(root2, walSize).size === 1)
    assert(BlockMeta.list(root2).isEmpty)
    assert(new java.io.File(root2, "wal").isDirectory, "WAL itself never deleted")
  }
}
