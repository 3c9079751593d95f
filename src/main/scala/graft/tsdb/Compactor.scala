package graft.tsdb

import org.apache.spark.sql.SparkSession
import graft.sources.tsdbblock.{BlockMeta, TsdbBlockWriter}

/** The data-dir MAINTENANCE LOOP a live Prometheus runs around the
  * read path the reference opens (`tsdb.DBReadOnly`, hello.go:50-74):
  * pick compactable parent sets off the exponential range ladder,
  * level them up, and enforce time/size retention by dropping whole
  * expired blocks. All decisions are O(#blocks) metadata reads
  * (meta.json is ~200 bytes); the only data-sized work is the
  * compaction job itself, which is [[TsdbBlockWriter.compactBlocks]]'s
  * one-shuffle Spark write — so at 100 TB the planner costs nothing
  * and each executed step touches exactly the chosen parents' bytes.
  *
  * Planner semantics follow the public Prometheus LeveledCompactor
  * (`tsdb/compact.go`): overlapping blocks compact first (vertical
  * compaction); otherwise, for each range of the ladder above the
  * base, consecutive blocks fully inside one range-aligned window are
  * selected when the group spans the full window or lies entirely
  * before the newest block's start — the "don't compact prematurely"
  * rule — and has more than one member.
  */
object Compactor {

  /** Prometheus's `ExponentialBlockRanges`: `steps` ranges starting at
    * `minRange`, each `factor`× the previous (default ladder
    * 2h · 5 · 5 → [2h, 10h, 50h]). */
  def exponentialRanges(minRangeMs: Long = 2L * 3600 * 1000,
                        steps: Int = 3, factor: Long = 5): Seq[Long] =
    Iterator.iterate(minRangeMs)(_ * factor).take(steps).toSeq

  /** One planning step: the parent set to compact next and the target
    * block range for the result, or None when the dir is fully
    * compacted for this ladder. Pure function of the metas — unit
    * testable without any on-disk block. */
  def plan(blocks: Seq[BlockMeta],
           ranges: Seq[Long]): Option[(Seq[BlockMeta], Long)] = {
    val sorted = blocks.sortBy(m => (m.minTime, m.ulid))
    selectOverlapping(sorted).map(g => (g, ranges.max))
      .orElse(selectRange(sorted, ranges))
  }

  /** Vertical compaction: the first run of time-overlapping blocks.
    * maxTime is exclusive: [0,10) and [10,20) touch but do not
    * overlap. */
  private def selectOverlapping(sorted: Seq[BlockMeta]): Option[Seq[BlockMeta]] = {
    var group = List.empty[BlockMeta]
    var groupMax = Long.MinValue
    sorted.foreach { m =>
      if (group.nonEmpty && m.minTime < groupMax) {
        group = m :: group
        groupMax = math.max(groupMax, m.maxTime)
      } else if (group.sizeIs > 1) {
        return Some(group.reverse)
      } else {
        group = List(m); groupMax = m.maxTime
      }
    }
    if (group.sizeIs > 1) Some(group.reverse) else None
  }

  /** Horizontal compaction off the ladder (`selectDirs` +
    * `splitByRange` in compact.go). */
  private def selectRange(sorted: Seq[BlockMeta],
                          ranges: Seq[Long]): Option[(Seq[BlockMeta], Long)] = {
    if (ranges.size < 2 || sorted.isEmpty) return None
    val highTime = sorted.last.minTime // newest block's start
    ranges.drop(1).foreach { iv =>
      splitByRange(sorted, iv).foreach { part =>
        val mint = part.head.minTime
        val maxt = part.last.maxTime // exclusive by convention
        if (part.sizeIs > 1 && (maxt - mint == iv || maxt <= highTime))
          return Some((part, iv))
      }
    }
    None
  }

  /** Group consecutive blocks into `iv`-aligned windows; a block that
    * crosses a window boundary joins no group (it is already at or
    * past this range's size). */
  private def splitByRange(sorted: Seq[BlockMeta],
                           iv: Long): Seq[Seq[BlockMeta]] = {
    val parts = Seq.newBuilder[Seq[BlockMeta]]
    var i = 0
    while (i < sorted.size) {
      val t0 = math.floorDiv(sorted(i).minTime, iv) * iv
      if (sorted(i).maxTime > t0 + iv) { i += 1 } // boundary-crosser
      else {
        val group = Seq.newBuilder[BlockMeta]
        while (i < sorted.size && sorted(i).minTime >= t0 &&
          sorted(i).maxTime <= t0 + iv) {
          group += sorted(i); i += 1
        }
        parts += group.result()
      }
    }
    parts.result().filter(_.nonEmpty)
  }

  /** Every group selectable in one planning round: all overlap runs
    * if any exist, else every selectable window part of the FIRST
    * ladder range with a hit. Groups within a round are pairwise
    * disjoint (splitByRange windows don't share blocks), so their
    * compactions are independent jobs. Prometheus executes [[plan]]
    * one group at a time on one thread; the round form exposes the
    * same fixpoint with intra-round parallelism for a cluster. */
  def planRound(blocks: Seq[BlockMeta],
                ranges: Seq[Long]): Seq[(Seq[BlockMeta], Long)] = {
    val sorted = blocks.sortBy(m => (m.minTime, m.ulid))
    selectOverlapping(sorted) match {
      case Some(g) => Seq((g, ranges.max))
      case None =>
        if (ranges.size < 2 || sorted.isEmpty) return Nil
        val highTime = sorted.last.minTime
        ranges.drop(1).foreach { iv =>
          val hits = splitByRange(sorted, iv).filter { part =>
            val mint = part.head.minTime
            val maxt = part.last.maxTime
            part.sizeIs > 1 && (maxt - mint == iv || maxt <= highTime)
          }
          if (hits.nonEmpty) return hits.map((_, iv))
        }
        Nil
    }
  }

  /** Run the loop to quiescence: plan a round → compact every group
    * (parents deleted as Prometheus truncates them) → re-plan, until
    * no step applies. Groups of one round are disjoint, so they run
    * as CONCURRENT Spark jobs (each is one job over just its parents —
    * a single-task block assembly; round concurrency is what keeps a
    * 30-parent backlog from paying 30 serial assemblies). Returns the
    * block names produced. */
  def compactDb(spark: SparkSession, dbDir: String,
                ranges: Seq[Long] = exponentialRanges(),
                maxRounds: Int = 64): Seq[String] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val produced = Seq.newBuilder[String]
    var round = 0
    var more = true
    while (more && round < maxRounds) {
      val groups = planRound(BlockMeta.list(dbDir), ranges)
      if (groups.isEmpty) more = false
      else {
        val jobs = groups.map { case (parents, iv) => Future {
          TsdbBlockWriter.compactBlocks(
            spark, parents.map(_.dir), dbDir, iv, deleteParents = true)
        }}
        jobs.foreach(j => produced ++= Await.result(j, Duration.Inf))
        round += 1
      }
    }
    produced.result()
  }

  /** Time retention (`--storage.tsdb.retention.time`): delete every
    * block whose newest sample is older than the horizon — Prometheus's
    * `beyondTimeRetention`, whole blocks only; samples inside a
    * surviving block are never touched. Returns deleted block dirs. */
  def retainTime(dbDir: String, retentionMs: Long,
                 nowMs: Long): Seq[String] = {
    val doomed = BlockMeta.list(dbDir)
      .filter(m => m.maxTime < nowMs - retentionMs)
    doomed.foreach(m => deleteTree(new java.io.File(m.dir)))
    doomed.map(_.dir)
  }

  /** Size retention (`--storage.tsdb.retention.size`): walking blocks
    * NEWEST first, keep while the running total (seeded with the WAL
    * head's size, as Prometheus counts it) stays within `maxBytes`;
    * the first overflowing block and everything older is deleted —
    * `beyondSizeRetention`. Returns deleted block dirs. */
  def retainSize(dbDir: String, maxBytes: Long): Seq[String] = {
    val wal = new java.io.File(dbDir, "wal")
    var total = if (wal.isDirectory) BlockMeta.dirSize(wal.getPath) else 0L
    val newestFirst = BlockMeta.list(dbDir)
      .sortBy(m => (-m.maxTime, m.ulid))
    var overflowed = false
    val doomed = newestFirst.filter { m =>
      if (!overflowed) {
        total += BlockMeta.dirSize(m.dir)
        overflowed = total > maxBytes
      }
      overflowed
    }
    doomed.foreach(m => deleteTree(new java.io.File(m.dir)))
    doomed.map(_.dir)
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }
}
