package graft.tsdb

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.model.Matcher
import graft.sources.tsdbblock.{IndexReader, Tombstones, TsdbBlockWriter}

/** Prometheus's admin surface over block directories: the Delete API
  * (`POST /api/v1/admin/tsdb/delete_series`) writes tombstones; the
  * Clean-Tombstones API rewrites the block without the deleted data.
  * (The reference opens stock Prometheus blocks — hello.go:50-74 — whose
  * lifecycle includes both; SURVEY.md §2.1 S1.)
  *
  * Scale model: a delete touches only index-sized metadata (one driver
  * pass over the index, a few bytes of stones per series) — sample data
  * is untouched until the next compaction, exactly Prometheus's design,
  * so deleting from a 100 TB corpus is O(index), not O(samples). The
  * clean is a normal distributed block write over the masked scan.
  */
object TsdbAdmin {

  /** Write tombstones for every series matching `matchers` whose data
    * intersects the INCLUSIVE [mint, maxt] window — the engine analogue
    * of delete_series. Matcher semantics are the engine's throughout:
    * absent label ≡ "" (hello.go:339-349), regex unanchored
    * (hello.go:311). Stones union with any already present; meta.json's
    * `numTombstones` is refreshed. Returns the number of series stoned
    * by THIS call. */
  def deleteSeries(blockDir: String, matchers: Seq[Matcher],
                   mint: Long = Long.MinValue,
                   maxt: Long = Long.MaxValue): Int = {
    val hit = IndexReader.read(s"$blockDir/index")
      .filter(s => matchers.forall(m => matcherHolds(s.labels, m)))
      .filter(s => s.chunks.exists(c => c.maxTime >= mint && c.minTime <= maxt))
    val fresh = hit.map(s =>
      s.ref -> Seq(Tombstones.Interval(mint, maxt))).toMap
    val path = s"$blockDir/tombstones"
    val merged = Tombstones.union(Tombstones.read(path), fresh)
    Tombstones.write(path, merged)
    refreshMetaTombstoneCount(blockDir,
      merged.valuesIterator.map(_.size.toLong).sum)
    fresh.size
  }

  /** Rewrite the block without its tombstoned data — clean_tombstones.
    * The masked scan is the ordinary distributed block read (pruned
    * chunks never fetched); the write is [[TsdbBlockWriter.write]]'s
    * one-shuffle assembly. Returns the new block names under
    * `destRoot`; the originals are left in place (the caller — like
    * Prometheus's compactor — swaps directories once the write lands). */
  def cleanTombstones(spark: SparkSession, blockDir: String, destRoot: String,
                      blockRangeMs: Long = 2L * 3600 * 1000): Seq[String] =
    cleanTombstones(spark, Seq(blockDir), destRoot, blockRangeMs)

  /** Clean MANY blocks in one Spark job — the masked scans union into a
    * single one-shuffle block write, so a whole data directory cleans
    * with the same plan shape as writing it (per-block sequential jobs
    * would pay 30 shuffle setups for 30 blocks; this pays one). Block
    * boundaries are re-derived from `blockRangeMs`, exactly what the
    * Prometheus compactor does when it merges deletion-carrying
    * blocks. */
  def cleanTombstones(spark: SparkSession, blockDirs: Seq[String],
                      destRoot: String, blockRangeMs: Long): Seq[String] =
    TsdbBlockWriter.write(
      blockDirs.map(d => spark.read.format("tsdb-block").load(d))
        .reduce(_ unionByName _),
      destRoot, blockRangeMs,
      // histogram chunks survive the clean too (their reader applies
      // the same tombstone pruning/masking as the float scan)
      hists = Some(blockDirs
        .map(d => graft.sources.tsdbblock.TsdbBlockRecords
          .readHistograms(spark, d))
        .reduce(_ union _)))

  /** The WHOLE-DB Delete API — what
    * `POST /api/v1/admin/tsdb/delete_series` actually does: tombstone
    * every matching series in every block AND in the WAL head (kind-3
    * stone records, which mask replay immediately). Still O(metadata):
    * one index pass per block plus one series-record pass over the
    * WAL. Returns the number of (block-or-WAL, series) pairs stoned. */
  def deleteSeriesDb(dbDir: String, matchers: Seq[Matcher],
                     mint: Long = Long.MinValue,
                     maxt: Long = Long.MaxValue): Int = {
    val root = new java.io.File(dbDir)
    val blocks = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new java.io.File(f, "index").isFile)
      .map(_.getPath).sorted
    val nBlocks = blocks.map(deleteSeries(_, matchers, mint, maxt)).sum
    val walDir = new java.io.File(root, "wal")
    val nWal =
      if (!walDir.isDirectory) 0
      else {
        val hit = graft.sources.tsdbblock.WalReader.seriesDict(walDir.getPath)
          .filter { case (_, labels) =>
            matchers.forall(m => matcherHolds(labels, m))
          }
        graft.sources.tsdbblock.TsdbWalWriter.writeStones(walDir.getPath,
          hit.keys.toSeq.sorted.map(ref => (ref, mint, maxt)))
        hit.size
      }
    nBlocks + nWal
  }

  private def matcherHolds(labels: Map[String, String], m: Matcher): Boolean = {
    val v = labels.getOrElse(m.name, "")
    m match {
      case Matcher.Eq(_, x) => v == x
      case Matcher.NotEq(_, x) => v != x
      case Matcher.Re(_, p) =>
        java.util.regex.Pattern.compile(p).matcher(v).find()
      case Matcher.NotRe(_, p) =>
        !java.util.regex.Pattern.compile(p).matcher(v).find()
    }
  }

  /** Patch (or insert) `stats.numTombstones` in meta.json, preserving
    * everything else byte-for-byte — the file may be reference-written. */
  private def refreshMetaTombstoneCount(blockDir: String, n: Long): Unit = {
    val p = Paths.get(blockDir, "meta.json")
    if (!Files.isRegularFile(p)) return
    val text = new String(Files.readAllBytes(p), UTF_8)
    val patched =
      if (text.contains("\"numTombstones\""))
        text.replaceAll("\"numTombstones\"\\s*:\\s*\\d+",
          s""""numTombstones": $n""")
      else
        text.replaceFirst("(\"numChunks\"\\s*:\\s*\\d+)",
          s"""$$1,\n\t\t"numTombstones": $n""")
    Files.write(p, patched.getBytes(UTF_8))
  }
}
