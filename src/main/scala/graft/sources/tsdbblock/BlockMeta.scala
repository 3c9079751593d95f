package graft.sources.tsdbblock

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** A parsed block `meta.json` — the per-block bookkeeping every
  * Prometheus data-dir tool (compactor, retention, readers) starts
  * from (reference adjacency: `tsdb.DBReadOnly.Blocks()` loads the
  * same metas before serving queries, hello.go:50-74).
  *
  * `maxTime` is EXCLUSIVE (the Prometheus convention the reference
  * block's own meta.json follows — a round 2h ceiling): samples
  * satisfy `minTime <= t < maxTime`. [[TsdbBlockWriter.write]] stamps
  * the slice window end; bare [[TsdbBlockWriter.writeBlock]] stamps
  * max sample + 1.
  */
final case class BlockMeta(
    dir: String, ulid: String, minTime: Long, maxTime: Long,
    level: Int, sources: Seq[String],
    numSamples: Long = 0L, numSeries: Long = 0L, numChunks: Long = 0L) {
  /** Parents descriptor for a compaction that consumes this block. */
  def parentDesc: TsdbBlockWriter.ParentDesc =
    TsdbBlockWriter.ParentDesc(ulid, minTime, maxTime)
}

object BlockMeta {

  /** Parse `dir/meta.json`. Field extraction is first-occurrence
    * regex — the block's own ulid/minTime/maxTime/level/sources all
    * precede any `parents` section in the layout we (and Prometheus)
    * write, so the first hit is always the block's own field. */
  def read(dir: String): BlockMeta = {
    val meta = new String(
      Files.readAllBytes(Paths.get(dir, "meta.json")), UTF_8)
    def firstNum(k: String): Long =
      (s""""$k"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(meta)
        .map(_.group(1).toLong).getOrElse(0L)
    val ulid = """"ulid"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(meta)
      .map(_.group(1)).getOrElse("")
    val sources = """"sources"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(meta)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    BlockMeta(dir, ulid, firstNum("minTime"), firstNum("maxTime"),
      firstNum("level").toInt, sources,
      numSamples = firstNum("numSamples"),
      numSeries = firstNum("numSeries"),
      numChunks = firstNum("numChunks"))
  }

  /** The block directories of a data dir (subdirs carrying an index +
    * meta.json — the `wal/` head and stray files are skipped), metas
    * parsed, sorted by (minTime, ulid) as the compactor expects. */
  def list(dbDir: String): Seq[BlockMeta] = {
    val root = new java.io.File(dbDir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        new java.io.File(f, "index").isFile &&
        new java.io.File(f, "meta.json").isFile)
      .map(f => read(f.getPath))
      .sortBy(m => (m.minTime, m.ulid)).toSeq
  }

  /** Total bytes under a directory tree (block or WAL size on disk). */
  def dirSize(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new java.io.File(dir))
  }
}
