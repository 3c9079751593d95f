package graft.tsdb

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import graft.model.Matcher
import scala.jdk.CollectionConverters._

/** Deletion and retention for the wide TSDB table — the semantics of
  * Prometheus's tombstones + retention enforcement (the reference block
  * ships a `tombstones` file, empty and never consulted — SURVEY.md
  * §2.5 "DDL/DML: absent"; this is the engine's completion of it).
  *
  * The 100 TB design point is FILE-LEVEL triage from footer metadata
  * alone: each parquet file's (minTime, maxTime) comes from its footer
  * statistics — readable at ~KB per file, no data pages — and because
  * the ingest layout is time-sliced ([[TsdbIngest.write]]
  * repartitionByRange on time), a time-bounded delete touches only the
  * files whose slice intersects it:
  *
  *   - file entirely OUTSIDE the delete range  → untouched (zero I/O);
  *   - file entirely INSIDE with no matchers   → dropped (metadata op);
  *   - file intersecting                       → rewritten without the
  *     matching rows, landed as new uniquely-named part files beside the
  *     untouched ones, then the originals are deleted.
  *
  * So the cost of `delete(1 day ago, matchers)` on 10 years of data is
  * one day's bytes, not ten years'. Matcher semantics are the query
  * tier's own ([[MatcherCompiler]]): NULL-aware negations, absent ≡ "",
  * unanchored regex — a delete and a select can never disagree on which
  * rows a matcher names.
  */
object TsdbRetention {

  final case class RetentionStats(
      filesUntouched: Int, filesDropped: Int, filesRewritten: Int,
      rowsDeleted: Long)

  private final case class FileBounds(status: FileStatus, min: Long, max: Long)

  /** (minTime, maxTime) of each parquet file from footer statistics. */
  private def bounds(fs: FileSystem, dir: Path, conf: Configuration): Seq[FileBounds] = {
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[FileBounds]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val stats = reader.getFooter.getBlocks.asScala.flatMap { rg =>
            rg.getColumns.asScala.find(_.getPath.toDotString == TsdbSchema.TimeCol)
              .map(_.getStatistics)
          }
          // stats are always present for the INT64 time column we write;
          // a file missing them is treated as covering all time (always
          // a rewrite candidate — correct, just not pruned)
          val mins = stats.collect { case s if s != null && s.hasNonNullValue =>
            s.genericGetMin.asInstanceOf[java.lang.Long].longValue() }
          val maxs = stats.collect { case s if s != null && s.hasNonNullValue =>
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue() }
          out += FileBounds(f,
            if (mins.isEmpty) Long.MinValue else mins.min,
            if (maxs.isEmpty) Long.MaxValue else maxs.max)
        } finally reader.close()
      }
    }
    out.result()
  }

  /** Prometheus `DeleteSeries(start, end, matchers)`: remove samples with
    * `start <= time <= end` (INCLUSIVE, the delete-API convention —
    * unlike the query tier's exclusive range) whose labels satisfy ALL
    * matchers. Empty matcher list = match every series. */
  def delete(spark: SparkSession, path: String, matchers: Seq[Matcher],
             startMs: Long, endMs: Long): RetentionStats = {
    val p = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    val all = bounds(fs, p, conf)

    val (touched, untouched) = all.partition(b => b.max >= startMs && b.min <= endMs)
    // a whole-file drop needs the delete to cover every row: full time
    // coverage AND no label selectivity
    val (dropped, rewrite) =
      if (matchers.isEmpty) touched.partition(b => b.min >= startMs && b.max <= endMs)
      else (Seq.empty[FileBounds], touched)

    var rowsDeleted = dropped.map { b =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(b.status.getPath, conf))
      try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
    }.sum

    if (rewrite.nonEmpty) {
      val paths = rewrite.map(_.status.getPath.toString)
      val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
      val labels = TsdbSchema.labelColumns(df).map(_.stripPrefix(TsdbSchema.LabelPrefix)).toSet
      val doomed = MatcherCompiler.compileAll(matchers, labels) &&
        col(TsdbSchema.TimeCol) >= startMs && col(TsdbSchema.TimeCol) <= endMs
      // a row is deleted only when the predicate is TRUE — under SQL 3VL,
      // `not(NULL)` is NULL and a bare where() would silently delete rows
      // the matchers merely failed to decide (SURVEY §7.6's trap, on the
      // DML side)
      val kept = df.where(not(coalesce(doomed, lit(false))))
      rowsDeleted += df.count() - kept.count()
      // new part files carry a fresh job UUID — no name collisions with
      // the survivors they land beside
      val sortCols = col(TsdbSchema.TimeCol).asc +:
        TsdbSchema.labelColumns(kept).map(c => col(s"`$c`").asc_nulls_first)
      kept
        .repartitionByRange(math.max(1, rewrite.size), col(TsdbSchema.TimeCol))
        .sortWithinPartitions(sortCols: _*)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("parquet.enable.dictionary", "true")
        .option("compression", "snappy")
        .parquet(path)
      // record a manifest for the appended part files so TsdbIngest.read's
      // explicit-schema fast path stays trusted (its staleness probe would
      // otherwise see data newer than the newest manifest and fall back to
      // mergeSchema over every footer). ONLY on already-manifested tables:
      // `kept` covers just the rewritten files, and on a manifest-less
      // (foreign) table making its subset schema the table's FIRST
      // manifest would hide untouched files' columns — those tables stay
      // on the mergeSchema fallback, where every footer is consulted
      if (TsdbIngest.hasSchemaManifests(spark, path))
        TsdbIngest.writeSchemaManifest(kept, path)
    }
    (dropped ++ rewrite).foreach(b => fs.delete(b.status.getPath, false))

    RetentionStats(untouched.size, dropped.size, rewrite.size, rowsDeleted)
  }

  /** Retention enforcement: expire every sample with `time < keepFromMs`.
    * Files wholly below the horizon are dropped without being read. */
  def expire(spark: SparkSession, path: String, keepFromMs: Long): RetentionStats =
    delete(spark, path, Nil, Long.MinValue, keepFromMs - 1)
}
