package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.tsdbblock.IndexReader

/** `promtool tsdb analyze` analog — the cardinality diagnosis an
  * operator runs before data-dir surgery, next to the block inventory
  * ([[graft.queries.TsdbQueries]] q149 `promtool tsdb list`) and the
  * sample dump ([[TsdbDump]]): which metrics, label names and
  * label-value pairs explode a block's series universe, and how full
  * its chunks are.
  *
  * One frame, promtool's sections as rows:
  *   - `metric`  — per metric name: series / samples / chunks
  *     (promtool's "highest cardinality metric names" + the chunk-fill
  *     numerators);
  *   - `label`   — per label name: series carrying it and DISTINCT
  *     value count (promtool's "highest cardinality labels");
  *   - `pair`    — per `name=value` pair: series count (promtool's
  *     "most common label pairs").
  * Callers rank/limit; the frame is deterministic and complete.
  *
  * Scale shape: the index read is a series-universe-sized driver pass
  * (promtool's own access shape, and the same contract as the
  * tombstone tooling); sample counts come from the DISTRIBUTED block
  * scan (one pruned scan + one partial-agg groupBy keyed by the sorted
  * label entries); label/pair stats explode series × labels — label
  * metadata, never samples. Nothing sample-sized reaches the driver.
  */
object TsdbAnalyze {

  def analyze(spark: SparkSession, blockDir: String): DataFrame = {
    import spark.implicits._
    val entries = IndexReader.read(s"$blockDir/index")
    val series = spark.createDataset(entries.map(e =>
        (e.labels, e.chunks.size.toLong)))
      .toDF("labels", "n_chunks")
      .withColumn("_k", array_sort(map_entries(col("labels"))))
    // distributed per-series sample counts from the chunk data
    val samples = spark.read.format("tsdb-block").load(blockDir)
      .select(array_sort(map_entries(col("labels"))).as("_k"))
      .groupBy(col("_k")).agg(count(lit(1)).as("n_samples"))
    val per = series.join(samples, Seq("_k"), "left")
      .na.fill(0L, Seq("n_samples"))
      .select(col("labels"), col("n_chunks"), col("n_samples"))
    val zero = lit(0L)
    val metric = per
      .groupBy(col("labels").getItem("__name__").as("key"))
      .agg(count(lit(1)).as("n_series"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("n_chunks")).as("n_chunks"))
      .select(lit("metric").as("section"), col("key"),
        col("n_series"), zero.as("n_values"), col("n_samples"),
        col("n_chunks"))
    val pairs = per.select(explode(col("labels")).as(Seq("k", "v")))
    val label = pairs.groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("n_series"),
        countDistinct(col("v")).as("n_values"))
      .select(lit("label").as("section"), col("key"),
        col("n_series"), col("n_values"), zero.as("n_samples"),
        zero.as("n_chunks"))
    val pair = pairs
      .groupBy(concat(col("k"), lit("="), col("v")).as("key"))
      .agg(count(lit(1)).as("n_series"))
      .select(lit("pair").as("section"), col("key"), col("n_series"),
        zero.as("n_values"), zero.as("n_samples"), zero.as("n_chunks"))
    metric.unionByName(label).unionByName(pair)
  }
}
