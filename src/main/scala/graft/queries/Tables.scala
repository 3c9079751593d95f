package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders + the events→TSDB mapping shared by the query
  * pack and the oracle SQL.
  */
object Tables {
  /** A temp directory deleted (recursively) when the JVM exits. The
    * stored-table caches below are write-once per (JVM, sfDir); without
    * the hook every local run leaked its /tmp/graft_* materializations
    * across runs. Registered lazily per directory — Spark's own shutdown
    * hooks don't read these paths, so deletion order is immaterial. */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(p.toFile)))
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Scale-adaptive scan fan-out (optimization guide §2.2/§2.5): a
    * CPU-heavy per-row pipeline (wire codec, shingle/hash kernel, WAL or
    * block encode) needs parallelism proportional to CORES, but a small
    * input — locally, one single-row-group parquet file — plans as ONE
    * split and serializes the whole map side on one task while the rest
    * of the box idles. When (and only when) the scan yields fewer
    * partitions than the session's default parallelism, round-robin it
    * out; at warehouse scale the input already has ≥ cores splits and
    * this is a provable no-op, so it is not a local-only tuning. The
    * shuffled bytes are the small input itself — cheap insurance against
    * a serialized multi-second codec stage. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // partition count read off THIS dataset's own execution: df.rdd
    // builds a SECOND QueryExecution (deserializer lineage) per query
    // construction just to count splits; toRdd reuses the one already
    // attached to the frame
    if (df.queryExecution.toRdd.getNumPartitions >= p) df
    else df.repartition(p)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet's `ts` encoding has varied across generator runs:
    // TIMESTAMP(NANOS) (Spark reads as LongType nanos behind the legacy
    // flag), TIMESTAMP(MICROS) isAdjustedToUTC=false (TIMESTAMP_NTZ), or
    // a plain UTC TimestampType. Normalize every one of them to a
    // microsecond TimestampType up front (lossless for this data — no
    // sub-µs ticks; sessions run with spark.sql.session.timeZone=UTC, so
    // the NTZ→TZ cast pins the same UTC epoch DuckDB's epoch_ms reads)
    // so every downstream operator sees one plain timestamp type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize an `events` frame's `ts` column to UTC TimestampType,
    * whatever encoding the parquet writer used (see [[load]]). Shared
    * with the streaming source, which must declare a schema up front. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  /** `events` viewed as the reference's wide dynamic-column TSDB table
    * (FIXTURES.md §B mapping): ts→time (epoch ms), value→value, and three
    * label columns `labels.name` (event_type), `labels.user` (user_id as
    * string), `labels.k` (parsed from the props JSON). Literal dots in
    * flat column names, exactly like the reference's `labels.<name>`
    * storage convention (hello.go:334).
    */
  def eventsAsTsdb(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events").select(
      unix_millis(col("ts")).as("time"),
      col("value"),
      col("event_type").as("labels.name"),
      col("user_id").cast("string").as("labels.user"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("labels.k"))

  /** [[eventsAsTsdb]] materialized ONCE per (JVM, sfDir) through the real
    * ingest path ([[graft.tsdb.TsdbIngest.write]]): range-partitioned on
    * time, sorted (time, labels NULLS FIRST), snappy + dictionary. Queries
    * over this table get what the on-the-fly view cannot give them —
    * `time`/label predicates pushed to the parquet scan and row groups
    * pruned by the write-time sort order. This IS the engine's storage
    * tier; the view form exists only to define the mapping + oracle. */
  def eventsAsTsdbStored(spark: SparkSession, sfDir: String): DataFrame =
    storedCache.synchronized {
      storedCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
        val path = scratchDir("graft_tsdb_")
        // 8 time slices: fewer, bigger time-sorted files beat
        // one-per-core here (tighter row-group pruning, fewer footers);
        // at 100 TB the knob is bytes/partition, ~128-512 MB.
        // NO fanOut here (round-19 measurement): the range shuffle that
        // follows redistributes anyway, and the pre-shuffle map work
        // (regexp/labels projection) is too small to pay for an extra
        // exchange — three bench runs showed a consistent +0.3 s with
        // the fan-out and no win
        graft.tsdb.TsdbIngest.write(eventsAsTsdb(spark, sfDir), path)
        path
      })
    } match { case path => graft.tsdb.TsdbIngest.read(spark, path) }

  private val storedCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** Events in the METRIC-PARTITIONED layout (`__metric=<name>/…`, the
    * mentors' "one file per metric" design): event_type becomes the
    * `__name__` label so `Eq("__name__", v)` matchers prune whole
    * directories at planning. Materialized once per (JVM, sfDir). */
  def eventsAsTsdbMetricStored(spark: SparkSession, sfDir: String): DataFrame =
    partCache.synchronized {
      partCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
        val wide = load(spark, sfDir, "events").select(
          unix_millis(col("ts")).as("time"),
          col("value"),
          col("event_type").as("labels.__name__"),
          col("user_id").cast("string").as("labels.user"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("labels.k"))
        val path = scratchDir("graft_tsdb_part_")
        graft.tsdb.TsdbIngest.writePartitionedByMetric(wide, path)
        path
      })
    } match { case path => graft.tsdb.TsdbIngest.readPartitioned(spark, path) }

  private val partCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** The dynamic-column story (SURVEY §1.4) materialized: batch A writes
    * events with labels (name, user); batch B later writes a SUPERSET
    * schema adding `labels.k` — FrostDB's on-the-fly column creation,
    * realized as parquet schema evolution reconciled by mergeSchema at
    * read. Batch-A rows read back with `labels.k` NULL (absent). */
  def eventsAsTsdbEvolvedStored(spark: SparkSession, sfDir: String): DataFrame =
    evolvedCache.synchronized {
      evolvedCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
        val e = load(spark, sfDir, "events")
        val base = e.select(
          unix_millis(col("ts")).as("time"), col("value"),
          col("event_type").as("labels.name"),
          col("user_id").cast("string").as("labels.user"))
        val path = scratchDir("graft_tsdb_evo_")
        graft.tsdb.TsdbIngest.write(
          base.where(col("time") % 2 === 0), path)
        graft.tsdb.TsdbIngest.write(
          e.select(
            unix_millis(col("ts")).as("time"), col("value"),
            col("event_type").as("labels.name"),
            col("user_id").cast("string").as("labels.user"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("labels.k"))
            .where(col("time") % 2 === 1),
          path, mode = org.apache.spark.sql.SaveMode.Append)
        path
      })
    } match { case path => graft.tsdb.TsdbIngest.read(spark, path) }

  private val evolvedCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** Events landed through the STREAMING sink's idempotent per-batch
    * writer (7 micro-batch directories, one replayed to prove the
    * idempotence gate), then COMPACTED by [[graft.tsdb.TsdbCompact]] into
    * few large time-sorted files. Queries over this table prove the whole
    * ingest→compact lifecycle preserves contents exactly. */
  def eventsAsTsdbCompactedStored(spark: SparkSession, sfDir: String): DataFrame =
    compactCache.synchronized {
      compactCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
        val long = load(spark, sfDir, "events").select(
          unix_millis(col("ts")).as("time"),
          col("value"),
          map(lit("name"), col("event_type"),
            lit("user"), col("user_id").cast("string"),
            lit("k"), regexp_extract(col("props"), "\"k\": (\\d+)", 1))
            .as("labels"))
        val path = scratchDir("graft_tsdb_compact_")
        (0 until 7).foreach { b =>
          graft.streaming.TsdbStreamIngest.writeBatch(
            long.where(pmod(col("time"), lit(7)) === b), path, b.toLong,
            timePartitions = 2)
        }
        // replayed batch (at-least-once delivery) — must be a no-op
        graft.streaming.TsdbStreamIngest.writeBatch(
          long.where(pmod(col("time"), lit(7)) === 3), path, 3L,
          timePartitions = 2)
        val stats = graft.tsdb.TsdbCompact.compact(spark, path)
        require(stats.filesAfter < stats.filesBefore,
          s"compaction did not reduce files: $stats")
        path
      })
    } match { case path => graft.tsdb.TsdbIngest.read(spark, path) }

  private val compactCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** A fresh stored copy with a TOMBSTONE-style delete applied:
    * `DeleteSeries(name="click", RangeStart..RangeEnd)` (inclusive, the
    * delete-API convention). Only files whose footer time bounds
    * intersect the range are rewritten. */
  def eventsAsTsdbDeletedStored(spark: SparkSession, sfDir: String): DataFrame =
    deletedCache.synchronized {
      deletedCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
        val path = scratchDir("graft_tsdb_del_")
        graft.tsdb.TsdbIngest.write(eventsAsTsdb(spark, sfDir), path)
        graft.tsdb.TsdbRetention.delete(spark, path,
          Seq(graft.model.Matcher.Eq("name", "click")), RangeStart, RangeEnd)
        path
      })
    } match { case path => graft.tsdb.TsdbIngest.read(spark, path) }

  private val deletedCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** A fresh stored copy with RETENTION enforced: everything before
    * RangeStart expired; files wholly below the horizon are dropped from
    * footer metadata alone. */
  def eventsAsTsdbExpiredStored(spark: SparkSession, sfDir: String): DataFrame =
    expiredCache.synchronized {
      expiredCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
        val path = scratchDir("graft_tsdb_exp_")
        graft.tsdb.TsdbIngest.write(eventsAsTsdb(spark, sfDir), path)
        val stats = graft.tsdb.TsdbRetention.expire(spark, path, RangeStart)
        require(stats.filesDropped > 0,
          s"retention should drop whole files from footer bounds alone: $stats")
        path
      })
    } match { case path => graft.tsdb.TsdbIngest.read(spark, path) }

  private val expiredCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** lineitem + orders written ONCE per (JVM, sfDir) as bucketed tables
    * (16 buckets on the join key, sorted within buckets). Joins between
    * them then need NO exchange: bucket n joins bucket n in place — the
    * co-located-join layout a 100 TB warehouse maintains for its
    * hottest fact-fact key. Registered as `graft_lineitem_b` /
    * `graft_orders_b` with data under an external /tmp path (the
    * in-memory catalog holds only metadata). */
  def bucketedFacts(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    bucketCache.synchronized {
      if (!bucketCache.contains((spark.sparkContext.applicationId, sfDir))) {
        val base = scratchDir("graft_bucket_")
        def writeBucketed(name: String, key: String): Unit =
          load(spark, sfDir, name).write
            .bucketBy(16, key).sortBy(key)
            .option("path", s"$base/$name")
            .mode("overwrite")
            .saveAsTable(s"graft_${name}_b")
        writeBucketed("lineitem", "l_orderkey")
        writeBucketed("orders", "o_orderkey")
        bucketCache((spark.sparkContext.applicationId, sfDir)) = base
      }
    }
    (spark.table("graft_lineitem_b"), spark.table("graft_orders_b"))
  }

  private val bucketCache =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** The DuckDB CTE equivalent of [[eventsAsTsdb]], prefixed to every
    * TSDB oracle query. */
  val duckTsdbCte: String =
    """WITH t AS (SELECT epoch_ms(ts) AS time, value,
      |  event_type AS "labels.name",
      |  CAST(user_id AS VARCHAR) AS "labels.user",
      |  regexp_extract(props, '"k": (\d+)', 1) AS "labels.k"
      |FROM events)""".stripMargin

  // epoch ms of 2024-01-05 / 2024-01-20 — inside the events time range
  // (2024-01-01 .. 2024-01-31) at every scale factor.
  val RangeStart: Long = 1704412800000L
  val RangeEnd: Long = 1705708800000L
}
