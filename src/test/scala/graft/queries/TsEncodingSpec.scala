package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Regression guard for the round-8 outage: the testdata generator
  * switched `events.ts` from TIMESTAMP(NANOS) (read as LongType nanos
  * behind the legacy flag) to TIMESTAMP_NTZ, which `unix_millis` rejects
  * — killing every tsdb_* query — while the streaming source's hardcoded
  * LongType schema silently misread micros as nanos (watermarks at 1970,
  * zero rows out). `Tables.normalizeTs` now canonicalizes every encoding
  * the generator has ever produced; this spec writes the SAME rows in all
  * three encodings and pins that load + windowed aggregation agree
  * exactly, batch and stream.
  */
class TsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // one day of epoch-ms points, odd values, a couple of event types
  private val rows = (0 until 500).map { i =>
    (i.toLong, 1704067200000L + i * 137000L, (i % 7).toLong,
      if (i % 3 == 0) "click" else "purchase", i * 0.5, s"""{"k": ${i % 5}}""")
  }

  /** Write the canonical rows with `ts` in the given encoding; returns a
    * directory laid out like a testdata sfDir (events.parquet inside). */
  private def writeEncoded(encoding: String): String = {
    val dir = tmpDir(s"ts_enc_$encoding")
    val base = rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
    val df = encoding match {
      case "ntz" => base.withColumn("ts",
        expr("timestamp_micros(ts_ms * 1000)").cast(TimestampNTZType))
      case "utc" => base.withColumn("ts", expr("timestamp_micros(ts_ms * 1000)"))
    }
    df.drop("ts_ms")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    // the streaming source's pathGlobFilter matches leaf FILE names, so
    // mirror the real testdata layout: a single file literally named
    // events.parquet, not a Spark output directory
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/_stage"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def windowedBatch(sfDir: String): Set[(Long, String, Long, Double)] =
    Tables.load(spark, sfDir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("tv"))
      .select(unix_millis($"window.start"), $"event_type", $"n", $"tv")
      .as[(Long, String, Long, Double)].collect().toSet

  test("load normalizes ts to TimestampType for every on-disk encoding") {
    for (enc <- Seq("ntz", "utc")) {
      val dir = writeEncoded(enc)
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"encoding=$enc left ts as ${df.schema("ts").dataType}")
      // values identical across encodings: epoch-ms round trip is exact
      assert(df.select(unix_millis($"ts")).as[Long].collect().sorted.toSeq
        == rows.map(_._2).sorted)
    }
  }

  test("a raw long ts column (legacy nanos-as-long read) normalizes too") {
    // the pre-2026-08 generator's TIMESTAMP(NANOS) surfaced as LongType
    // nanos behind spark.sql.legacy.parquet.nanosAsLong — synthesize that
    // frame shape directly and pin the shared normalization rule on it
    val longTs = rows.toDF("event_id", "ts_ms", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts_ms" * 1000000L).drop("ts_ms")
    assert(longTs.schema("ts").dataType == LongType)
    val norm = Tables.normalizeTs(longTs)
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.select(unix_millis($"ts")).as[Long].collect().sorted.toSeq
      == rows.map(_._2).sorted)
  }

  test("batch and stream agree on the windowed aggregate for each encoding") {
    val expected = windowedBatch(writeEncoded("utc"))
    assert(expected.nonEmpty)
    for (enc <- Seq("ntz", "utc")) {
      val dir = writeEncoded(enc)
      assert(windowedBatch(dir) == expected, s"batch diverged for $enc")
      val streamed = graft.streaming.EventStreams.runToMemory(
        graft.streaming.EventStreams.windowedCounts(
          graft.streaming.EventStreams.readEvents(spark, dir)),
        s"ts_enc_stream_$enc", mode = "complete")
        .select(unix_millis($"window_start"), $"event_type", $"n", $"total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed == expected, s"stream diverged for $enc")
    }
  }
}
