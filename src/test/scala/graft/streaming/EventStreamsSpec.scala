package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts through the streaming engine equal the batch result") {
    val streamed = EventStreams.runToMemory(
      EventStreams.windowedCounts(EventStreams.readEvents(spark, Sf0001)),
      "es_test_windowed", mode = "complete")
    val batch = graft.queries.Tables.load(spark, Sf0001, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total_value"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"total_value")
    val s = streamed.select($"window_start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)].collect().toSet
    val b = batch.select($"window_start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(s == b)
    assert(s.nonEmpty)
  }

  test("a parsed PromQL instant query runs unchanged over the stream") {
    import graft.queries.Tables
    val q = graft.tsdb.PromQL.parse("""{name="purchase"}""")
    def ev(wide: org.apache.spark.sql.DataFrame) =
      graft.tsdb.PromQL.eval(q, wide, at = Tables.RangeEnd,
        lookbackMs = 86400000L, start = Tables.RangeStart,
        end = Tables.RangeEnd)
    val streamed = EventStreams.runToMemory(
      ev(EventStreams.readEventsWide(spark, Sf0001)),
      "es_test_promql", mode = "complete")
    val batch = ev(Tables.eventsAsTsdb(spark, Sf0001))
    val s = streamed.collect().map(_.toSeq).toSet
    assert(s === batch.collect().map(_.toSeq).toSet)
    assert(s.nonEmpty)
  }

  test("late in-watermark events extend, never truncate, an open session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "ts")
      .withColumn("event_id", lit(0L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val sessions = EventStreams.sessionize(df, gapMs = 10 * 60000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("es_test_late").start()
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    input.addData((1L, ts(0)), (1L, ts(9)))
    q.processAllAvailable()
    input.addData((1L, ts(4))) // out-of-order but within the 1 h watermark
    q.processAllAvailable()
    input.addData((1L, ts(120))) // push the watermark past the gap
    q.processAllAvailable()
    q.stop()
    val got = spark.table("es_test_late")
      .select($"n_events", $"session_start", $"session_end", $"closed")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // session_end must remain ts(9) — the late ts(4) only adds a count
    assert(got.contains((3L, ts(0).getTime, ts(9).getTime, true)), got.toString)
  }

  test("sessionize closes sessions separated by more than the gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "ts")
      .withColumn("event_id", lit(0L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val sessions = EventStreams.sessionize(df, gapMs = 60000L) // 1 min gap
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("es_test_sessions").start()
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    input.addData((1L, ts(0)), (1L, ts(0)), (1L, ts(10)), (2L, ts(0)))
    q.processAllAvailable()
    input.addData((1L, ts(120))) // advances watermark far past the gap
    q.processAllAvailable()
    q.stop()
    val got = spark.table("es_test_sessions")
      .select($"user_id", $"n_events", $"closed").as[(Long, Long, Boolean)]
      .collect().toSet
    // user 1: session {0,0} closed (gap to min10) with 2 events, then {10} closed later
    assert(got.contains((1L, 2L, true)))
    assert(got.contains((1L, 1L, true)))
    assert(got.contains((2L, 1L, true)))
  }

  private def alertInput() = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("event_type", "user_id", "ts")
      .withColumn("event_id", lit(0L))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    (input, df)
  }

  test("streaming alert: pending at the run's first window, firing at `for`, reset on a gap") {
    val (input, df) = alertInput()
    val day = 86400000L
    val d0 = 1700006400000L - (1700006400000L % day) // aligned window start
    def ts(dayIdx: Int, k: Int) =
      new java.sql.Timestamp(d0 + dayIdx * day + k * 60000L)
    val alerts = EventStreams.alertingRule(df, threshold = 1L,
      forMs = day, windowMs = day, watermark = "1 hour")
    val q = alerts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("es_test_alerts").start()
    // days 0,1 active (2 events each), day 2 quiet, day 3 active again
    input.addData(("x", 1L, ts(0, 0)), ("x", 1L, ts(0, 1)),
      ("x", 1L, ts(1, 0)), ("x", 1L, ts(1, 1)),
      ("x", 1L, ts(3, 0)), ("x", 1L, ts(3, 1)))
    q.processAllAvailable()
    // push the watermark past day 3's end so every window closes
    input.addData(("x", 9L, ts(5, 0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("es_test_alerts")
      .select($"window_start", $"active_at", $"alertstate", $"n")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (d0, d0, "pending", 2L),              // run 1 starts pending
      (d0 + day, d0, "firing", 2L),         // continuously active 1d ⇒ firing
      (d0 + 3 * day, d0 + 3 * day, "pending", 2L))) // gap reset ⇒ new pending run
  }

  test("streaming alert: windows emit only once the watermark closes them; late rows drop") {
    val (input, df) = alertInput()
    val day = 86400000L
    val d0 = 1700006400000L - (1700006400000L % day)
    def ts(dayIdx: Int, k: Int) =
      new java.sql.Timestamp(d0 + dayIdx * day + k * 60000L)
    val alerts = EventStreams.alertingRule(df, threshold = 1L,
      forMs = day, windowMs = day, watermark = "1 hour")
    val q = alerts.toDF().writeStream.outputMode("append")
      .format("memory").queryName("es_test_alerts_wm").start()
    input.addData(("x", 1L, ts(0, 0)), ("x", 1L, ts(0, 1)))
    q.processAllAvailable()
    // watermark still inside day 0 — nothing may emit yet
    assert(spark.table("es_test_alerts_wm").isEmpty)
    // advance the watermark past day 0, then send a day-0 straggler:
    // the closed window must NOT re-emit or mutate
    input.addData(("x", 9L, ts(2, 0)))
    q.processAllAvailable()
    input.addData(("x", 1L, ts(0, 2)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("es_test_alerts_wm")
      .select($"window_start", $"alertstate", $"n")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((d0, "pending", 2L)))
  }
}

class TsdbStreamIngestSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.model.Matcher
  import graft.tsdb.{TsdbIngest, TsdbTable}

  test("streaming ingest equals batch ingest (same wide table, same query)") {
    def longForm(df: org.apache.spark.sql.DataFrame) = df.select(
      unix_millis(col("ts")).as("time"), col("value"),
      map(lit("name"), col("event_type"),
        lit("user"), col("user_id").cast("string")).as("labels"))

    val out = tmpDir("tsdb_stream_out"); val ckpt = tmpDir("tsdb_stream_ckpt")
    val q = TsdbStreamIngest.start(
      longForm(EventStreams.readEvents(spark, Sf0001)), out, ckpt)
    q.processAllAvailable(); q.stop()

    val batchDir = tmpDir("tsdb_batch_out")
    TsdbIngest.write(TsdbIngest.toWide(
      longForm(graft.queries.Tables.load(spark, Sf0001, "events"))), batchDir)

    def canon(dir: String) = {
      val t = TsdbTable(TsdbIngest.read(spark, dir))
      t.regroup(t.select(Seq(Matcher.Eq("name", "purchase")))).collect()
        .map(s => (s.labels, s.ts.toList, s.v.toList)).toSet
    }
    val streamed = canon(out)
    assert(streamed.nonEmpty)
    assert(streamed == canon(batchDir))
  }

  test("writeBatch is idempotent on batchId (at-least-once replay safe)") {
    val batch = longFormStatic(graft.queries.Tables.load(spark, Sf0001, "events"))
    val out = tmpDir("tsdb_idem_out")
    TsdbStreamIngest.writeBatch(batch, out, batchId = 7L)
    val n1 = TsdbIngest.read(spark, out).count()
    TsdbStreamIngest.writeBatch(batch, out, batchId = 7L) // simulated replay
    assert(TsdbIngest.read(spark, out).count() == n1)
    TsdbStreamIngest.writeBatch(batch, out, batchId = 8L) // a NEW batch appends
    assert(TsdbIngest.read(spark, out).count() == 2 * n1)
  }

  private def longFormStatic(df: org.apache.spark.sql.DataFrame) = df.select(
    unix_millis(col("ts")).as("time"), col("value"),
    map(lit("name"), col("event_type"),
      lit("user"), col("user_id").cast("string")).as("labels"))

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventStreams.runToMemory(
      EventStreams.intervalJoin(EventStreams.readEvents(spark, Sf0001)),
      "es_test_ssjoin", mode = "append")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val e = graft.queries.Tables.load(spark, Sf0001, "events")
    val p = e.where($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"event_id".as("purchase_id"), $"ts".as("pts"))
    val c = e.where($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"), $"ts".as("cts"))
    val batch = p.join(c, $"pu" === $"cu" &&
        $"cts" >= $"pts" - expr("INTERVAL 5 MINUTES") && $"cts" <= $"pts")
      .select($"purchase_id", $"click_id", $"pu",
        unix_millis($"pts"), unix_millis($"cts"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

}
