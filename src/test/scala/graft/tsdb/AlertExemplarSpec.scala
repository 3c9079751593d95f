package graft.tsdb

import graft.SparkSpec
import graft.model.Matcher
import org.apache.spark.sql.functions._

/** The alerting-rule state machine and the exemplar API. */
class AlertExemplarSpec extends SparkSpec {
  import spark.implicits._

  test("alert rule: pending on first active step, firing after `for`, reset on gap") {
    // series active at t=1000, 2000, (gap), 4000, 5000 — values over the
    // threshold; lookback = step so a skipped step really is a gap
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 10.0),
      ("up", 4000L, 10.0), ("up", 5000L, 10.0))
      .toDF("labels.name", "time", "value")
    val out = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 1000L),
      wide, start = 1000L, end = 5000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("active_at"), col("alertstate"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1000L, 1000L, "pending"),
      (2000L, 1000L, "firing"),
      (4000L, 4000L, "pending"), // the gap at 3000 reset the clock
      (5000L, 4000L, "firing")))
  }

  test("alert rule: a present-but-below-threshold step breaks the run") {
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 1.0), ("up", 3000L, 10.0))
      .toDF("labels.name", "time", "value")
    val out = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 1000L),
      wide, start = 1000L, end = 3000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("alertstate")).as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1000L, "pending"), (3000L, "pending")))
  }

  test("alert rule: `for` = 0 fires immediately (Prometheus default)") {
    val wide = Seq(("up", 1000L, 10.0)).toDF("labels.name", "time", "value")
    val out = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 0L),
      wide, start = 1000L, end = 1000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("alertstate")).as[String].collect()
    assert(out.toSeq == Seq("firing"))
  }

  test("keep_firing_for: gap rows fire with last value, runs bridge") {
    // present at 1000,2000 (firing at 2000 with for=1s), absent 3000,
    // present 4000,5000; keep_firing_for=2s → the 3000 miss emits a
    // firing row with the LAST true value and the run's active_at
    // survives the bridged gap (Prometheus keeps ActiveAt and resets
    // KeepFiringSince when the element returns)
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 12.0),
      ("up", 4000L, 14.0), ("up", 5000L, 16.0))
      .toDF("labels.name", "time", "value")
    val out = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 1000L,
        keepFiringForMs = 2000L),
      wide, start = 1000L, end = 5000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("active_at"), col("alertstate"), col("value"))
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1000L, 1000L, "pending", 10.0),
      (2000L, 1000L, "firing", 12.0),
      (3000L, 1000L, "firing", 12.0), // gap row: last value, same run
      (4000L, 1000L, "firing", 14.0), // bridged: active_at survives
      (5000L, 1000L, "firing", 16.0)))
  }

  test("keep_firing_for: window expires; a later return starts a NEW run") {
    // present 1000,2000 then gone; keep window = 2s → firing gap rows
    // at 3000 and 4000 (t - firstMiss < 2s), resolved at 5000; the
    // element returning at 6000 is a FRESH pending run
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 10.0), ("up", 6000L, 10.0))
      .toDF("labels.name", "time", "value")
    val out = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 1000L,
        keepFiringForMs = 2000L),
      wide, start = 1000L, end = 6000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("active_at"), col("alertstate"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1000L, 1000L, "pending"),
      (2000L, 1000L, "firing"),
      (3000L, 1000L, "firing"),
      (4000L, 1000L, "firing"),
      // 5000: firstMiss=3000, 5000-3000 >= 2000 → resolved, no row
      (6000L, 6000L, "pending")))
  }

  test("keep_firing_for: a PENDING element still resolves immediately") {
    val wide = Seq(("up", 1000L, 10.0), ("up", 4000L, 10.0))
      .toDF("labels.name", "time", "value")
    val out = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 5000L,
        keepFiringForMs = 60000L),
      wide, start = 1000L, end = 4000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("active_at"), col("alertstate"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // pending at 1000 clears at 2000 with NO keep-firing (only firing
    // alerts keep); 4000 is a new pending run
    assert(out.toSeq == Seq(
      (1000L, 1000L, "pending"), (4000L, 4000L, "pending")))
  }

  test("ALERTS series include keep-firing gap evals with the run's active_at") {
    // the synthesized ALERTS/ALERTS_FOR_STATE series must carry the
    // keep-firing rows too — a dashboard reading ALERTS{alertstate=
    // "firing"} sees the alert as firing THROUGH the gap
    val wide = Seq(("up", 1000L, 10.0), ("up", 2000L, 10.0))
      .toDF("labels.name", "time", "value")
    val alerts = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 1000L,
        keepFiringForMs = 2000L),
      wide, start = 1000L, end = 4000L, stepMs = 1000L, lookbackMs = 1000L)
    val samples = AlertRules.alertsAsSamples(alerts)
    val firing = samples
      .where(col("`labels.name`") === "ALERTS" &&
        col("`labels.alertstate`") === "firing")
      .select(col("time")).as[Long].collect().sorted
    assert(firing.toSeq === Seq(2000L, 3000L, 4000L)) // gap rows 3s, 4s
    val forState = samples
      .where(col("`labels.name`") === "ALERTS_FOR_STATE")
      .select(col("time"), col("value")).as[(Long, Double)].collect().toMap
    assert(forState(3000L) === 1000.0) // active_at survives the gap
  }

  test("ALERTS / ALERTS_FOR_STATE: alert state queryable through PromQL") {
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 10.0))
      .toDF("labels.name", "time", "value")
    val alerts = AlertRules.evaluate(
      AlertRules.AlertRule("hot", """{name="up"} > 5""", forMs = 1000L),
      wide, start = 1000L, end = 2000L, stepMs = 1000L, lookbackMs = 1000L)
    val samples = AlertRules.alertsAsSamples(alerts)
    // the firing-only selector — the canonical dashboard query — runs
    // through the ordinary PromQL front end over the synthesized series
    val firing = PromQL.evalRange(
      PromQL.parse("""{name="ALERTS", alertname="hot", alertstate="firing"}"""),
      samples, start = 1000L, end = 2000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("value")).as[(Long, Double)].collect().toSeq
    assert(firing == Seq((2000L, 1.0)))
    // ALERTS_FOR_STATE carries the run's active_at as the sample value
    val forState = PromQL.evalRange(
      PromQL.parse("""{name="ALERTS_FOR_STATE", alertname="hot"}"""),
      samples, start = 1000L, end = 2000L, stepMs = 1000L, lookbackMs = 1000L)
      .select(col("t"), col("value")).as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(forState == Seq((1000L, 1000.0), (2000L, 1000.0)))
  }

  test("recorded rule output persists through the storage layer and queries back") {
    // the real recording-rule lifecycle: evaluate → write the recorded
    // samples as an ordinary ingested table → later queries read the
    // STORED series through the standard scan path
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 20.0))
      .toDF("labels.name", "time", "value")
    val (recorded, _) = AlertRules.evaluateGroup(Seq(
      AlertRules.RecordingRule("up_doubled", """{name="up"} * 2""")),
      wide, start = 1000L, end = 2000L, stepMs = 1000L, lookbackMs = 1000L)
    val dir = graft.queries.Tables.scratchDir("graft_recorded")
    TsdbIngest.write(recorded.get, dir, timePartitions = 1)
    val stored = TsdbTable(TsdbIngest.read(spark, dir))
    val back = PromQL.eval(
      PromQL.parse("""{name="up_doubled"}"""),
      stored.df, at = 2000L, lookbackMs = 1000L, start = 1000L, end = 2000L)
      .select(col("time"), col("value")).as[(Long, Double)].collect().toSeq
    assert(back == Seq((2000L, 40.0)))
  }

  test("rule group: a recorded series is visible to LATER rules in the group") {
    val wide = Seq(
      ("up", 1000L, 10.0), ("up", 2000L, 20.0))
      .toDF("labels.name", "time", "value")
    val (recorded, alerts) = AlertRules.evaluateGroup(Seq(
      AlertRules.RecordingRule("up_doubled", """{name="up"} * 2"""),
      AlertRules.AlertRule("too_high", """{name="up_doubled"} > 30""",
        forMs = 0L)),
      wide, start = 1000L, end = 2000L, stepMs = 1000L, lookbackMs = 1000L)
    // the recorded frame carries the new metric name on the grid
    val rec = recorded.get
      .select(col("`labels.name`"), col("time"), col("value"))
      .as[(String, Long, Double)].collect().sortBy(_._2)
    assert(rec.toSeq == Seq(("up_doubled", 1000L, 20.0), ("up_doubled", 2000L, 40.0)))
    // the alert evaluated the RECORDED series: only the doubled 40
    // crosses 30, immediately firing (for = 0)
    val al = alerts.get.select(col("t"), col("alertstate"), col("value"))
      .as[(Long, String, Double)].collect()
    assert(al.toSeq == Seq((2000L, "firing", 40.0)))
  }

  private val samples = Seq(
    ("api", "a", 1000L, 50.0), ("api", "a", 2000L, 500.0),
    ("api", "b", 3000L, 900.0), ("web", "c", 2500L, 700.0))
    .toDF("labels.name", "labels.user", "time", "value")

  test("exemplar store: the narrow table persists and queries with pushdown") {
    // the deployment shape the scaladoc describes: exemplars live in
    // their own sorted narrow table (TsdbIngest is generic over extra
    // columns — trace_id rides along), and Exemplars.query over the
    // STORED table still reaches the parquet scan
    val wide = Seq(
      ("up", 1000L, 200.0), ("up", 2000L, 10.0), ("down", 1500L, 300.0))
      .toDF("labels.name", "time", "value")
    val ex = Exemplars.fromSamples(wide, threshold = 100.0)
    val dir = graft.queries.Tables.scratchDir("graft_exemplars")
    TsdbIngest.write(ex, dir, timePartitions = 1)
    val stored = TsdbIngest.read(spark, dir)
    assert(stored.count() == 2) // only the over-threshold samples stored
    val q = Exemplars.query(stored, Seq(Matcher.Eq("name", "up")), 0L, 5000L)
    assert(q.select(col("time"), col("value"))
      .as[(Long, Double)].collect().toSeq == Seq((1000L, 200.0)))
    val plan = q.queryExecution.executedPlan.toString()
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(`?labels\\.name`?,up".r
      .findFirstIn(plan).isDefined,
      s"stored-exemplar matcher must reach the scan:\n$plan")
  }

  test("exemplars: threshold filter + portable trace ids") {
    val ex = Exemplars.fromSamples(samples, threshold = 100.0)
    val got = ex.select(col("`labels.user`"), col("trace_id"))
      .as[(String, String)].collect().toMap
    assert(got.keySet == Set("a", "b", "c")) // the 50.0 sample is no exemplar
    // trace id replays from the driver-side constant hash
    val want = java.lang.Long.toHexString(
      graft.functions.Hashing.hash64Const("api:a:2000"))
    assert(got("a") == want)
  }

  test("exemplar query: matchers + INCLUSIVE [start, end] range") {
    val ex = Exemplars.fromSamples(samples, threshold = 100.0)
    val got = Exemplars.query(ex, Seq(Matcher.Eq("name", "api")),
        startMs = 2000L, endMs = 3000L)
      .select(col("`labels.user`")).as[String].collect().toSet
    assert(got == Set("a", "b")) // both boundary timestamps included
    assert(Exemplars.query(ex, Seq(Matcher.Eq("name", "api")),
      2001L, 2999L).count() == 0)
  }

  test("query_exemplars by EXPRESSION: every selector's exemplars union") {
    val ex = Exemplars.fromSamples(samples, threshold = 100.0)
    // the real API parameter is a full query — both selectors' exemplars
    // come back, through one OR-combined pass
    val got = Exemplars.queryExpr(ex,
      """sum by (user) (rate({name="api"}[5m])) / scalar(sum({name="web"}))""",
      0L, 5000L)
    assert(got.select(col("`labels.user`")).as[String].collect().toSet ==
      Set("a", "b", "c"))
    assert(!got.queryExecution.executedPlan.toString().contains("Union"),
      "multi-selector exemplar query must OR over one pass, not union")
    // regexes from the text surface are ANCHORED: 'a' must not match 'api'
    assert(Exemplars.queryExpr(ex, """{name=~"a"}""", 0L, 5000L).count() == 0)
    assert(Exemplars.queryExpr(ex, """{name=~"a.*"}""", 0L, 5000L)
      .count() == 2)
    intercept[IllegalArgumentException](
      Exemplars.queryExpr(ex, "1 + 2", 0L, 5000L))
  }

  test("exemplars grouped: one row per series, time-sorted struct array") {
    val ex = Exemplars.fromSamples(samples.union(
      Seq(("api", "a", 1500L, 300.0)).toDF("labels.name", "labels.user", "time", "value")),
      threshold = 100.0)
    val g = Exemplars.grouped(ex)
      .where(col("`labels.user`") === "a")
      .select(col("exemplars.time")).as[Seq[Long]].head()
    assert(g == Seq(1500L, 2000L))
  }
}
