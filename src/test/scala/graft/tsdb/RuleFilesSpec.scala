package graft.tsdb

import graft.SparkSpec
import graft.tsdb.AlertRules.{AlertRule, RecordingRule}
import org.apache.spark.sql.functions._

/** Rule FILES: the YAML wire form → the rules engine. Parser cases
  * mirror the shapes real Prometheus rule files use (the upstream docs
  * example, quoting, comments, block scalars), and one end-to-end case
  * pins parse ∘ evaluate ≡ the programmatically-built group. */
class RuleFilesSpec extends SparkSpec {
  import spark.implicits._

  test("parses the upstream docs example shape") {
    val gs = RuleFiles.parse(
      """groups:
        |  - name: example
        |    interval: 30s
        |    rules:
        |      - record: job:http_requests:sum
        |        expr: sum by (job) (http_requests)
        |      - alert: HighRequestLatency
        |        expr: job:request_latency_seconds:mean5m{job="myjob"} > 0.5
        |        for: 10m
        |        labels:
        |          severity: page
        |        annotations:
        |          summary: High request latency
        |""".stripMargin)
    assert(gs === Seq(RuleFiles.Group("example", Some(30000L), Seq(
      RecordingRule("job:http_requests:sum", "sum by (job) (http_requests)"),
      AlertRule("HighRequestLatency",
        """job:request_latency_seconds:mean5m{job="myjob"} > 0.5""",
        forMs = 600000L, labels = Map("severity" -> "page"),
        annotations = Map("summary" -> "High request latency"))))))
  }

  test("quoting, comments, block scalars, multiple groups, bare-second for") {
    val gs = RuleFiles.parse(
      """# a full-line comment
        |groups:
        |  - name: "g one"   # inline comment
        |    rules:
        |      - alert: 'It''s broken'
        |        expr: |
        |          sum by (user)
        |            (errors)
        |           > 1
        |        for: 90
        |        annotations:
        |          summary: "a # hash inside quotes stays"
        |  - name: g2
        |    interval: 1h30m
        |    rules:
        |      - record: r
        |        expr: >
        |          sum
        |          (m)
        |""".stripMargin)
    assert(gs.map(_.name) === Seq("g one", "g2"))
    val a = gs.head.rules.head.asInstanceOf[AlertRule]
    assert(a.name === "It's broken")
    // `|` keeps newlines (and the parser treats them as whitespace)
    assert(a.expr === "sum by (user)\n  (errors)\n > 1")
    assert(PromQL.parse(a.expr) !== null)
    assert(a.forMs === 90000L) // bare number = seconds
    assert(a.annotations("summary") === "a # hash inside quotes stays")
    assert(gs(1).intervalMs === Some(5400000L))
    // `>` folds newlines to spaces
    assert(gs(1).rules.head.asInstanceOf[RecordingRule].expr === "sum (m)")
  }

  test("keep_firing_for parses into the alert rule (Prometheus 2.42+)") {
    val gs = RuleFiles.parse(
      """groups:
        |  - name: g
        |    rules:
        |      - alert: a
        |        expr: up
        |        for: 2m
        |        keep_firing_for: 5m
        |      - alert: b
        |        expr: up
        |""".stripMargin)
    val a = gs.head.rules.head.asInstanceOf[AlertRule]
    assert(a.forMs === 120000L && a.keepFiringForMs === 300000L)
    // absent field = 0 (resolve immediately — the pre-2.42 behavior)
    assert(gs.head.rules(1).asInstanceOf[AlertRule].keepFiringForMs === 0L)
    // a RECORDING rule cannot carry it
    val msg = intercept[IllegalArgumentException](RuleFiles.parse(
      """groups:
        |  - name: g
        |    rules:
        |      - record: r
        |        expr: up
        |        keep_firing_for: 5m
        |""".stripMargin)).getMessage
    assert(msg.contains("must not carry"))
  }

  test("loud failures: missing expr, both kinds, junk") {
    def bad(t: String): String =
      intercept[IllegalArgumentException](RuleFiles.parse(t)).getMessage
    assert(bad(
      """groups:
        |  - name: g
        |    rules:
        |      - alert: a
        |        for: 5m
        |""".stripMargin).contains("expr"))
    assert(bad(
      """groups:
        |  - name: g
        |    rules:
        |      - alert: a
        |        record: r
        |        expr: up
        |""".stripMargin).contains("not both"))
    assert(bad("rules:\n  - alert: a\n").contains("groups"))
    // a recording rule cannot carry alert-only fields
    assert(bad(
      """groups:
        |  - name: g
        |    rules:
        |      - record: r
        |        expr: up
        |        for: 5m
        |""".stripMargin).contains("must not carry"))
  }

  test("check: every problem reported, valid files come back clean") {
    assert(RuleFiles.check(
      """groups:
        |  - name: g
        |    rules:
        |      - alert: a
        |        expr: sum by (user) (up) > 1
        |        for: 5m
        |""".stripMargin) === Nil)
    val problems = RuleFiles.check(
      """groups:
        |  - name: g
        |    rules:
        |      - alert: a
        |        expr: sum by ((up)
        |      - record: 0bad
        |        expr: up
        |      - alert: b
        |        expr: up
        |      - alert: b
        |        expr: up == 0
        |  - name: g
        |    rules:
        |      - record: r
        |        expr: up
        |""".stripMargin)
    assert(problems.exists(_.contains("invalid expr")), problems)
    assert(problems.exists(_.contains("invalid recording rule name: 0bad")))
    assert(problems.exists(_.contains("duplicate alert b")))
    assert(problems.exists(_.contains("defined more than once")))
    // structural errors come back as a message, not an exception
    assert(RuleFiles.check("rules:\n  - alert: a\n").exists(
      _.contains("groups")))
  }

  test("parse + evaluate ≡ the programmatic group, rule labels attached") {
    val wide = Seq(
      (0L, 5.0, "err", "a"), (0L, 1.0, "err", "b"),
      (43200000L, 6.0, "err", "a"),
      (86400000L, 7.0, "err", "a"), (86400000L, 9.0, "err", "b"))
      .toDF("time", "value", "labels.name", "labels.user")
    val text =
      """groups:
        |  - name: g
        |    interval: 12h
        |    rules:
        |      - record: user_err
        |        expr: sum by (user) ({name="err"})
        |        labels:
        |          source: rulefile
        |      - alert: err_hot
        |        expr: '{name="user_err"} > 2'
        |        for: 12h
        |        labels:
        |          severity: page
        |""".stripMargin
    val (rec, al) = RuleFiles.evaluate(text, wide, start = 0L,
      end = 86400000L, defaultStepMs = 1L, lookbackMs = 43200000L)
    // recorded samples carry the rule label as a real label column
    val r = rec.get.select("`labels.name`", "`labels.user`",
        "`labels.source`", "time", "value")
      .as[(String, String, String, Long, Double)].collect().toSet
    assert(r === Set(
      ("user_err", "a", "rulefile", 0L, 5.0),
      ("user_err", "b", "rulefile", 0L, 1.0),
      ("user_err", "a", "rulefile", 43200000L, 6.0),
      ("user_err", "a", "rulefile", 86400000L, 7.0),
      ("user_err", "b", "rulefile", 86400000L, 9.0)))
    // alerts: `a` is active at every step (5,6,7 > 2), fires once the
    // run is 12h old; `b` activates only at 24h (9 > 2, 1 was not)
    // the rule label lands as a BARE column on the prefixed frame
    val got = al.get.select(col("alertname"), col("`labels.user`"),
        col("severity"), col("t"), col("alertstate"))
      .as[(String, String, String, Long, String)].collect().toSet
    assert(got === Set(
      ("err_hot", "a", "page", 0L, "pending"),
      ("err_hot", "a", "page", 43200000L, "firing"),
      ("err_hot", "a", "page", 86400000L, "firing"),
      ("err_hot", "b", "page", 86400000L, "pending")))
    // ≡ the same group built programmatically
    val (_, al2) = AlertRules.evaluateGroup(Seq(
      RecordingRule("user_err", """sum by (user) ({name="err"})""",
        labels = Map("source" -> "rulefile")),
      AlertRule("err_hot", """{name="user_err"} > 2""", forMs = 43200000L,
        labels = Map("severity" -> "page"))),
      wide, 0L, 86400000L, stepMs = 43200000L, lookbackMs = 43200000L)
    assert(al2.get.select(col("alertname"), col("`labels.user`"),
        col("severity"), col("t"), col("alertstate"))
      .as[(String, String, String, Long, String)].collect().toSet === got)
  }
}
