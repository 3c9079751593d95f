package graft.tsdb

import graft.SparkSpec

/** promtool `test rules` semantics: the upstream docs example must pass
  * verbatim (flush-left YAML style included), failures must be precise,
  * and expression tests must honor the promqltest series notation. */
class RuleTestsSpec extends SparkSpec {

  // the upstream docs alerts.yml — flush-left list style, templated
  // annotation carried verbatim
  private val alertsYml =
    """groups:
      |- name: example
      |  rules:
      |  - alert: InstanceDown
      |    expr: up == 0
      |    for: 5m
      |    labels:
      |        severity: page
      |    annotations:
      |        summary: "Instance {{ $labels.instance }} down"
      |""".stripMargin

  test("the upstream docs rules test passes verbatim") {
    val fails = RuleTests.run(spark,
      """rule_files:
        |    - alerts.yml
        |evaluation_interval: 1m
        |tests:
        |    - interval: 1m
        |      input_series:
        |          - series: 'up{job="prometheus", instance="localhost:9090"}'
        |            values: '0 0 0 0 0 0 0 0 0 0 0 0 0 0 0'
        |      alert_rule_test:
        |          - eval_time: 10m
        |            alertname: InstanceDown
        |            exp_alerts:
        |                - exp_labels:
        |                      severity: page
        |                      instance: localhost:9090
        |                      job: prometheus
        |                  exp_annotations:
        |                      summary: "Instance {{ $labels.instance }} down"
        |      promql_expr_test:
        |          - expr: count(up)
        |            eval_time: 1m
        |            exp_samples:
        |                - labels: '{}'
        |                  value: 1
        |""".stripMargin,
      Map("alerts.yml" -> alertsYml))
    assert(fails.isEmpty, fails.mkString("\n"))
  }

  test("keep_firing_for holds an alert firing through a unit test's gap") {
    // up == 0 for 3 ticks (fires at 2m with for: 2m), recovers at 3m.
    // With keep_firing_for: 3m the alert is STILL firing at 4m (first
    // miss 3m, 4m - 3m < 3m) and resolved AT the 6m boundary
    // (6m - 3m == 3m — rules/alerting.go keeps firing only while the
    // elapsed time is STRICTLY under keep_firing_for).
    val yml =
      """groups:
        |- name: g
        |  rules:
        |  - alert: StillDown
        |    expr: up == 0
        |    for: 2m
        |    keep_firing_for: 3m
        |""".stripMargin
    val fails = RuleTests.run(spark,
      """rule_files:
        |    - a.yml
        |evaluation_interval: 1m
        |tests:
        |    - interval: 1m
        |      input_series:
        |          - series: 'up{job="p"}'
        |            values: '0 0 0 1 1 1 1 1'
        |      alert_rule_test:
        |          - eval_time: 2m
        |            alertname: StillDown
        |            exp_alerts:
        |                - exp_labels:
        |                      job: p
        |          - eval_time: 4m
        |            alertname: StillDown
        |            exp_alerts:
        |                - exp_labels:
        |                      job: p
        |          - eval_time: 6m
        |            alertname: StillDown
        |            exp_alerts: []
        |""".stripMargin,
      Map("a.yml" -> yml))
    assert(fails.isEmpty, fails.mkString("; "))
  }

  test("not yet firing / wrong labels / wrong value all fail precisely") {
    def runAt(evalTime: String, expAlerts: String): Seq[RuleTests.Failure] =
      RuleTests.run(spark,
        s"""rule_files:
           |    - alerts.yml
           |tests:
           |    - interval: 1m
           |      input_series:
           |          - series: 'up{job="p"}'
           |            values: '0x14'
           |      alert_rule_test:
           |          - eval_time: $evalTime
           |            alertname: InstanceDown
           |$expAlerts
           |""".stripMargin,
        Map("alerts.yml" -> alertsYml))
    // at 4m the alert is still pending — expecting it to fire fails
    assert(runAt("4m",
      """            exp_alerts:
        |                - exp_labels:
        |                      severity: page
        |                      job: p""".stripMargin).nonEmpty)
    // at 10m it fires — expecting nothing fails...
    assert(runAt("10m", "            exp_alerts: []").nonEmpty)
    // ...and expecting the right labels passes
    assert(runAt("10m",
      """            exp_alerts:
        |                - exp_labels:
        |                      severity: page
        |                      job: p""".stripMargin).isEmpty)
    // wrong label value fails
    assert(runAt("10m",
      """            exp_alerts:
        |                - exp_labels:
        |                      severity: ticket
        |                      job: p""".stripMargin).nonEmpty)
  }

  test("promqltest notation in input_series: expansion, gaps, stale") {
    val fails = RuleTests.run(spark,
      """tests:
        |    - interval: 1m
        |      input_series:
        |          - series: 'm{user="a"}'
        |            values: '0+10x10'
        |          - series: 'm{user="b"}'
        |            values: '5 _ _ 8 stale 9'
        |      promql_expr_test:
        |          - expr: m{user="a"}
        |            eval_time: 10m
        |            exp_samples:
        |                - labels: 'm{user="a"}'
        |                  value: 100
        |          - expr: sum by (user) (m)
        |            eval_time: 3m
        |            exp_samples:
        |                - labels: '{user="a"}'
        |                  value: 30
        |                - labels: '{user="b"}'
        |                  value: 8
        |          # the stale marker at 4m hides b until its 5m sample
        |          - expr: m{user="b"}
        |            eval_time: 4m
        |            exp_samples: []
        |          - expr: m{user="b"}
        |            eval_time: 5m
        |            exp_samples:
        |                - labels: 'm{user="b"}'
        |                  value: 9
        |""".stripMargin,
      Map.empty)
    assert(fails.isEmpty, fails.mkString("\n"))
  }
}
