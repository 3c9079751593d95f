package graft.tsdb

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}

/** promtool-style RULE UNIT TESTS (`promtool test rules`) — the YAML
  * format operators use to unit-test their alerting and recording
  * rules before deploying them:
  *
  * {{{
  * rule_files:
  *   - alerts.yml
  * evaluation_interval: 1m
  * tests:
  *   - interval: 1m
  *     input_series:
  *       - series: 'up{job="prometheus"}'
  *         values: '1 1 0 0 0 0 0'
  *     alert_rule_test:
  *       - eval_time: 7m
  *         alertname: InstanceDown
  *         exp_alerts:
  *           - exp_labels:
  *               job: prometheus
  *               severity: page
  *     promql_expr_test:
  *       - expr: count(up)
  *         eval_time: 1m
  *         exp_samples:
  *           - labels: 'up{job="prometheus"}'
  *             value: 1
  * }}}
  *
  * Input series use the promqltest notation (`a+bxN`, `_` missed
  * scrape, `stale` markers) starting at t=0 on the test's interval.
  * `alert_rule_test` compares the alerts FIRING at `eval_time` (state
  * as of the last rule-evaluation tick ≤ eval_time — rules evaluate on
  * the interval grid, exactly promtool's model); annotations compare
  * VERBATIM (this engine carries rule annotations untemplated, so
  * `{{ }}` templates are compared as written). `promql_expr_test`
  * evaluates the expression as an instant query at `eval_time`.
  *
  * Batch shape: each test's input expands to ONE wide frame; each rule
  * group is one [[AlertRules.evaluateGroup]] pass over the full grid —
  * never a loop of per-tick evaluations.
  */
object RuleTests {
  import RuleFiles.Yaml
  import AlertRules.AlertRule

  /** One failed assertion: `where` names the test + case, `detail`
    * shows want vs got. An empty result = the file passes. */
  final case class Failure(where: String, detail: String)

  private val LookbackMs = 300000L // Prometheus query lookback, 5m

  /** Run every test in `testYaml`. `ruleFiles` resolves the
    * `rule_files:` names to their YAML content (promtool resolves them
    * from disk; the caller owns I/O here). */
  def run(spark: SparkSession, testYaml: String,
          ruleFiles: Map[String, String]): Seq[Failure] = {
    val top = Yaml.parse(testYaml) match {
      case Yaml.M(es) => es.toMap
      case _ => throw new IllegalArgumentException(
        "rule tests: top level must be a mapping")
    }
    val groups = top.get("rule_files") match {
      case Some(Yaml.L(names)) => names.flatMap {
        case Yaml.S(n) => RuleFiles.parse(ruleFiles.getOrElse(n,
          throw new IllegalArgumentException(
            s"rule tests: rule file $n not provided")))
        case _ => throw new IllegalArgumentException(
          "rule tests: rule_files entries must be names")
      }
      case None => Vector.empty
      case _ => throw new IllegalArgumentException(
        "rule tests: rule_files must be a list")
    }
    val defaultInterval = top.get("evaluation_interval")
      .map(s => PromQL.parseDuration(str(s))).getOrElse(60000L)
    val tests = top.get("tests") match {
      case Some(Yaml.L(ts)) => ts
      case _ => throw new IllegalArgumentException(
        "rule tests: no `tests:` list")
    }
    tests.zipWithIndex.flatMap { case (t, i) =>
      runTest(spark, asMap(t, "test"), s"test[$i]", groups, defaultInterval)
    }
  }

  private def runTest(spark: SparkSession, t: Map[String, Yaml.Node],
                      name0: String, groups: Seq[RuleFiles.Group],
                      defaultInterval: Long): Seq[Failure] = {
    val name = t.get("name").map(str).getOrElse(name0)
    val interval = t.get("interval")
      .map(s => PromQL.parseDuration(str(s))).getOrElse(defaultInterval)
    val series = t.get("input_series") match {
      case Some(Yaml.L(ss)) => ss.map { s =>
        val m = asMap(s, "input_series entry")
        (str(m.getOrElse("series", sys.error("input_series without series"))),
          str(m.getOrElse("values", sys.error("input_series without values"))))
      }
      case None => Vector.empty
      case _ => sys.error("input_series must be a list")
    }
    val wide = toWide(spark, interval, series)

    val exprFails = t.get("promql_expr_test").toSeq.flatMap {
      case Yaml.L(cs) => cs.flatMap { c =>
        val m = asMap(c, "promql_expr_test entry")
        val expr = str(m.getOrElse("expr", sys.error("expr test without expr")))
        val at = PromQL.parseDuration(str(m.getOrElse("eval_time",
          sys.error("expr test without eval_time"))))
        val want = listOf(m.get("exp_samples"), "exp_samples").map { s =>
          val sm = asMap(s, "exp_samples entry")
          (labelsOf(str(sm.getOrElse("labels", Yaml.S("{}")))),
            parseValue(str(sm.getOrElse("value",
              sys.error("exp_samples without value")))))
        }
        val got = resultRows(PromQL.evalStrict(PromQL.parse(expr), wide,
          at, LookbackMs, start = 0L, end = at))
        val gm = got.toMap
        val ok = got.size == want.size &&
          want.forall { case (ls, v) => gm.get(ls).exists(valueEq(_, v)) }
        if (ok) None
        else Some(Failure(s"$name / expr `$expr` @${at / 1000}s",
          s"want ${want.toSet}, got ${got.toSet}"))
      }
      case _ => sys.error("promql_expr_test must be a list")
    }

    val alertFails = t.get("alert_rule_test").toSeq.flatMap {
      case Yaml.L(cs) => cs.flatMap { c =>
        val m = asMap(c, "alert_rule_test entry")
        val at = PromQL.parseDuration(str(m.getOrElse("eval_time",
          sys.error("alert test without eval_time"))))
        val alertname = str(m.getOrElse("alertname",
          sys.error("alert test without alertname")))
        val want = listOf(m.get("exp_alerts"), "exp_alerts").map { a =>
          val am = asMap(a, "exp_alerts entry")
          (strMap(am.get("exp_labels")), strMap(am.get("exp_annotations")))
        }
        // rules evaluate on the interval grid; the state at eval_time is
        // the state of the last tick at or before it
        val lastTick = (at / interval) * interval
        val rules = groups.flatMap(_.rules)
        val anns = rules.collect {
          case AlertRule(n, _, _, _, _, a) if n == alertname => a
        }.headOption.getOrElse(Map.empty)
        val (_, alerts) = AlertRules.evaluateGroup(rules, wide,
          start = 0L, end = lastTick, stepMs = interval,
          lookbackMs = LookbackMs)
        val firing: Seq[Map[String, String]] = alerts match {
          case None => Vector.empty
          case Some(df) =>
            import org.apache.spark.sql.functions.col
            val rows = df.where(col("t") === lastTick &&
              col("alertname") === alertname &&
              col("alertstate") === "firing")
            val cols = rows.columns
            val skip = Set("alertname", "t", "active_at", "alertstate",
              TsdbSchema.ValueCol)
            rows.collect().toSeq.map { r =>
              cols.zipWithIndex.flatMap { case (cn, ix) =>
                if (skip(cn)) None
                else Option(r.get(ix)).map(v =>
                  (if (cn.startsWith(TsdbSchema.LabelPrefix))
                     cn.drop(TsdbSchema.LabelPrefix.length) else cn)
                    -> v.toString)
              }.toMap - "__name__"
            }
        }
        val wantSet = want.map(_._1).toSet
        val annOk = want.forall { case (_, wa) =>
          wa.forall { case (k, v) => anns.get(k).contains(v) } }
        if (firing.toSet == wantSet && firing.size == want.size && annOk) None
        else Some(Failure(s"$name / alert $alertname @${at / 1000}s",
          s"want firing ${wantSet}, got ${firing.toSet}" +
            (if (annOk) "" else s"; annotations want ${want.map(_._2)}, " +
              s"rule has $anns")))
      }
      case _ => sys.error("alert_rule_test must be a list")
    }

    exprFails ++ alertFails
  }

  // --- promqltest series notation (the upstream `load` grammar) ---

  /** `a+bxN` / `a-bxN` / `axN` expansion; `_` missed scrape; `stale`
    * marker (a NULL-value sample — the engine's staleness encoding). */
  private[tsdb] def expandValues(values: String)
      : Seq[Option[Option[Double]]] = {
    val num = """-?\d+(?:\.\d+)?(?:[eE]-?\d+)?"""
    val expand = s"^($num)(?:([+-]$num)?x(\\d+))?$$".r
    values.trim.split("\\s+").toSeq.filter(_.nonEmpty).flatMap {
      case "_" => Seq(None)
      case "stale" => Seq(Some(None))
      case "NaN" => Seq(Some(Some(Double.NaN)))
      case expand(a, d, n) if n != null =>
        val delta = Option(d).map(_.toDouble).getOrElse(0.0)
        (0 to n.toInt).map(k => Some(Some(a.toDouble + k * delta)))
      case expand(a, _, _) => Seq(Some(Some(a.toDouble)))
      case other => sys.error(s"unsupported series token: $other")
    }
  }

  /** Series selector text → its label set (incl `__name__`). */
  private def labelsOf(sel: String): Map[String, String] = {
    val name = "^[a-zA-Z_:][a-zA-Z0-9_:]*".r.findFirstIn(sel.trim)
    """([a-zA-Z_][a-zA-Z0-9_]*)="([^"]*)"""".r
      .findAllMatchIn(sel).map(m => m.group(1) -> m.group(2)).toMap ++
      name.map("__name__" -> _)
  }

  private def toWide(spark: SparkSession, stepMs: Long,
                     series: Seq[(String, String)]): DataFrame = {
    val parsed = series.map { case (sel, values) =>
      (labelsOf(sel), expandValues(values)) }
    val labelNames = parsed.flatMap(_._1.keys).distinct.sorted
    val rows = for {
      (labels, slots) <- parsed
      (slot, i) <- slots.zipWithIndex
      sample <- slot
    } yield Row.fromSeq((i * stepMs) +: sample.map(Double.box).orNull +:
      labelNames.map(n => labels.get(n).orNull))
    val schema = StructType(
      StructField(TsdbSchema.TimeCol, LongType, nullable = false) ::
        StructField(TsdbSchema.ValueCol, DoubleType, nullable = true) ::
        labelNames.map(n => StructField(TsdbSchema.labelColName(n),
          StringType, nullable = true)).toList)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2), schema)
  }

  private def resultRows(df: DataFrame): Seq[(Map[String, String], Double)] = {
    val cols = df.columns
    val nonLabel = Set(TsdbSchema.TimeCol, TsdbSchema.ValueCol, "t", "n",
      "rank", "rvalue", "bucket")
    df.collect().toSeq.map { r =>
      val labels = cols.zipWithIndex.flatMap { case (c, i) =>
        if (nonLabel.contains(c)) None
        else Option(r.get(i)).map(v =>
          (if (c.startsWith(TsdbSchema.LabelPrefix))
             c.drop(TsdbSchema.LabelPrefix.length) else c) -> v.toString)
      }.toMap
      val v = r.get(cols.indexOf(TsdbSchema.ValueCol)) match {
        case d: java.lang.Double => d.doubleValue()
        case other => other.toString.toDouble
      }
      (labels, v)
    }
  }

  private def parseValue(s: String): Double = s match {
    case "NaN" => Double.NaN
    case "Inf" | "+Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case v => v.toDouble
  }

  private def valueEq(got: Double, want: Double): Boolean =
    got == want || (got.isNaN && want.isNaN) ||
      math.abs(got - want) <= math.max(1e-6, 1e-6 * math.abs(want))

  private def asMap(n: Yaml.Node, what: String): Map[String, Yaml.Node] =
    n match {
      case Yaml.M(es) => es.toMap
      case _ => throw new IllegalArgumentException(
        s"rule tests: $what must be a mapping")
    }

  /** A block list, absent (empty), or the `[]` empty flow list. */
  private def listOf(n: Option[Yaml.Node], what: String): Vector[Yaml.Node] =
    n match {
      case None => Vector.empty
      case Some(Yaml.L(xs)) => xs
      case Some(Yaml.S("[]")) => Vector.empty
      case Some(_) => sys.error(s"rule tests: $what must be a list")
    }

  private def strMap(n: Option[Yaml.Node]): Map[String, String] = n match {
    case None => Map.empty
    case Some(Yaml.M(es)) => es.map { case (k, v) => k -> str(v) }.toMap
    case Some(_) => sys.error("expected a mapping of scalars")
  }

  private def str(n: Yaml.Node): String = n match {
    case Yaml.S(s) => s
    case _ => throw new IllegalArgumentException(
      "rule tests: expected a scalar value")
  }
}
