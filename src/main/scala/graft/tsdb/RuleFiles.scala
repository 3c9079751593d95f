package graft.tsdb

import org.apache.spark.sql.DataFrame

/** Prometheus RULE FILES — the YAML documents `rule_files:` points at,
  * the wire form every real rules deployment ships (reference adjacency:
  * the rules engine the reference's Prometheus dependency evaluates is
  * configured exclusively through these files):
  *
  * {{{
  * groups:
  *   - name: example
  *     interval: 1m
  *     rules:
  *       - record: job:http_requests:sum
  *         expr: sum by (job) (http_requests)
  *       - alert: HighErrors
  *         expr: job:http_requests:sum > 100
  *         for: 10m
  *         labels:
  *           severity: page
  *         annotations:
  *           summary: "too many errors"
  * }}}
  *
  * The parser covers the strict YAML SUBSET rule files actually use —
  * block maps and lists, quoted/bare scalars, `|`/`>` block scalars,
  * `#` comments — and rejects what the engine cannot honor
  * (`keep_firing_for`) rather than silently dropping it. YAML
  * anchors/aliases/flow collections are out of scope (rule files don't
  * use them). Unknown scalar keys (`limit`, future fields) are ignored,
  * matching Prometheus's permissive unmarshalling of absent features.
  */
object RuleFiles {
  import AlertRules.{AlertRule, RecordingRule, Rule}

  /** One `groups:` entry: rules evaluate sequentially (recording-rule
    * outputs visible to later rules), on the group's own interval. */
  final case class Group(name: String, intervalMs: Option[Long],
                         rules: Seq[Rule])

  /** Parse a rule file. Fails loudly on structural errors, duplicate
    * rule bodies, missing `expr`, or features the evaluator does not
    * support. */
  def parse(text: String): Seq[Group] = {
    val root = Yaml.parse(text)
    val top = root match {
      case Yaml.M(es) => es.toMap
      case _ => fail("top level must be a mapping with a `groups:` key")
    }
    val groups = top.getOrElse("groups",
      fail("rule file has no `groups:` key")) match {
      case Yaml.L(items) => items
      case _ => fail("`groups:` must be a list")
    }
    groups.map {
      case Yaml.M(es) =>
        val m = es.toMap
        val name = str(m.getOrElse("name", fail("group without `name:`")))
        val interval = m.get("interval").map(v => PromQL.parseDuration(str(v)))
        val rules = m.getOrElse("rules", fail(s"group $name has no `rules:`")) match {
          case Yaml.L(rs) => rs.map(rule(name, _))
          case _ => fail(s"group $name: `rules:` must be a list")
        }
        Group(name, interval, rules)
      case _ => fail("every `groups:` item must be a mapping")
    }
  }

  /** `promtool check rules` analog: every problem in the file, not
    * just the first — structural/YAML errors, unparseable PromQL
    * expressions (named per rule), duplicate group names, and
    * duplicate rules (same name + same labels) within a group, which
    * Prometheus warns about because they emit colliding series. An
    * empty result = the file is valid. */
  def check(text: String): Seq[String] = {
    val groups =
      try parse(text)
      catch { case e: IllegalArgumentException => return Seq(e.getMessage) }
    val dupGroups = groups.groupBy(_.name).filter(_._2.size > 1).keys.toSeq
      .sorted.map(n => s"group $n is defined more than once")
    val perRule = groups.flatMap { g =>
      g.rules.flatMap { r =>
        val (kind, rname, expr, labels) = r match {
          case AlertRule(n, e, _, _, ls, _) => ("alert", n, e, ls)
          case RecordingRule(n, e, ls) => ("record", n, e, ls)
        }
        val exprErr =
          try { PromQL.parse(expr); None }
          catch { case e: Exception => Some(
            s"group ${g.name}, $kind $rname: invalid expr: ${e.getMessage}") }
        val recordErr = r match {
          case RecordingRule(n, _, _)
              if !n.matches("[a-zA-Z_:][a-zA-Z0-9_:]*") => Some(
            s"group ${g.name}: invalid recording rule name: $n")
          case _ => None
        }
        exprErr.toSeq ++ recordErr.toSeq
      } ++
        g.rules.groupBy {
          case AlertRule(n, _, _, _, ls, _) => ("alert", n, ls)
          case RecordingRule(n, _, ls) => ("record", n, ls)
        }.filter(_._2.size > 1).keys.toSeq.sortBy(_._2).map {
          case (k, n, _) =>
            s"group ${g.name}: duplicate $k $n (same name and labels)"
        }
    }
    dupGroups ++ perRule
  }

  /** Parse + evaluate in one step: each group runs on ITS interval
    * (falling back to `defaultStepMs`), groups' outputs unioned.
    * Returns (recorded samples, alerts) like
    * [[AlertRules.evaluateGroup]]. */
  def evaluate(text: String, wide: DataFrame, start: Long, end: Long,
               defaultStepMs: Long, lookbackMs: Long)
      : (Option[DataFrame], Option[DataFrame]) = {
    val outs = parse(text).map { g =>
      AlertRules.evaluateGroup(g.rules, wide, start, end,
        g.intervalMs.getOrElse(defaultStepMs), lookbackMs)
    }
    def union(xs: Seq[Option[DataFrame]]): Option[DataFrame] =
      xs.flatten.reduceOption(_.unionByName(_, allowMissingColumns = true))
    (union(outs.map(_._1)), union(outs.map(_._2)))
  }

  private def rule(group: String, y: Yaml.Node): Rule = y match {
    case Yaml.M(es) =>
      val m = es.toMap
      val expr = str(m.getOrElse("expr", fail(s"group $group: rule without `expr:`")))
      val labels = strMap(m.get("labels"), s"group $group: labels")
      (m.get("record"), m.get("alert")) match {
        case (Some(r), None) =>
          if (m.contains("for") || m.contains("annotations") ||
              m.contains("keep_firing_for")) fail(
            s"group $group: recording rule ${str(r)} must not carry " +
              "`for:`/`keep_firing_for:`/`annotations:`")
          RecordingRule(str(r), expr, labels)
        case (None, Some(a)) =>
          AlertRule(str(a), expr,
            forMs = m.get("for").map(v => PromQL.parseDuration(str(v)))
              .getOrElse(0L),
            keepFiringForMs = m.get("keep_firing_for")
              .map(v => PromQL.parseDuration(str(v))).getOrElse(0L),
            labels = labels,
            annotations = strMap(m.get("annotations"),
              s"group $group: annotations"))
        case (Some(_), Some(_)) =>
          fail(s"group $group: a rule is either `record:` or `alert:`, not both")
        case (None, None) =>
          fail(s"group $group: rule needs `record:` or `alert:`")
      }
    case _ => fail(s"group $group: every rule must be a mapping")
  }

  private def strMap(n: Option[Yaml.Node], what: String): Map[String, String] =
    n match {
      case None => Map.empty
      case Some(Yaml.M(es)) => es.map { case (k, v) => k -> str(v) }.toMap
      case Some(_) => fail(s"$what must be a mapping of scalars")
    }

  private def str(n: Yaml.Node): String = n match {
    case Yaml.S(s) => s
    case _ => fail("expected a scalar value")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"rule file: $msg")

  /** The YAML-subset reader: indentation-structured block maps/lists,
    * single/double-quoted and bare scalars, `|` (literal) and `>`
    * (folded) block scalars, full-line and ` #` inline comments. */
  private[tsdb] object Yaml {
    sealed trait Node
    final case class M(entries: Vector[(String, Node)]) extends Node
    final case class L(items: Vector[Node]) extends Node
    final case class S(value: String) extends Node

    private final case class Line(indent: Int, text: String, raw: String)

    def parse(text: String): Node = {
      val lines = text.split("\n", -1).toVector.flatMap(prep)
      if (lines.isEmpty) return M(Vector.empty)
      val (node, next) = parseNode(lines, 0, lines.head.indent)
      if (next != lines.length)
        throw new IllegalArgumentException(
          s"rule file: unparsed content at line: ${lines(next).raw.trim}")
      node
    }

    /** Strip comments/blank lines; keep (indent, content). An inline
      * `#` only starts a comment when preceded by whitespace and not
      * inside quotes (YAML's rule, and `expr: rate(m[5m]) # doc`). */
    private def prep(raw: String): Option[Line] = {
      val noTab = raw.replace("\t", "  ")
      val indent = noTab.takeWhile(_ == ' ').length
      var inS = false; var inD = false
      var cut = noTab.length
      var j = indent
      var prevWs = true
      while (j < noTab.length && cut == noTab.length) {
        val c = noTab(j)
        if (c == '\'' && !inD) inS = !inS
        else if (c == '"' && !inS) inD = !inD
        else if (c == '#' && !inS && !inD && prevWs) cut = j
        prevWs = c == ' '
        j += 1
      }
      val content = noTab.substring(indent, cut).replaceAll("\\s+$", "")
      if (content.isEmpty) None else Some(Line(indent, content, raw))
    }

    private def parseNode(ls: Vector[Line], pos: Int, indent: Int)
        : (Node, Int) =
      if (ls(pos).text.startsWith("- ") || ls(pos).text == "-")
        parseList(ls, pos, ls(pos).indent)
      else parseMap(ls, pos, ls(pos).indent)

    private def parseList(ls: Vector[Line], pos0: Int, indent: Int)
        : (Node, Int) = {
      var pos = pos0
      val items = Vector.newBuilder[Node]
      while (pos < ls.length && ls(pos).indent == indent &&
             (ls(pos).text.startsWith("- ") || ls(pos).text == "-")) {
        val inline = ls(pos).text.drop(1).dropWhile(_ == ' ')
        if (inline.isEmpty) {
          // `-` alone: the item is the deeper-indented node below
          if (pos + 1 >= ls.length || ls(pos + 1).indent <= indent)
            throw new IllegalArgumentException(
              "rule file: empty list item")
          val (n, next) = parseNode(ls, pos + 1, ls(pos + 1).indent)
          items += n; pos = next
        } else if (keyColonOpt(inline).isEmpty) {
          // `- alerts.yml`: a bare scalar list item
          items += S(unquote(inline)); pos += 1
        } else {
          // `- key: …` starts a map whose first entry sits on this line
          // at virtual indent (indent + 2); splice it in
          val virt = Line(indent + 2, inline, ls(pos).raw)
          val (n, next) = parseNode(virt +: ls.drop(pos + 1), 0, indent + 2)
          items += n; pos = pos + next // virt consumed 1 of the spliced view
        }
      }
      (L(items.result()), pos)
    }

    private def parseMap(ls: Vector[Line], pos0: Int, indent: Int)
        : (Node, Int) = {
      var pos = pos0
      val entries = Vector.newBuilder[(String, Node)]
      while (pos < ls.length && ls(pos).indent == indent &&
             !ls(pos).text.startsWith("- ") && ls(pos).text != "-") {
        val t = ls(pos).text
        val ci = keyColon(t)
        val key = unquote(t.substring(0, ci).trim)
        val rest = t.substring(ci + 1).trim
        if (rest == "|" || rest == ">") {
          val (s, next) = blockScalar(ls, pos + 1, indent, folded = rest == ">")
          entries += key -> S(s); pos = next
        } else if (rest.nonEmpty) {
          entries += key -> S(unquote(rest)); pos += 1
        } else if (pos + 1 < ls.length && (ls(pos + 1).indent > indent ||
            // YAML allows a list at the SAME indent as its parent key
            // (`groups:` then flush-left `- name: …`) — unambiguous,
            // since map entries never start with `-`
            (ls(pos + 1).indent == indent &&
              (ls(pos + 1).text.startsWith("- ") ||
                ls(pos + 1).text == "-")))) {
          val (n, next) = parseNode(ls, pos + 1, ls(pos + 1).indent)
          entries += key -> n; pos = next
        } else {
          entries += key -> S(""); pos += 1
        }
      }
      (M(entries.result()), pos)
    }

    /** `|` keeps newlines, `>` folds them to spaces — both end at the
      * first line not indented deeper than the key. */
    private def blockScalar(ls: Vector[Line], pos0: Int, keyIndent: Int,
                            folded: Boolean): (String, Int) = {
      var pos = pos0
      val out = Vector.newBuilder[String]
      // YAML block scalars preserve indentation RELATIVE to the first
      // block line (the block's base indent)
      val base = if (pos < ls.length) ls(pos).indent else 0
      while (pos < ls.length && ls(pos).indent > keyIndent) {
        out += (" " * math.max(0, ls(pos).indent - base)) + ls(pos).text
        pos += 1
      }
      (out.result().mkString(if (folded) " " else "\n"), pos)
    }

    /** Find the `:` that ends the key (the first one outside quotes
      * followed by space/EOL). */
    private def keyColonOpt(t: String): Option[Int] = {
      var inS = false; var inD = false
      var j = 0
      while (j < t.length) {
        val c = t(j)
        if (c == '\'' && !inD) inS = !inS
        else if (c == '"' && !inS) inD = !inD
        else if (c == ':' && !inS && !inD &&
                 (j + 1 == t.length || t(j + 1) == ' ')) return Some(j)
        j += 1
      }
      None
    }

    private def keyColon(t: String): Int = keyColonOpt(t).getOrElse(
      throw new IllegalArgumentException(
        s"rule file: expected `key: value`, got: $t"))

    /** Double quotes honor \\ \" \n \t escapes; single quotes are
      * literal with `''` → `'`; bare scalars pass through trimmed. */
    private def unquote(s: String): String =
      if (s.length >= 2 && s.head == '"' && s.last == '"') {
        val b = new StringBuilder
        var j = 1
        while (j < s.length - 1) {
          val c = s(j)
          if (c == '\\' && j + 1 < s.length - 1) {
            s(j + 1) match {
              case 'n' => b.append('\n'); case 't' => b.append('\t')
              case o => b.append(o)
            }
            j += 2
          } else { b.append(c); j += 1 }
        }
        b.toString
      } else if (s.length >= 2 && s.head == '\'' && s.last == '\'')
        s.substring(1, s.length - 1).replace("''", "'")
      else s
  }
}
