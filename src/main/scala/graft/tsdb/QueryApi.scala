package graft.tsdb

import graft.model.Matcher
import PromQL._

/** The query-introspection endpoints of the Prometheus 3 HTTP API:
  *
  *   - `/api/v1/format_query` — the query pretty-printed in canonical
  *     form: here [[PromQL.render]] of the parsed AST (the same
  *     normalized text the round-trip property pins).
  *   - `/api/v1/parse_query` — the query's AST as JSON, the
  *     translate-AST shape tooling consumes (node `type` +
  *     per-node fields: `vectorSelector`/`matrixSelector` with
  *     matchers, `call` with args, `aggregation` with grouping,
  *     `binaryExpr` with the vector-matching spec, `subquery`,
  *     `numberLiteral`). Times are epoch MILLISECONDS throughout,
  *     matching the engine's time axis.
  *
  * Both are driver-side string functions — they serialize the AST, no
  * data is touched.
  */
object QueryApi {

  def formatQuery(q: String): String = render(parse(q))

  def parseQuery(q: String): String = astJson(parse(q))

  // ---- AST → JSON ---------------------------------------------------

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")

  private def arr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  private def matcherJson(m: Matcher): String = {
    val (typ, value) = m match {
      case Matcher.Eq(_, v) => ("=", v)
      case Matcher.NotEq(_, v) => ("!=", v)
      case Matcher.Re(_, v) => ("=~", v)
      case Matcher.NotRe(_, v) => ("!~", v)
    }
    obj("name" -> jstr(m.name), "type" -> jstr(typ), "value" -> jstr(value))
  }

  private def atJson(atm: Option[AtAnchor]): Seq[(String, String)] =
    atm match {
      case Some(AtMs(ms)) =>
        Seq("timestamp" -> ms.toString, "startOrEnd" -> "null")
      case Some(AtStart) =>
        Seq("timestamp" -> "null", "startOrEnd" -> jstr("start"))
      case Some(AtEnd) =>
        Seq("timestamp" -> "null", "startOrEnd" -> jstr("end"))
      case None => Seq("timestamp" -> "null", "startOrEnd" -> "null")
    }

  private def selectorJson(ms: Seq[Matcher], rangeMs: Option[Long],
                           offsetMs: Long, atm: Option[AtAnchor]): String = {
    val name = ms.collectFirst {
      case Matcher.Eq("__name__", v) => v
    }.getOrElse("")
    val base = Seq(
      "type" -> jstr(rangeMs.fold("vectorSelector")(_ => "matrixSelector")),
      "name" -> jstr(name),
      "matchers" -> arr(ms.map(matcherJson)),
      "offset" -> offsetMs.toString) ++
      rangeMs.map(r => "range" -> r.toString).toSeq ++
      atJson(atm)
    obj(base: _*)
  }

  private def callJson(name: String, args: Seq[String]): String =
    obj("type" -> jstr("call"),
      "func" -> obj("name" -> jstr(name)),
      "args" -> arr(args))

  private def aggJson(op: String, expr: String, param: Option[String],
                      grouping: Seq[String], without: Boolean): String =
    obj("type" -> jstr("aggregation"), "op" -> jstr(op),
      "expr" -> expr, "param" -> param.getOrElse("null"),
      "grouping" -> arr(grouping.map(jstr)),
      "without" -> without.toString)

  private def numJson(v: Double): String =
    obj("type" -> jstr("numberLiteral"),
      "val" -> jstr(PromQL.render(ScalarLit(v))))

  private def strLit(s: String): String =
    obj("type" -> jstr("stringLiteral"), "val" -> jstr(s))

  def astJson(e: Expr): String = e match {
    case Selector(ms, range, off, atm) => selectorJson(ms, range, off, atm)
    case ScalarLit(v) => numJson(v)
    case TimeLit => callJson("time", Nil)
    case Fn(name, arg, params) =>
      // leading params render before the vector arg, as in the text form
      val leading = Set("quantile_over_time", "histogram_quantile",
        "histogram_fraction").contains(name)
      val pre = if (leading) params.map(numJson) else Nil
      val post = if (leading) Nil else params.map(numJson)
      callJson(name, pre ++ Seq(astJson(arg)) ++ post)
    case StrFn(name, arg, strs) =>
      callJson(name, astJson(arg) +: strs.map(strLit))
    case Info(arg, sel) =>
      obj("type" -> jstr("call"),
        "func" -> obj("name" -> jstr("info")),
        "args" -> arr(Seq(astJson(arg))),
        "selector" -> arr(sel.map(matcherJson)))
    case AggBy(op, by, arg, param) =>
      aggJson(op, astJson(arg), param.map(numJson), by, without = false)
    case AggWithout(op, w, arg, param) =>
      aggJson(op, astJson(arg), param.map(numJson), w, without = true)
    case CountValues(lbl, arg, by, w) =>
      aggJson("count_values", astJson(arg), Some(strLit(lbl)),
        if (w.nonEmpty) w else by, without = w.nonEmpty)
    case RankK(op, k, arg, by, w) =>
      aggJson(op, astJson(arg), Some(numJson(k.toDouble)),
        if (w.nonEmpty) w else by, without = w.nonEmpty)
    case LimitRatio(r, arg) =>
      aggJson("limit_ratio", astJson(arg), Some(numJson(r)), Nil,
        without = false)
    case Subquery(arg, range, step, off, atm) =>
      obj(Seq("type" -> jstr("subquery"), "expr" -> astJson(arg),
        "range" -> range.toString, "step" -> step.toString,
        "offset" -> off.toString) ++ atJson(atm): _*)
    case BinOp(op, on, l, r, bool, card, ign, carry) =>
      obj("type" -> jstr("binaryExpr"), "op" -> jstr(op),
        "lhs" -> astJson(l), "rhs" -> astJson(r),
        "matching" -> obj(
          "card" -> jstr(card match {
            case "left" => "many-to-one"
            case "right" => "one-to-many"
            case _ => "one-to-one"
          }),
          "labels" -> arr((if (on.nonEmpty) on else ign).map(jstr)),
          "on" -> on.nonEmpty.toString,
          "include" -> arr(carry.map(jstr))),
        "bool" -> bool.toString)
    case SetOp(op, on, l, r, ign) =>
      obj("type" -> jstr("binaryExpr"), "op" -> jstr(op),
        "lhs" -> astJson(l), "rhs" -> astJson(r),
        "matching" -> obj(
          "card" -> jstr("many-to-many"),
          "labels" -> arr((if (on.nonEmpty) on else ign).map(jstr)),
          "on" -> on.nonEmpty.toString,
          "include" -> arr(Seq.empty)))
  }
}
