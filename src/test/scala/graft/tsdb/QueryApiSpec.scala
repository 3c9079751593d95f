package graft.tsdb

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** parse_query / format_query: every node kind serializes to valid
  * JSON with the documented shape, and format_query is the pinned
  * canonical render. Structural assertions go through a real JSON
  * parser (json4s, shipped with Spark) — the output must be valid
  * JSON, not just a string that looks like it. */
class QueryApiSpec extends AnyFunSuite {

  private def parse(q: String): JValue =
    JsonMethods.parse(QueryApi.parseQuery(q))

  private def str(v: JValue): String =
    v.asInstanceOf[JString].s

  test("vector and matrix selectors with matchers, offset, @") {
    val v = parse("""up{job="api", code=~"5.."} offset 5m @ 1000""")
    assert(str(v \ "type") === "vectorSelector")
    assert(str(v \ "name") === "up")
    assert((v \ "offset") === JInt(300000))
    assert((v \ "timestamp") === JInt(1000000))
    val ms = (v \ "matchers").asInstanceOf[JArray].arr
    assert(ms.map(m => (str(m \ "name"), str(m \ "type"), str(m \ "value")))
      .toSet === Set(("__name__", "=", "up"), ("job", "=", "api"),
        ("code", "=~", "5..")))

    val m = parse("""rate(up[5m])""")
    assert(str(m \ "type") === "call")
    assert(str(m \ "func" \ "name") === "rate")
    val arg = (m \ "args").asInstanceOf[JArray].arr.head
    assert(str(arg \ "type") === "matrixSelector")
    assert((arg \ "range") === JInt(300000))
  }

  test("aggregation, rank, binary and subquery nodes") {
    val a = parse("""sum by (job) (up)""")
    assert(str(a \ "type") === "aggregation" && str(a \ "op") === "sum")
    assert((a \ "grouping") === JArray(List(JString("job"))))
    assert((a \ "without") === JBool(false))

    val w = parse("""avg without (instance) (up)""")
    assert((w \ "without") === JBool(true))

    val k = parse("""topk(3, up)""")
    assert(str(k \ "op") === "topk")
    assert(str((k \ "param") \ "type") === "numberLiteral")

    val b = parse("""a / on(job) group_left(env) b""")
    assert(str(b \ "type") === "binaryExpr" && str(b \ "op") === "/")
    assert(str(b \ "matching" \ "card") === "many-to-one")
    assert((b \ "matching" \ "on") === JBool(true))
    assert((b \ "matching" \ "include") === JArray(List(JString("env"))))

    val s = parse("""max_over_time(rate(up[5m])[30m:1m])""")
    val sub = (s \ "args").asInstanceOf[JArray].arr.head
    assert(str(sub \ "type") === "subquery")
    assert((sub \ "range") === JInt(1800000))
    assert((sub \ "step") === JInt(60000))
  }

  test("leading params, string functions, set ops, quoting") {
    val q = parse("""histogram_quantile(0.9, h_bucket)""")
    val args = (q \ "args").asInstanceOf[JArray].arr
    assert(str(args.head \ "type") === "numberLiteral")
    assert(str(args.head \ "val") === "0.9")

    val lr = parse("""label_replace(up, "dst", "$1", "src", "(.*)")""")
    assert((lr \ "args").asInstanceOf[JArray].arr
      .count(a => (a \ "type") == JString("stringLiteral")) === 4)

    val so = parse("""a and on(job) b""")
    assert(str(so \ "matching" \ "card") === "many-to-many")

    // label values with quotes/backslashes must escape into VALID json
    val esc = parse("""up{path="C:\\dir", msg="say \"hi\""}""")
    val vals = (esc \ "matchers").asInstanceOf[JArray].arr
      .map(m => str(m \ "value")).toSet
    assert(vals.contains("C:\\dir") && vals.contains("say \"hi\""))
  }

  test("format_query is the canonical pinned render") {
    assert(QueryApi.formatQuery("sum(rate(up [5m] ))") ===
      PromQL.render(PromQL.parse("sum(rate(up[5m]))")))
    // idempotent: formatting the formatted text is a fixed point
    val f = QueryApi.formatQuery("""topk by (job) (2, up{env!=""})""")
    assert(QueryApi.formatQuery(f) === f)
  }
}
