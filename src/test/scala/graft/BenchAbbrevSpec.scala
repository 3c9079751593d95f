package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact bench record's key abbreviation: `family_qN` prefixes
  * are only safe while unique — duplicate JSON keys silently shadow a
  * timing in most parsers, so collisions must fall back to the full
  * query name. */
class BenchAbbrevSpec extends AnyFunSuite {
  test("unique prefixes shorten; colliding keys keep their full name") {
    val keys = Seq("tsdb_q1_scan", "tsdb_q3_eq", "tsdb_q3_neq",
      "tsdb_q67_promql_range_subquery_increase", "pipe_q10_knn", "weird")
    val m = Bench.abbrevAll(keys)
    assert(m("tsdb_q1_scan") === "tsdb_q1")
    assert(m("tsdb_q67_promql_range_subquery_increase") === "tsdb_q67")
    assert(m("pipe_q10_knn") === "pipe_q10")
    assert(m("weird") === "weird") // no family_qN prefix: unchanged
    // tsdb_q3_eq / tsdb_q3_neq collide on "tsdb_q3" → full keys
    assert(m("tsdb_q3_eq") === "tsdb_q3_eq")
    assert(m("tsdb_q3_neq") === "tsdb_q3_neq")
    // the emitted JSON object has one key per query — nothing shadowed
    assert(m.values.toSeq.distinct.size === keys.size)
  }
}
