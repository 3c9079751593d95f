package graft.tsdb

import graft.SparkSpec
import graft.model.Matcher
import org.apache.spark.sql.functions.col

/** Truth tables for P3-P9 incl. the null/empty-label cases that are the
  * top oracle-divergence risk (SURVEY.md §7). */
class MatcherCompilerSpec extends SparkSpec {
  import spark.implicits._

  // rows: (id, labels.env) with present / empty / absent label values
  private lazy val df = Seq(
    (1L, Some("prod")), (2L, Some("dev")), (3L, Some("")), (4L, None)
  ).toDF("id", "labels.env")

  private def ids(m: Matcher): Set[Long] =
    df.where(MatcherCompiler.compile(m)).select(col("id")).as[Long].collect().toSet

  test("Eq matches exact value only") {
    assert(ids(Matcher.Eq("env", "prod")) == Set(1L))
  }

  test("Eq empty-string matches absent AND empty label (Prometheus: \"\" ≡ absent)") {
    assert(ids(Matcher.Eq("env", "")) == Set(3L, 4L))
  }

  test("NotEq is NULL-aware: absent label satisfies env!=v") {
    assert(ids(Matcher.NotEq("env", "prod")) == Set(2L, 3L, 4L))
  }

  test("NotEq empty-string matches only rows where label is present+nonempty") {
    assert(ids(Matcher.NotEq("env", "")) == Set(1L, 2L))
  }

  test("Re is unanchored (substring semantics, hello.go:310-311)") {
    assert(ids(Matcher.Re("env", "ro")) == Set(1L)) // matches 'prod' unanchored
    assert(ids(Matcher.Re("env", "d")) == Set(1L, 2L))
  }

  test("Re matching empty pattern also matches absent labels") {
    assert(ids(Matcher.Re("env", ".*")) == Set(1L, 2L, 3L, 4L))
    assert(ids(Matcher.Re("env", "(dev)?")) == Set(1L, 2L, 3L, 4L))
  }

  test("NotRe is NULL-aware") {
    assert(ids(Matcher.NotRe("env", "prod")) == Set(2L, 3L, 4L))
    // pattern matching "" excludes absent/empty too
    assert(ids(Matcher.NotRe("env", ".*")) == Set())
  }

  test("conjunction of matchers (P7)") {
    val pred = MatcherCompiler.compileAll(
      Seq(Matcher.Re("env", "r"), Matcher.NotEq("env", "dev")))
    assert(df.where(pred).select(col("id")).as[Long].collect().toSet == Set(1L))
  }

  test("time range is strictly exclusive on both ends (hello.go:521-523)") {
    val t = Seq((1L, 10L), (2L, 11L), (3L, 19L), (4L, 20L))
      .toDF("id", "time")
    val got = t.where(MatcherCompiler.timeRange(10L, 20L))
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("matcher on never-observed label behaves as all-NULL column") {
    val known = Set("env")
    def idsK(m: Matcher): Set[Long] =
      df.where(MatcherCompiler.compile(m, known)).select(col("id")).as[Long].collect().toSet
    assert(idsK(Matcher.Eq("nosuch", "x")) == Set())
    assert(idsK(Matcher.Eq("nosuch", "")) == Set(1L, 2L, 3L, 4L))
    assert(idsK(Matcher.NotEq("nosuch", "x")) == Set(1L, 2L, 3L, 4L))
    assert(idsK(Matcher.Re("nosuch", "x")) == Set())
  }
}
