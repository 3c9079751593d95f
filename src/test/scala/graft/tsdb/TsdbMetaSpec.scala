package graft.tsdb

import graft.SparkSpec
import graft.model.Matcher

/** Metadata API semantics: `"" ≡ absent` must hold exactly — a label
  * with only empty/NULL values in the matched slice is not a label. */
class TsdbMetaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = TsdbTable(
    Seq(
      (10L, 1.0, "x", ""),
      (20L, 2.0, "y", null),
      (30L, 3.0, "x", null))
      .toDF("time", "value", "labels.a", "labels.b"))

  test("labelNames drops labels whose every value is empty or NULL") {
    val names = TsdbMeta.labelNames(t, 0L, 100L, Nil).as[String].collect().toSeq
    assert(names == Seq("a"))
  }

  test("labelValues are distinct, sorted, empty-excluded") {
    val vs = TsdbMeta.labelValues(t, "a", 0L, 100L, Nil).as[String].collect().toSeq
    assert(vs == Seq("x", "y"))
    assert(TsdbMeta.labelValues(t, "b", 0L, 100L, Nil).count() == 0)
  }

  test("series returns distinct normalized label sets, matcher-filtered") {
    val all = TsdbMeta.series(t, 0L, 100L, Nil)
      .as[(String, Option[String])].collect().toSet
    assert(all == Set(("x", None), ("y", None)))
    val matched = TsdbMeta.series(t, 0L, 100L, Seq(Matcher.Eq("a", "x")))
      .as[(String, Option[String])].collect().toSet
    assert(matched == Set(("x", None)))
  }

  test("repeated match[] selectors union over ONE scan") {
    // union semantics: the multi-selector result equals the distinct
    // union of the per-selector results (Prometheus's API contract)
    val multi = TsdbMeta.seriesAny(t, 0L, 100L,
      Seq(Seq(Matcher.Eq("a", "x")), Seq(Matcher.Eq("a", "y"))))
    assert(multi.as[(String, Option[String])].collect().toSet ==
      Set(("x", None), ("y", None)))
    // disjoint second selector contributes nothing
    assert(TsdbMeta.labelValuesAny(t, "a", 0L, 100L,
      Seq(Seq(Matcher.Eq("a", "x")), Seq(Matcher.Eq("a", "zzz"))))
      .as[String].collect().toSeq == Seq("x"))
    assert(TsdbMeta.labelNamesAny(t, 0L, 100L,
      Seq(Seq(Matcher.Eq("a", "x")), Seq(Matcher.Eq("a", "y"))))
      .as[String].collect().toSeq == Seq("a"))
    // one scan, not |selectors| — no union node in the plan
    val plan = multi.queryExecution.executedPlan.toString()
    assert(!plan.contains("Union"), s"multi-selector must OR, not union:\n$plan")
  }

  test("federate renders current samples as deterministic exposition lines") {
    val ft = TsdbTable(Seq(
      ("up", "a", 10L, 1.0), ("up", "a", 20L, 3.0), // newest wins
      ("up", null, 20L, 7.0),                       // absent label drops
      ("down", "b", 20L, 9.0))                      // unmatched series
      .toDF("labels.name", "labels.user", "time", "value"))
    val lines = Federate.federate(ft,
      Seq(Seq(Matcher.Eq("name", "up"))), at = 25L, lookbackMs = 100L)
      .as[String].collect().toSet
    assert(lines == Set("up{user=\"a\"} 3.0 20", "up{} 7.0 20"))
    // union of selectors picks up the second series too
    val both = Federate.federate(ft,
      Seq(Seq(Matcher.Eq("name", "up"), Matcher.Eq("user", "a")),
        Seq(Matcher.Eq("name", "down"))),
      at = 25L, lookbackMs = 100L).as[String].collect().toSet
    assert(both == Set("up{user=\"a\"} 3.0 20", "down{user=\"b\"} 9.0 20"))
    // out-of-lookback series federate as nothing (the staleness rule)
    assert(Federate.federate(ft, Seq(Seq(Matcher.Eq("name", "up"))),
      at = 500L, lookbackMs = 100L).count() == 0)
    // external labels (the federation-hierarchy contract): added where
    // the series lacks the label, the series' OWN value always wins
    val ext = Federate.federate(ft, Seq(Seq(Matcher.Eq("name", "up"))),
      at = 25L, lookbackMs = 100L,
      externalLabels = Seq("cluster" -> "c1", "user" -> "EXT"))
      .as[String].collect().toSet
    assert(ext == Set(
      "up{cluster=\"c1\",user=\"a\"} 3.0 20",   // user=a wins over EXT
      "up{cluster=\"c1\",user=\"EXT\"} 7.0 20")) // absent user gets EXT
  }

  test("status/tsdb cardinality stats: series universe, top-k, absent-label drop") {
    val st = TsdbTable(Seq(
      ("m1", "a", 10L, 1.0), ("m1", "a", 20L, 2.0), // same series, 2 samples
      ("m1", "b", 10L, 1.0),
      ("m2", null, 10L, 1.0), ("m2", "", 30L, 1.0)) // ""≡absent ⇒ ONE series
      .toDF("labels.name", "labels.user", "time", "value"))
    val got = TsdbStats.headStats(st, 0L, 100L, k = 2)
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(got("totals") == Map("num_series" -> 3L, "num_samples" -> 5L,
      "min_time" -> 10L, "max_time" -> 30L))
    assert(got("series_count_by_metric_name") == Map("m1" -> 2L, "m2" -> 1L))
    assert(got("label_value_count_by_label_name") ==
      Map("name" -> 2L, "user" -> 2L))
    // k=2 keeps the two highest pairs; ties break by key ascending
    assert(got("series_count_by_label_value_pair") ==
      Map("name=m1" -> 2L, "name=m2" -> 1L))
  }

  test("parseMatchers: match[] text form — anchored regexes, bare selector") {
    // Prometheus parses the match[] param with the PromQL parser and
    // anchors regex matchers; Eq/NotEq pass through untouched
    assert(PromQL.parseMatchers("""{a="x",b=~"y.*",c!~"z"}""") == Seq(
      Matcher.Eq("a", "x"), Matcher.Re("b", "^(?:y.*)$"),
      Matcher.NotRe("c", "^(?:z)$")))
    // a bare metric name is the __name__ selector
    assert(PromQL.parseMatchers("up") == Seq(Matcher.Eq("__name__", "up")))
    assert(PromQL.parseMatchers("""up{job!="api"}""") == Seq(
      Matcher.Eq("__name__", "up"), Matcher.NotEq("job", "api")))
    // anchored text ≡ the anchored engine matcher on real data
    val re = TsdbMeta.series(t, 0L, 100L,
      PromQL.parseMatchers("""{a=~"x"}"""))
    assert(re.as[(String, Option[String])].collect().toSet ==
      Set(("x", None))) // whole-string match only, never substring
    // NOT bare selectors: range, offset, @, expressions
    intercept[PromQL.ParseError](PromQL.parseMatchers("up[5m]"))
    intercept[PromQL.ParseError](PromQL.parseMatchers("up offset 5m"))
    intercept[PromQL.ParseError](PromQL.parseMatchers("up @ 100"))
    intercept[PromQL.ParseError](PromQL.parseMatchers("sum(up)"))
    intercept[PromQL.ParseError](PromQL.parseMatchers("{}"))
  }

  test("API JSON shapes: vector value pair and matrix values array") {
    val iv = Seq(("up", "a", 1500L, 2.5))
      .toDF("labels.name", "labels.user", "time", "value")
    assert(ApiJson.vectorJson(iv).as[String].collect().toSeq == Seq(
      """{"metric":{"__name__":"up","user":"a"},"value":[1.500,"2.5"]}"""))
    // matrix: per-series sorted pairs; timestamps epoch seconds with ms
    val rv = Seq(("a", 2000L, 3.0), ("a", 1000L, 1.0), ("b", 1000L, 9.0))
      .toDF("user", "t", "value")
    assert(ApiJson.matrixJson(rv).as[String].collect().toSet == Set(
      """{"metric":{"user":"a"},"values":[[1.000,"1.0"],[2.000,"3.0"]]}""",
      """{"metric":{"user":"b"},"values":[[1.000,"9.0"]]}"""))
  }
}
