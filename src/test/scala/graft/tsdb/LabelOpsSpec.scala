package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PromQL label_replace/label_join edge semantics: anchoring, no-match
  * preservation, empty ⇒ removed, absent ≡ "", never-observed src. */
class LabelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def wide(rows: (Long, Double, String, String)*) =
    rows.toSeq.toDF("time", "value", "labels.env", "labels.job")

  test("label_replace: anchored match rewrites dst, no-match keeps dst") {
    val df = wide((1L, 1.0, "prod-eu", "api"), (2L, 2.0, "staging", "web"))
    val out = LabelOps.labelReplace(df, "region", "$1", "env", "prod-(.+)")
      .select(col("`labels.env`"), col("`labels.region`"))
      .as[(String, Option[String])].collect().toSet
    // "prod-eu" full-matches → region=eu; "staging" doesn't → region stays
    // absent (no prior value)
    assert(out === Set(("prod-eu", Some("eu")), ("staging", None)))
  }

  test("label_replace: NOT anchored-matching mid-string (PromQL anchors)") {
    val df = wide((1L, 1.0, "xprod-eux", "api"))
    val out = LabelOps.labelReplace(df, "region", "$1", "env", "prod-(.+)")
    // substring would match "prod-eux"; anchored must not
    assert(out.where(col("`labels.region`").isNotNull).count() === 0)
  }

  test("label_replace: empty replacement result removes the label") {
    val df = wide((1L, 1.0, "prod", "api"))
    val out = LabelOps.labelReplace(df, "env", "", "env", "prod")
    assert(out.where(col("`labels.env`").isNotNull).count() === 0)
  }

  test("label_replace: never-observed src behaves as absent ≡ \"\"") {
    val df = wide((1L, 1.0, "prod", "api"))
    // regex matching "" fires on the absent src → dst set from $0 of ""
    val out = LabelOps.labelReplace(df, "zone", "none", "datacenter", ".*")
      .select(col("`labels.zone`")).as[String].collect().toSeq
    assert(out === Seq("none"))
  }

  test("label_join keeps empty positions (no concat_ws skipping)") {
    val df = Seq((1L, 1.0, "prod", null: String), (2L, 2.0, null: String, "api"))
      .toDF("time", "value", "labels.env", "labels.job")
    val out = LabelOps.labelJoin(df, "key", ":", Seq("env", "job", "env"))
      .select(col("time"), col("`labels.key`")).as[(Long, String)]
      .collect().toMap
    assert(out === Map(1L -> "prod::prod", 2L -> ":api:"))
  }
}
