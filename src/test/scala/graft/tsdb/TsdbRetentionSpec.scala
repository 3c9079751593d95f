package graft.tsdb

import graft.SparkSpec
import graft.model.Matcher
import org.apache.spark.sql.functions._

/** Tombstone delete + retention: footer-bounds file triage (untouched /
  * dropped / rewritten), matcher semantics shared with the query tier,
  * contents ≡ the SQL DELETE model. */
class TsdbRetentionSpec extends SparkSpec {
  import spark.implicits._

  // 4 time slices of 100 rows each: times 0..399, name=m<t%2>, and an
  // `env` label present only on odd times (absent ≡ "" semantics)
  private def freshTable(): String = {
    val path = tmpDir("retention_")
    val long = (0 until 400).map { t =>
      (t.toLong, t.toDouble,
        Map("name" -> s"m${t % 2}") ++
          (if (t % 2 == 1) Map("env" -> "prod") else Map.empty))
    }.toDF("time", "value", "labels")
    TsdbIngest.write(TsdbIngest.toWide(long), path, timePartitions = 4)
    path
  }

  test("expire drops whole files from footer bounds; boundary file rewritten") {
    val path = freshTable()
    val stats = TsdbRetention.expire(spark, path, keepFromMs = 150L)
    assert(stats.filesDropped >= 1, s"whole slices below horizon: $stats")
    assert(stats.filesUntouched >= 1, s"slices above horizon untouched: $stats")
    assert(stats.rowsDeleted === 150)
    val times = TsdbIngest.read(spark, path).select("time").as[Long].collect()
    assert(times.length === 250 && times.min === 150L)
  }

  test("matcher delete rewrites only intersecting files, survivors exact") {
    val path = freshTable()
    val stats = TsdbRetention.delete(spark, path,
      Seq(Matcher.Eq("name", "m0")), startMs = 100L, endMs = 299L)
    assert(stats.filesUntouched >= 1, s"non-intersecting slices untouched: $stats")
    assert(stats.filesDropped === 0, "matcher deletes can never whole-file drop")
    assert(stats.rowsDeleted === 100) // even times in [100, 299]
    val got = TsdbIngest.read(spark, path)
      .select(col("time"), col("`labels.name`"))
      .as[(Long, String)].collect().toSet
    val want = (0 until 400).collect {
      case t if !(t % 2 == 0 && t >= 100 && t <= 299) => (t.toLong, s"m${t % 2}")
    }.toSet
    assert(got === want)
  }

  test("NULL-aware matcher: NotEq deletes absent-label rows too") {
    val path = freshTable()
    // env!="staging" matches rows where env is absent (Prometheus rule) —
    // i.e. EVERY row here (present ones are "prod" ≠ "staging")
    val stats = TsdbRetention.delete(spark, path,
      Seq(Matcher.NotEq("env", "staging")), 0L, 399L)
    assert(stats.rowsDeleted === 400)
    assert(TsdbIngest.read(spark, path).count() === 0)
  }

  test("delete over a never-observed label name follows all-NULL semantics") {
    val path = freshTable()
    // zone="x" can match nothing (no row carries zone) — table unchanged
    val s1 = TsdbRetention.delete(spark, path, Seq(Matcher.Eq("zone", "x")), 0L, 399L)
    assert(s1.rowsDeleted === 0)
    assert(TsdbIngest.read(spark, path).count() === 400)
  }
}
