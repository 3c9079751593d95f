package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistogramSketchSpec extends SparkSpec {

  test("hist counts equal floor-binned groupBy counts (merge across partitions)") {
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .repartition(7) // force partial buffers + merges
    val got = li.agg(HistogramSketch.hist(col("l_quantity"), 0.0, 55.0, 11).as("h"))
      .select(posexplode(col("h")).as(Seq("bin", "n")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = li.groupBy(
        least(lit(10), greatest(lit(0),
          floor(col("l_quantity").cast("double") / 5.0).cast("int"))).as("bin"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((0 until 11).forall(b => got(b) == want.getOrElse(b, 0L)), s"$got vs $want")
    assert(got.values.sum == li.count())
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = HistogramSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(10.0),
      org.apache.spark.sql.catalyst.expressions.Literal(5))
    val buf = Array(3L, 0L, 7L, 1L, 9L)
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
  }

  test("graft_hist is callable from plain SQL via spark.sql.extensions") {
    // a sibling session over the same SparkContext, with extensions
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val rows = s2.sql(
        """SELECT graft_hist(x, 0.0D, 10.0D, 5) AS h FROM
          |  VALUES (1.0D), (2.9D), (9.0D), (100.0D), (-3.0D) AS t(x)""".stripMargin)
        .selectExpr("h[0]", "h[1]", "h[4]").collect().head
      // 1.0, 2.9, -3.0 (clamped) → bin 0+1; 9.0, 100.0 (clamped) → bin 4
      assert((rows.getLong(0), rows.getLong(1), rows.getLong(2)) == (2L, 1L, 2L))
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
