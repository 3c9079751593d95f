package graft.functions

import graft.SparkSpec
import graft.functions.TypedAggregators.{Span, SpanAgg}
import org.apache.spark.sql.functions._

class TypedAggregatorsSpec extends SparkSpec {

  test("SpanAgg reduce/merge agree with a single-pass fold") {
    val xs = Seq(3.5, -1.0, 7.25, 0.0, 7.25)
    val folded = xs.foldLeft(SpanAgg.zero)(SpanAgg.reduce)
    // arbitrary split point: merge of partials must equal the full fold
    val (a, b) = xs.splitAt(2)
    val merged = SpanAgg.merge(
      a.foldLeft(SpanAgg.zero)(SpanAgg.reduce),
      b.foldLeft(SpanAgg.zero)(SpanAgg.reduce))
    assert(folded == Span(-1.0, 7.25, 5L))
    assert(merged == folded)
    // zero is the merge identity
    assert(SpanAgg.merge(SpanAgg.zero, folded) == folded)
  }

  test("SpanAgg through the Dataset API matches min/max/count builtins") {
    val span = udaf(SpanAgg, org.apache.spark.sql.Encoders.scalaDouble)
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val got = li.groupBy(col("l_returnflag"))
      .agg(span(col("l_extendedprice")).as("s"))
      .select(col("l_returnflag"), col("s.min"), col("s.max"), col("s.n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val want = li.groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice")), count(lit(1)))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == want)
  }
}
