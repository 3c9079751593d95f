package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, HistogramSketch, SquaredDistance}

/** SQL-surface registration for graft's native expressions, via the
  * standard extension point:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * then `SELECT graft_cosine(a.embedding, b.embedding) ...` works in
  * plain Spark SQL (thrift server, notebooks, SQL files) with the same
  * codegen'd fused-loop expression the Scala API uses — no wrapper UDF,
  * no serialization boundary.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes two arrays")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getCanonicalName, "graft_sqdist"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_sqdist(a, b) takes two arrays")
        SquaredDistance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hist"),
      new ExpressionInfo(classOf[HistogramSketch].getCanonicalName, "graft_hist"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_hist(x, lo, hi, bins) takes four arguments")
        HistogramSketch(children(0), children(1), children(2), children(3))
      }))
  }
}
