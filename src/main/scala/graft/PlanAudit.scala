package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Plan-quality audit: dumps the formatted physical plan of every (or a
  * named subset of) SparkEntry query and flags the properties the 100 TB
  * design depends on:
  *
  *   - parquet scans should show PushedFilters + a pruned ReadSchema;
  *   - dimension joins should be BroadcastHashJoin, fact-fact joins
  *     SortMergeJoin/ShuffledHashJoin (AQE may rewrite);
  *   - expression work should sit inside WholeStageCodegen spans;
  *   - shuffle (Exchange) count is printed per query — the number to
  *     minimize, since each is a full network pass over the data at scale.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        try {
          val df = fn(spark, sfDir)
          val qe: QueryExecution = df.queryExecution
          val plan = qe.executedPlan.toString()
          val formatted = qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val exchanges = "(?m)^.*Exchange".r.findAllIn(plan).size
          val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
          // formatted mode tags codegen'd operators with "[codegen id : N]"
          val codegenSpans = "codegen id : (\\d+)".r
            .findAllMatchIn(formatted).map(_.group(1)).toSet.size
          println(formatted)
          println(s"[audit] $name: exchanges=$exchanges " +
            s"broadcastJoins=$broadcasts codegenSpans=$codegenSpans")
        } catch {
          case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
