package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization rounds' plan-evidence artifact
  * (`plans/rNN/<query>_{before,after}.txt`). Same session config as
  * [[graft.Bench]] so the captured plans are the benched plans.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [name...]
  *   (no names ⇒ every declared query)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val fns = graft.SparkEntry.queries
    val todo = if (names.nonEmpty) names.filter(fns.contains)
               else fns.keys.toSeq.sorted
    todo.foreach { name =>
      try {
        val plan = fns(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"dumped $name")
      } catch { case NonFatal(e) =>
        System.err.println(s"$name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
