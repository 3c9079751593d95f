package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Per-query measurement harness for the optimization rounds: runs the
  * named SparkEntry queries under the SAME session config as
  * [[graft.Bench]] (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus,
  * AQE on) and reports, per query, each pass's wall time plus the
  * Spark-job / stage / task counts the pass launched — the fixed
  * per-job overhead is the dominant cost at sf0.1, so the job/stage
  * count is the first number to shrink (guide §1.1: find where the
  * time goes before touching anything).
  *
  * Usage: runMain graft.tools.QueryTime [sfDir] [passes] [name...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1; tasks += sc.stageInfo.numTasks
          val i = sc.stageInfo
          val dur = (for (a <- i.completionTime; b <- i.submissionTime)
            yield a - b).getOrElse(0L)
          stageLog.add((i.name.takeWhile(_ != '\n').take(90), dur,
            i.numTasks))
        }
    })

    // mirror Bench's warmups so first-touch costs don't pollute pass 1
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case NonFatal(_) => }
    try graft.queries.Tables.eventsAsTsdbStored(spark, sfDir).count()
    catch { case NonFatal(e) => System.err.println(s"ingest failed: $e") }

    val fns = graft.SparkEntry.queries
    names.filter(fns.contains).foreach { name =>
      spark.sparkContext.setJobDescription(name)
      val times = (1 to passes).map { p =>
        // settle listener counters (listenerBus is private[spark]; a short
        // sleep after the last action is enough for job/stage events to land)
        Thread.sleep(150)
        stageLog.clear()
        val (j0, s0, t0) = (jobs, stages, tasks)
        val w0 = System.nanoTime()
        val n = try fns(name)(spark, sfDir).count()
                catch { case NonFatal(e) =>
                  System.err.println(s"$name FAILED: ${e.getMessage}"); -1L }
        val sec = (System.nanoTime() - w0) / 1e9
        Thread.sleep(150)
        println(f"$name%-40s pass$p: $sec%7.3f s  rows=$n%-8d " +
          f"jobs=${jobs - j0}%-3d stages=${stages - s0}%-4d tasks=${tasks - t0}%-5d")
        if (p == passes) {
          import scala.jdk.CollectionConverters._
          stageLog.asScala.toSeq.sortBy(-_._2).take(8).foreach {
            case (nm, dur, nt) =>
              println(f"    stage ${dur}%6d ms  tasks=$nt%-4d $nm")
          }
        }
        sec
      }
      println(f"$name%-40s min:   ${times.min}%7.3f s")
    }
    spark.stop()
  }
}
