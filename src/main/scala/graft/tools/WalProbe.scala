package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of tsdb_q113_wal_checkpoint (measurement-only,
  * outside the bench path): WAL write #1, checkpoint, WAL write #2,
  * the replay scan's driver dict pass, and the scan itself — so the
  * optimization round knows whether the wall time sits in the writes,
  * the checkpoint, driver-side planning, or the replay tasks.
  *
  * Usage: runMain graft.tools.WalProbe [sfDir] [passes]
  */
object WalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case scala.util.control.NonFatal(_) => }
    try graft.queries.Tables.eventsAsTsdbStored(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"ingest failed: $e") }

    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val RangeStart = graft.queries.Tables.RangeStart
    val RangeEnd = graft.queries.Tables.RangeEnd
    (1 to passes).foreach { p =>
      println(s"pass $p")
      val long = graft.queries.Tables.fanOut(
        graft.queries.Tables.load(spark, sfDir, "events")).select(
        unix_millis(col("ts")).as("time"), col("value"),
        map(lit("__name__"), col("event_type"),
          lit("user"), col("user_id").cast("string"),
          lit("k"), regexp_extract(col("props"), "\"k\": (\\d+)", 1))
          .as("labels"))
      val walDir = graft.queries.Tables.scratchDir("graft_walprobe")
      t("write1 (< RangeEnd)") {
        graft.sources.tsdbblock.TsdbWalWriter.write(
          long.where(col("time") < lit(RangeEnd)), walDir)
      }
      t("checkpoint") {
        graft.sources.tsdbblock.TsdbWalWriter.checkpoint(
          spark, walDir, keepTime = RangeStart)
      }
      t("write2 (>= RangeEnd)") {
        graft.sources.tsdbblock.TsdbWalWriter.write(
          long.where(col("time") >= lit(RangeEnd)), walDir)
      }
      t("driver dicts pass") {
        graft.sources.tsdbblock.WalReader.dicts(walDir)
      }
      val df = spark.read.format("tsdb-wal").load(walDir)
        .select(col("time"), col("value"),
          col("labels").getItem("__name__").as("name"),
          col("labels").getItem("user").as("user"),
          col("labels").getItem("k").as("k"))
      val mainThread = Thread.currentThread()
      val watcher = new Thread(() => {
        (1 to 3).foreach { i =>
          Thread.sleep(900)
          val st = mainThread.getStackTrace
          println(s"  [stack at ${i * 0.9}s] " +
            st.take(18).mkString("\n    ", "\n    ", ""))
        }
      })
      watcher.setDaemon(true)
      watcher.start()
      t("replay plan only")(df.queryExecution.executedPlan)
      t("replay count #1")(df.count())
      t("replay count #2")(df.count())
      t("raw load count")(spark.read.format("tsdb-wal").load(walDir).count())
      val segs0 = graft.sources.tsdbblock.WalReader.segments(walDir)
      t("driver serial decode") {
        segs0.map(s =>
          graft.sources.tsdbblock.WalReader.samples(s).size).sum
      }
      val segs = segs0
      println(s"  segments: ${segs.size} " +
        segs.map(s => s"${new java.io.File(s).getName}:" +
          s"${new java.io.File(s).length()}B").mkString(" "))
    }
    spark.stop()
  }
}
