package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** A/B probe for the block writer's shuffle shape at Nx replication:
  * runs ONLY the replicated-corpus block write (the ScaleStress
  * "tsdb block write-out" row) `passes` times, so writer variants can
  * be compared without the full battery and with burst-noise bounded
  * by min-of-N.
  *
  * Usage: runMain graft.tools.BlockWriteProbe [sfDir] [factor] [passes]
  */
object BlockWriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the ScaleStress write-out frame: Nx events, shifted users
    val ev = Tables.load(spark, sfDir, "events")
    val evN = (0 until factor).map { i =>
      ev.withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
    val long = evN.select(unix_millis(col("ts")).as("time"), col("value"),
      map(lit("__name__"), col("event_type"),
        lit("user"), col("user_id").cast("string")).as("labels"))

    long.count() // warm the scan
    (1 to passes).foreach { p =>
      val dir = Tables.scratchDir("graft_bwprobe_")
      val t0 = System.nanoTime()
      val names = graft.sources.tsdbblock.TsdbBlockWriter.write(long, dir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] block write ${factor}x pass$p: $sec%7.2f s blocks=${names.size}")
      // the blocks are never read back — drop the scratch corpus so a
      // multi-pass A/B run doesn't leak factor-scaled directories
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    spark.stop()
  }
}
