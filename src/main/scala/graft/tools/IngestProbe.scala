package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-ish profiler for the ingest path: times each stage of
  * eventsAsTsdbStored separately so optimization targets facts. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // mimic the bench sequence exactly
    spark.read.parquet(s"$sfDir/region.parquet").count()
    time("warm tiny ingest (bench warmup)") {
      val tmp = java.nio.file.Files.createTempDirectory("probe_warm_").toString
      graft.tsdb.TsdbIngest.write(
        graft.queries.Tables.eventsAsTsdb(spark, sfDir).limit(2000),
        tmp, timePartitions = 2)
      spark.read.parquet(tmp).count()
    }
    val wide = graft.queries.Tables.eventsAsTsdb(spark, sfDir)
    val t3 = java.nio.file.Files.createTempDirectory("probe3_").toString
    time("ingest #1 (bench-timed path)") {
      graft.tsdb.TsdbIngest.write(wide, t3)
      spark.read.option("mergeSchema", "true").parquet(t3).count()
    }
    val t4 = java.nio.file.Files.createTempDirectory("probe4_").toString
    time("ingest #2 (steady state)") {
      graft.tsdb.TsdbIngest.write(wide, t4)
      spark.read.option("mergeSchema", "true").parquet(t4).count()
    }
    val t5 = java.nio.file.Files.createTempDirectory("probe5_").toString
    time("ingest #3 no mergeSchema read") {
      graft.tsdb.TsdbIngest.write(wide, t5)
      spark.read.parquet(t5).count()
    }
    spark.stop()
  }
}
