package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted SCALESTRESS probe for the BOUNDED-SAMPLE training claim:
  * k-means centroid training and PQ codebook training must cost the
  * same at 10x and 100x the corpus, because every per-iteration
  * aggregation scans only the deterministic bottom-`trainSample` rows
  * — the single linear cost is the one bottom-k selection scan.
  * (The full battery in [[graft.ScaleStress]] is too heavy to run at
  * 100x just to read this one row; this main isolates it.)
  *
  * Usage: `runMain graft.tools.TrainOnlyScale <sfDir> <factor>`
  * Prints the same `[scale]` rows SCALESTRESS.md records.
  */
object TrainOnlyScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = graft.queries.Tables.load(spark, sfDir, "embeddings")
    val embXN = (0 until factor).map(i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _).cache()
    println(s"[scale] corpus rows=${embXN.count()} factor=$factor")

    time(s"kmeans train-only sample=2k ${factor}x") {
      val pre = embXN.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      graft.operators.Clustering.trainCentroids(pre, k = 8, iters = 2,
        trainSample = 2000).size
    }
    time(s"pq train-only sample=2k ${factor}x") {
      val pre = embXN.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v")).persist()
      pre.count()
      val r = graft.operators.Similarity.trainCodebooks(pre, dim = 64,
        m = 2, kCodes = 4, iters = 2, trainSample = 2000).size
      pre.unpersist(); r
    }
    embXN.unpersist()
    spark.stop()
  }
}
