package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"value":…,"queries":{…},"sf":…}.
  * Each query is forced with .count() (full plan execution, no collect
  * of payload to the driver). A warmup pass on the smallest table
  * absorbs JVM/codegen startup so numbers reflect steady-state. */
object Bench {
  // Scan/join/agg/window/dedup/ANN mix — the queries whose plans carry
  // the 100 TB design decisions.
  private val headline = Seq(
    "tsdb_q1_scan", "tsdb_q2_range", "tsdb_q4_regroup",
    "tsdb_q7_range_vectors", "tsdb_q8_instant", "tsdb_q11_increase",
    "rel_q1_pricing", "rel_q2_star_join", "rel_q3_fact_join",
    "rel_q6_window", "rel_q11_asof", "rel_q16_range_join",
    "rel_q18_bucketed_join", "rel_q27_hist_sketch",
    "pipe_q1_exact_dedup", "pipe_q5_fingerprint", "pipe_q6_minhash",
    "pipe_q7_lsh_pairs", "pipe_q8_simhash", "pipe_q10_knn",
    "pipe_q21_tfidf",
    "tsdb_q32_setops", "tsdb_q34_hist_quantile", "tsdb_q35_holt_winters",
    "tsdb_q43_promql_sliding_rate", "tsdb_q48_promql_sliding_binop",
    "tsdb_q67_promql_range_subquery_increase",
    "tsdb_q69_promql_topk_by", "tsdb_q74_promql_strict_rate",
    "tsdb_q75_promql_xrate",
    "pipe_q30_packing", "pipe_q31_chunk_dedup", "pipe_q32_kmeans",
    "pipe_q33_semantic_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: JIT + codegen + parquet footer caches. One untimed pass of
    // every headline query — whole-stage codegen compiles each query's
    // generated class once (Janino), a JVM-lifetime cost that a long-
    // running cluster pays once; timing the second pass measures the
    // engine, not the compiler.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup scan FAILED: ${e.getMessage}") }
    // ...including the WRITE path (committer/codegen init is a JVM-
    // lifetime cost): warm the REAL ingest pipeline — events read (nanos
    // flag, props regexp codegen), range sampling, sort, parquet v2
    // writer — on a tiny slice, so the timed ingest measures the engine,
    // not first-touch class loading
    // Nothing before the timed loop may abort the run: round 8 lost its
    // ENTIRE bench artifact because an analysis exception in this warmup
    // escaped (testdata schema drift). A failed warmup only costs
    // first-touch noise on the affected path; a failed ingest reports -1
    // for that metric — either way the JSON line still prints.
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_warm_").toString
      graft.tsdb.TsdbIngest.write(
        graft.queries.Tables.eventsAsTsdb(spark, sfDir).limit(2000),
        tmp, timePartitions = 2)
      spark.read.parquet(tmp).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup FAILED: ${e.getMessage}")
    }

    // the tsdb_* queries read a write-once sorted materialization
    // (queries.Tables.eventsAsTsdbStored); time that ingest as its own
    // metric so query numbers measure queries, not the one-time build
    val tIngest0 = System.nanoTime()
    val ingestOk =
      try { graft.queries.Tables.eventsAsTsdbStored(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ingest FAILED: ${e.getMessage}"); false }
    val ingestSec =
      if (ingestOk) (System.nanoTime() - tIngest0) / 1e9 else -1.0

    headline.filter(SparkEntry.queries.contains).foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => }
    }

    val fns = SparkEntry.queries
    // two timed passes, keep the min — absorbs scheduler/GC noise so
    // round-over-round numbers compare the engine, not the machine
    val results = ("tsdb_ingest", ingestSec, 0L) +:
      headline.filter(fns.contains).map { name =>
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = try fns(name)(spark, sfDir).count()
                catch { case e: Throwable =>
                  System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                  -1L }
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (name, secs.map(_._1).min, secs.head._2)
    }
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // side artifact in case stdout is swallowed by a wrapper
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
