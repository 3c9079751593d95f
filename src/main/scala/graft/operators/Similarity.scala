package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - [[bruteForceKnn]]: exact baseline — broadcast the (small) probe
  *     set against the full corpus; one pass, no shuffle of the corpus,
  *     ranking via a per-probe window. Correct at any scale where the
  *     probe set is broadcastable; O(N·Q·d) compute.
  *   - [[lshKnn]]: scale path — random-hyperplane LSH buckets both sides;
  *     only bucket-colliding pairs are scored, then re-ranked exactly.
  *     Multi-probe (`tables` independent hash tables) recovers recall.
  *     At 100 TB this is a bucket-keyed join instead of a cross product.
  *
  * Scoring is [[graft.functions.VectorFunctions.cosine]] — sequential
  * double fold, reproducible in the DuckDB oracle.
  */
object Similarity {

  /** Exact top-k: for each probe row, the k nearest corpus rows by cosine
    * (self-match excluded). Deterministic tie-break on corpus id. */
  def bruteForceKnn(corpus: DataFrame, probes: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_v"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_v"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("nn_id") =!= col("probe_id"))
      .withColumn("cos", cosineNative(col("probe_v"), col("nn_v")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("nn_id"), round(col("cos"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `planes`-bit
    * buckets; candidates = bucket collisions in any table; exact cosine
    * re-rank of candidates. Recall < 1 by design; increase `tables` or
    * decrease `planes` to trade compute for recall. */
  def lshKnn(corpus: DataFrame, probes: DataFrame,
             idCol: String, vecCol: String, dim: Int, k: Int,
             planes: Int = 10, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, v: String): DataFrame =
      df.select(
        col(idCol).as(id), col(vecCol).as(v),
        posexplode(array((0 until tables).map(t =>
          // per-table independent planes: offset the plane index space
          lshBucket(col(vecCol), planes, dim, seedOffset = t * planes)): _*))
          .as(Seq("table", "bucket")))
    val c = bucketed(corpus, "nn_id", "nn_v")
    val p = bucketed(probes, "probe_id", "probe_v")
    val cand = c.join(p,
        c("table") === p("table") && c("bucket") === p("bucket") &&
          col("nn_id") =!= col("probe_id"))
      .select(col("probe_id"), col("probe_v"), col("nn_id"), col("nn_v"))
      .dropDuplicates("probe_id", "nn_id")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    cand.withColumn("cos", cosineNative(col("probe_v"), col("nn_v")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("nn_id"), round(col("cos"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF-flavored variant: assign every vector to its nearest of
    * `nCells` deterministic pseudo-random centroids (same portable-hash
    * construction as the LSH planes), search only the probe's cell.
    * The coarse quantizer of a real IVF index, minus k-means training —
    * the Spark plumbing (cell-keyed co-partitioned join) is identical. */
  def ivfKnn(corpus: DataFrame, probes: DataFrame,
             idCol: String, vecCol: String, dim: Int, k: Int,
             nCells: Int = 16, nProbe: Int = 1): DataFrame = {
    def withCell(df: DataFrame, id: String, v: String): DataFrame = {
      val sims = (0 until nCells).map(c => dot(col(vecCol), centroid(c, dim)))
      val best = sims.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
        when(s === sims.reduce((a, b) => greatest(a, b)), lit(i)).otherwise(acc)
      }
      df.select(col(idCol).as(id), col(vecCol).as(v), best.as("cell"))
    }
    val c = withCell(corpus, "nn_id", "nn_v")
    // the recall knob: each probe searches its nProbe NEAREST cells
    // (corpus vectors stay in exactly one cell, so candidates never
    // duplicate); join fan-out is nProbe × probes — still cell-keyed,
    // never a cross product. Ties rank (sim desc, cell desc), the same
    // last-max rule as the argmax assignment.
    val p =
      if (nProbe <= 1) withCell(probes, "probe_id", "probe_v")
      else {
        val sims = array(
          (0 until nCells).map(c => dot(col(vecCol), centroid(c, dim))): _*)
        probes
          .select(col(idCol).as("probe_id"), col(vecCol).as("probe_v"),
            posexplode(sims).as(Seq("cell", "_sim")))
          .withColumn("_rk", row_number().over(
            Window.partitionBy(col("probe_id"))
              .orderBy(col("_sim").desc, col("cell").desc)))
          .where(col("_rk") <= nProbe)
          .drop("_sim", "_rk")
      }
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    c.join(p, Seq("cell")).where(col("nn_id") =!= col("probe_id"))
      .withColumn("cos", cosineNative(col("probe_v"), col("nn_v")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("nn_id"), round(col("cos"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  import org.apache.spark.sql.Column
  import graft.functions.Hashing

  /** Deterministic pseudo-random centroid c (array<double> literal-free,
    * computed from the portable hash so oracles can replay it). */
  private def centroid(c: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      (pmod(Hashing.hash64(concat(lit(s"cell$c,"), j.cast("string"))), lit(2001L))
        - lit(1000L)).cast("double") / lit(1000.0))

  /** lshBucket with a seed offset so multiple tables use independent
    * plane families. */
  private def lshBucket(v: Column, planes: Int, dim: Int, seedOffset: Int): Column = {
    val vd = v.cast("array<double>")
    (0 until planes).map { pi =>
      val p = pi + seedOffset
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)), (x, j) =>
          x * ((pmod(Hashing.hash64(concat(lit(s"$p,"), j.cast("string"))), lit(2001L))
            - lit(1000L)).cast("double") / lit(1000.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << pi)).otherwise(lit(0))
    }.reduce(_ + _)
  }
}
