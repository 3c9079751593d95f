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
      // each centroid dot evaluates ONCE per row: the argmax is the
      // lexicographic max of (sim, cell) structs — the same last-max
      // tie rule as a when-chain, without re-evaluating the
      // (interpreted, higher-order) dot products O(nCells²) times
      val simArr = array(
        (0 until nCells).map(c =>
          dotNative(col(vecCol), centroid(c, dim))): _*)
      val best = array_max(zip_with(simArr,
        sequence(lit(0), lit(nCells - 1)),
        (s, i) => struct(s.as("s"), i.as("i"))))("i")
      df.select(col(idCol).as(id), col(vecCol).as(v),
        best.cast("int").as("cell"))
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
          (0 until nCells).map(c =>
            dotNative(col(vecCol), centroid(c, dim))): _*)
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

  /** The portable unit-interval coordinate: (hash64(s) mod 2001 − 1000)
    * / 1000 ∈ [−1, 1], computed ONCE on the driver
    * ([[graft.functions.Hashing.hash64Const]]): the centroid/plane
    * coordinates are pure functions of literals, but a Catalyst
    * `transform` over md5 expressions is NOT constant-folded — the
    * expression form recomputed a full md5 battery per ROW (billions of
    * md5 calls at a 200k-vector corpus). Literal arrays keep the oracle
    * contract (DuckDB derives identical values from the same formula)
    * at zero per-row hashing cost. */
  private def unitVal(s: String): Double =
    ((graft.functions.Hashing.hash64Const(s) % 2001L) - 1000L)
      .toDouble / 1000.0

  /** Deterministic pseudo-random centroid c, as a literal array (the
    * oracle replays the same md5 formula in SQL). */
  private def centroid(c: Int, dim: Int): Column =
    array((0 until dim).map(j => lit(unitVal(s"cell$c,$j"))): _*)

  /** lshBucket with a seed offset so multiple tables use independent
    * plane families; plane coordinates are literal arrays (see
    * [[hash64Const]]). */
  private def lshBucket(v: Column, planes: Int, dim: Int, seedOffset: Int): Column = {
    val vd = v.cast("array<double>")
    (0 until planes).map { pi =>
      val p = pi + seedOffset
      val plane = array((0 until dim).map(j => lit(unitVal(s"$p,$j"))): _*)
      val proj = dotNative(vd, plane)
      when(proj >= 0, lit(1 << pi)).otherwise(lit(0))
    }.reduce(_ + _)
  }
}
