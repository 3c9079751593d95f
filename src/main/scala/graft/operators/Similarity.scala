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

  /** PRODUCT-QUANTIZATION ANN (PQ + ADC) — the compressed-vector scale
    * path real vector stores run when even the raw vectors are too big
    * to score: the vector splits into `m` subspaces, each k-means
    * quantized to `kCodes` codewords (deterministic Lloyd per subspace —
    * the [[Clustering]] recipe: portable-hash bootstrap, 6dp-rounded
    * means, first-match argmin ties); the corpus then lives as m small
    * CODES. A query scores by Asymmetric Distance Computation: its
    * per-subspace distance TABLE to every codeword is computed ONCE on
    * the driver (m·kCodes doubles, baked into the plan as literals),
    * and each corpus row costs m array lookups + adds — no vector
    * arithmetic in the hot path, the 100 TB trick that makes
    * billion-vector search scan-bound instead of FLOP-bound.
    *
    * Scale shape: training collects kCodes·dim bootstrap doubles plus
    * m·kCodes·(dim/m) means per iteration (centroid-sized exchanges);
    * encoding is ONE map pass (codes never shuffle); probes collect to
    * the driver (the broadcast-probe contract every knn here shares);
    * scoring fans each corpus row to the probe count map-side; ranking
    * is the usual per-probe k-window. Approximation error follows the
    * quantization — the documented PQ tradeoff (rank by `adist`, the
    * approximate squared L2).
    *
    * Output: (probe_id, nn_id, adist, rank), rank ≤ `topK` per probe,
    * ties on (adist, nn_id), self-matches excluded. */
  def pqKnn(corpus: DataFrame, probes: DataFrame,
            idCol: String, vecCol: String, dim: Int, m: Int,
            kCodes: Int, iters: Int, topK: Int,
            trainSample: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    // NOT persisted: training is sample-bounded (its own bounded
    // persist lives inside trainCodebooks), so the projection is read
    // lazily twice (bottom-k scan + encode) — two cheap map passes beat
    // pinning a corpus-sized frame in the block manager with no owner
    // to unpersist it. Callers wanting the write-once materialization
    // persist the corpus themselves.
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val codebooks = trainCodebooks(base, dim, m, kCodes, iters, trainSample)
    val encoded = base.select(col("id").as("nn_id"),
      array(pqCodeCols(codebooks, sub): _*).as("codes"))

    // ADC tables: per probe, the m·kCodes distances to every codeword,
    // computed on the DRIVER with the same left-to-right fold as the
    // SQL oracle's list_sum (bit-identical doubles)
    val probeRows = probes.select(col(idCol).cast("long"),
      col(vecCol).cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
      .sortBy(_._1)
    val tabs = probeRows.map(p => adcTable(codebooks, sub, p._2))
    val tabsLit = array(tabs.map(t => array(t.map(lit): _*)): _*)
    val pidsLit = array(probeRows.map(p => lit(p._1)): _*)

    // one fan-out pass: each corpus row scores against every probe via
    // table lookups (codegen'd adds — no vector math here)
    val adist = (0 until m).map { j =>
      element_at(col("tab"),
        lit(j * kCodes + 1) + element_at(col("codes"), j + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("nn_id").asc)
    encoded
      .select(col("nn_id"), col("codes"),
        posexplode(tabsLit).as(Seq("pidx", "tab")))
      .withColumn("probe_id", element_at(pidsLit, col("pidx") + 1))
      .where(col("nn_id") =!= col("probe_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("nn_id"),
        round(col("adist"), 6).as("adist"), col("rank").cast("long").as("rank"))
  }

  /** IVF + PQ — the COMPOSITION a production vector store runs at
    * billion-vector scale: the IVF coarse quantizer prunes candidates
    * (each corpus vector lives in one of `nCells` cells; a probe
    * searches its `nProbe` nearest cells), and PQ compresses what gets
    * scored (candidates cost m table lookups each, never vector math).
    * Global codebooks over the raw vectors (the simple IVF-PQ variant;
    * classic residual-PQ refines per cell — same plumbing, different
    * training input). One cell-keyed broadcast equi-join carries the
    * per-probe ADC tables — candidates are Σ probes × |probed cells|,
    * never corpus × probes. */
  def ivfPqKnn(corpus: DataFrame, probes: DataFrame,
               idCol: String, vecCol: String, dim: Int, nCells: Int,
               nProbe: Int, m: Int, kCodes: Int, iters: Int,
               topK: Int, trainSample: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    // not persisted — see pqKnn: sample-bounded training owns its own
    // cache; a leaked corpus-sized block-manager entry is the wrong
    // default at any scale
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val codebooks = trainCodebooks(base, dim, m, kCodes, iters, trainSample)

    // cell argmax — the ivfKnn rule (lexicographic struct max: ties
    // pick the LARGEST cell index)
    val simArr = array((0 until nCells).map(c =>
      dotNative(col("v"), centroid(c, dim))): _*)
    val cellCol = array_max(zip_with(simArr,
      sequence(lit(0), lit(nCells - 1)),
      (s, i) => struct(s.as("s"), i.as("i"))))("i").cast("int")
    val encoded = base.select(col("id").as("nn_id"), cellCol.as("cell"),
      array(pqCodeCols(codebooks, sub): _*).as("codes"))

    // probes on the driver: nProbe nearest cells by (dot desc, cell
    // desc — the same last-max tie rule) + the ADC table, shipped as a
    // tiny broadcast frame keyed on cell
    val probeRows = probes.select(col(idCol).cast("long"),
      col(vecCol).cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
      .sortBy(_._1)
    def dot(a: Seq[Double], c: Int): Double = {
      var acc = 0.0; var j = 0
      while (j < a.length) { acc += a(j) * unitVal(s"cell$c,$j"); j += 1 }
      acc
    }
    val probePairs = probeRows.toSeq.flatMap { case (pid, pv) =>
      val cells = (0 until nCells).map(c => (dot(pv, c), c))
        .sortBy { case (s, c) => (-s, -c) }.take(nProbe).map(_._2)
      val tab = adcTable(codebooks, sub, pv)
      cells.map(c => (pid, c, tab))
    }
    val probeDf = probePairs.toDF("probe_id", "cell", "tab")

    val adist = (0 until m).map { j =>
      element_at(col("tab"),
        lit(j * kCodes + 1) + element_at(col("codes"), j + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("nn_id").asc)
    encoded.join(broadcast(probeDf), Seq("cell"))
      .where(col("nn_id") =!= col("probe_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("nn_id"),
        round(col("adist"), 6).as("adist"), col("rank").cast("long").as("rank"))
  }

  /** IVFADC with RESIDUAL encoding — the classic composition of
    * Jégou/Douze/Schmid's "Product Quantization for Nearest Neighbor
    * Search" (TPAMI 2011, §IV-A): each vector is PQ-coded on its
    * RESIDUAL `v − c(cell)` rather than on `v` itself, and a probe's
    * ADC table is computed PER PROBED CELL on the probe's own residual
    * `q − c(cell)`. Residuals concentrate around the origin (the cell
    * centroid absorbs the coarse geometry), so the same kCodes
    * codewords quantize a much tighter distribution — the recall gain
    * residual coding is for. The residual codebook is SHARED across
    * cells (the paper's memory-efficient choice; per-cell codebooks
    * are the locally-optimized variant — same plumbing, nCells× the
    * training). Scale shape is [[ivfPqKnn]]'s: encoding is one map
    * pass (the centroid subtraction is a literal-array `zip_with`),
    * training is sample-bounded over residuals, candidates are one
    * cell-keyed broadcast equi-join carrying probe-residual tables —
    * Σ probes × nProbe cells, never corpus × probes. */
  def ivfPqResidualKnn(corpus: DataFrame, probes: DataFrame,
                       idCol: String, vecCol: String, dim: Int,
                       nCells: Int, nProbe: Int, m: Int, kCodes: Int,
                       iters: Int, topK: Int,
                       trainSample: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = array((0 until nCells).map(c => centroid(c, dim)): _*)
    val raw = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val simArr = array((0 until nCells).map(c =>
      dotNative(col("v"), centroid(c, dim))): _*)
    val cellCol = array_max(zip_with(simArr,
      sequence(lit(0), lit(nCells - 1)),
      (s, i) => struct(s.as("s"), i.as("i"))))("i").cast("int")
    // residual base: one map pass, centroids are literal arrays; not
    // persisted (see pqKnn) — recomputing the subtraction on the encode
    // scan beats an unowned corpus-sized cache entry
    val resid = raw.withColumn("cell", cellCol)
      .select(col("id"), col("cell"),
        zip_with(col("v"), element_at(cents, col("cell") + 1),
          (x, c) => x - c).as("v"))
    val codebooks =
      trainCodebooks(resid.select(col("id"), col("v")), dim, m, kCodes,
        iters, trainSample)
    val encoded = resid.select(col("id").as("nn_id"), col("cell"),
      array(pqCodeCols(codebooks, sub): _*).as("codes"))

    val probeRows = probes.select(col(idCol).cast("long"),
      col(vecCol).cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
      .sortBy(_._1)
    def dot(a: Seq[Double], c: Int): Double = {
      var acc = 0.0; var j = 0
      while (j < a.length) { acc += a(j) * unitVal(s"cell$c,$j"); j += 1 }
      acc
    }
    // one ADC table PER (probe, probed cell), over the probe's residual
    val probePairs = probeRows.toSeq.flatMap { case (pid, pv) =>
      val cells = (0 until nCells).map(c => (dot(pv, c), c))
        .sortBy { case (sim, c) => (-sim, -c) }.take(nProbe).map(_._2)
      cells.map { c =>
        val pr = pv.indices.map(j => pv(j) - unitVal(s"cell$c,$j"))
          .toIndexedSeq
        (pid, c, adcTable(codebooks, sub, pr))
      }
    }
    val probeDf = probePairs.toDF("probe_id", "cell", "tab")

    val adist = (0 until m).map { j =>
      element_at(col("tab"),
        lit(j * kCodes + 1) + element_at(col("codes"), j + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist").asc, col("nn_id").asc)
    encoded.join(broadcast(probeDf), Seq("cell"))
      .where(col("nn_id") =!= col("probe_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("nn_id"),
        round(col("adist"), 6).as("adist"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic per-subspace Lloyd over a BOUNDED training sample:
    * portable-hash bootstrap (ONE kCodes·dim collect, sliced per
    * subspace), 6dp-rounded means each iteration, first-match argmin
    * ties — [[graft.operators.Clustering]]'s recipe applied m times
    * over `slice(v)`. The m × iters mean-aggregation passes scan only
    * the deterministic bottom-`trainSample` rows by (portable hash,
    * id) — [[Clustering.defaultTrainSample]] when `trainSample <= 0` —
    * so at 100 TB training cost is FLAT in corpus size (one linear
    * bottom-k scan selects the sample; everything after is
    * sample-sized). The bootstrap is the sample's own (h, id) prefix. */
  private[graft] def trainCodebooks(base: DataFrame, dim: Int, m: Int,
                             kCodes: Int, iters: Int,
                             trainSample: Int = 0)
      : IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val sub = dim / m
    val n = math.max(if (trainSample > 0) trainSample
                     else Clustering.defaultTrainSample(kCodes), kCodes)
    val sp = base.sparkSession
    val samp = base
      .withColumn("h", graft.functions.Hashing.hash64(col("id").cast("string")))
      .orderBy(col("h").asc, col("id").asc)
      .limit(n)
      .repartition(sp.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .persist()
    val boot: IndexedSeq[IndexedSeq[Double]] = samp
      .orderBy(col("h").asc, col("id").asc)
      .limit(kCodes)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    require(boot.size == kCodes, "pq: corpus smaller than the codebook")
    def vSub(j: Int): Column = slice(col("v"), j * sub + 1, sub)
    // the m subspaces train independently (cents(j) only ever reads
    // subspace j), so one iteration's m mean-updates FUSE into a single
    // job — rows explode into (j, cluster, sub-vector) entries and one
    // groupBy(j, c, i) computes every subspace's means at once, instead
    // of m sequential collect jobs per iteration (driver job-submission
    // overhead dominated the training at bench scale). Each (j, c, i)
    // group aggregates exactly the rows the per-subspace job aggregated,
    // in the same per-partition order, so the means are bit-identical.
    var cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map(j => boot.map(_.slice(j * sub, (j + 1) * sub)))
    (1 to iters).foreach { _ =>
      val entries = (0 until m).map { j =>
        val dists = cents(j).map(c => sqDistNative(vSub(j),
          array(c.map(lit): _*)))
        val mind = dists.reduce(least(_, _))
        val cl = dists.zipWithIndex.tail.foldLeft(
          when(dists.head === mind, lit(0))) { case (acc, (d, i)) =>
          acc.when(d === mind, lit(i)) }
        struct(lit(j).as("j"), cl.as("c"), vSub(j).as("vj"))
      }
      val means = samp
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.j"), col("e.c"), posexplode(col("e.vj")).as(Seq("i", "x")))
        .groupBy(col("j"), col("c"), col("i"))
        .agg(round(avg(col("x")), 6).as("mu"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      cents = cents.zipWithIndex.map { case (cj, j) =>
        cj.zipWithIndex.map { case (old, c) =>
          old.indices.map(i => means.getOrElse((j, c, i), old(i)))
        }
      }
    }
    samp.unpersist()
    cents
  }

  /** The m argmin-code columns over `col("v")` (map pass, first-match
    * tie rule). */
  private def pqCodeCols(codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                         sub: Int): Seq[Column] =
    codebooks.indices.map { j =>
      val vj = slice(col("v"), j * sub + 1, sub)
      val dists = codebooks(j).map(c => sqDistNative(vj,
        array(c.map(lit): _*)))
      val mind = dists.reduce(least(_, _))
      dists.zipWithIndex.tail.foldLeft(
        when(dists.head === mind, lit(0))) { case (acc, (d, i)) =>
        acc.when(d === mind, lit(i)) }
    }

  /** A probe's flattened ADC table (j-major, m·kCodes entries) — the
    * same left-to-right squared-distance fold as the SQL oracle's
    * list_sum. */
  private def adcTable(codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                       sub: Int, pv: IndexedSeq[Double]): IndexedSeq[Double] =
    codebooks.indices.flatMap { j =>
      val pj = pv.slice(j * sub, (j + 1) * sub)
      codebooks(j).map { c =>
        var acc = 0.0; var i = 0
        while (i < pj.length) { val d = pj(i) - c(i); acc += d * d; i += 1 }
        acc
      }
    }

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
