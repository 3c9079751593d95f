package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching with DETERMINISTIC, engine-portable
  * results. Spark's built-in `approx_count_distinct` is a fine HLL, but
  * its estimate is a function of its private hash — no other engine can
  * reproduce the number, so it can only ever be rows-only checked.
  * This HLL is built from [[Hashing.hash64]] and integer/string
  * expressions that evaluate bit-identically in Spark and DuckDB, so the
  * ESTIMATE ITSELF is oracle-checkable (r2's histogram-sketch move,
  * applied to cardinality).
  *
  * Sketch definition (m registers): register = hash64(x) mod m; rank =
  * 53 - bitlength(hash64(x) div m) (div-bits are < 2^52, exact in
  * doubles and in `bin()` string length on both engines; empty rest ⇒
  * max rank 53). Estimate = HyperLogLog's alpha·m²/Σ2^(−M_j) with the
  * standard linear-counting fallback below 2.5·m.
  *
  * Scale shape: two partial-aggregated groupBys — (keys, register) max,
  * then keys — so the shuffle carries ≤ m rows per group × partition,
  * identical to the built-in sketch's O(m) state. All expressions are
  * codegen'd built-ins.
  */
object Sketches {

  /** Sentinel: derive the count-min support threshold from the sketch
    * itself (1/width — the collision noise floor). The default for
    * [[countMinTopK]] / [[duckCountMinSql]]. */
  val AutoSupport: Double = -1.0

  /** Per-group deterministic-HLL estimate of `count(distinct valueCol)`.
    * Output: keys :+ `est_distinct` (double, rounded to 2 — absorbs
    * summation-order ulps across engines). */
  def hllDistinct(df: DataFrame, keys: Seq[Column], valueCol: Column,
                  m: Int = 256): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0 && m <= 65536, s"m must be a power of 2, got $m")
    val h = Hashing.hash64(valueCol.cast("string"))
    val reg = pmod(h, lit(m.toLong)).as("_reg")
    val rest = (h / m).cast("long")
    val rank = when(rest === 0, lit(53))
      .otherwise(lit(53) - length(bin(rest))).as("_rank")
    val keyed = df.select((keys :+ reg :+ rank): _*)
    val keyNames = keyed.columns.dropRight(2).toSeq
    val regs = keyed.groupBy((keyNames :+ "_reg").map(col): _*)
      .agg(max(col("_rank")).as("_r"))
    val grouped = regs.groupBy(keyNames.map(col): _*)
      .agg(
        sum(pow(lit(2.0), -col("_r"))).as("_s_present"),
        count(lit(1)).as("_present"))
    val S = col("_s_present") + (lit(m) - col("_present")) // absent regs: 2^0 each
    val zeros = lit(m) - col("_present")
    val raw = lit(alpha(m) * m * m) / S
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    grouped.select(keyNames.map(col) :+ round(est, 2).as("est_distinct"): _*)
  }

  def alpha(m: Int): Double = 0.7213 / (1 + 1.079 / m)

  /** Count-min sketch + heavy hitters with a DETERMINISTIC, portable
    * estimate ([[duckCountMinSql]] replays it bit-for-bit in DuckDB).
    *
    * Sketch: `depth` hash rows × `width` cells; every input row
    * increments one cell per hash row (`hash64(i ":" v) mod width`).
    * Building is one partial-aggregated groupBy over (row, cell) — the
    * shuffle carries ≤ depth·width counters per map partition, a few KB,
    * regardless of input size. `est(v) = min_i cell[i][h_i(v)]` is the
    * classic upper-bound estimate (error ≤ εN with ε = e/width at
    * confidence 1−e^−depth).
    *
    * Heavy-hitter retrieval joins CANDIDATES against the broadcast
    * sketch (depth·width rows — always broadcastable). Candidates here
    * are the column's distinct values, which keeps the final top-k
    * deterministic and oracle-checkable — and `minSupport` keeps the
    * candidate FLOW heavy-hitter-sized rather than distinct-sized:
    * cells lighter than `minSupport·N` are dropped from the broadcast
    * sketch BEFORE the join, so a light candidate dies map-side inside
    * the broadcast hash join (its cell has no match) and the only
    * shuffle after the join carries ~heavy rows. Because the estimate
    * is the MIN over rows, `est(v) ≥ φN` requires every row's cell
    * ≥ φN — enforced exactly by requiring all `depth` join hits.
    *
    * DEFAULT ([[AutoSupport]]): φ = 1/width, the sketch's own collision
    * noise floor — a cell's expected collision mass is N/width, so a
    * value with support below it is below CM's RESOLUTION (its estimate
    * is dominated by other values' counts) whatever the threshold.
    * Pruning there keeps the candidate flow heavy-hitter-sized by
    * default at no resolution cost; pass φ = 0 EXPLICITLY for the
    * classic exhaustive enumeration. */
  def countMinTopK(df: DataFrame, valueCol: Column, k: Int,
                   depth: Int = 4, width: Int = 512,
                   minSupport: Double = AutoSupport): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch dims: $depth x $width")
    val support = if (minSupport < 0.0) 1.0 / width else minSupport
    require(support < 1.0,
      s"minSupport is a fraction of total observations: $minSupport")
    def rowCells = explode(array((0 until depth).map(i =>
      struct(lit(i).as("i"),
        pmod(Hashing.hash64(col("_v"), i), lit(width.toLong)).as("cell"))): _*))
    val src = df.select(valueCol.cast("string").as("_v"))
    val cells = src.select(rowCells.as("rc"))
      .groupBy(col("rc.i").as("i"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val sketch =
      if (support == 0.0) cells
      else {
        // N = Σ cnt over hash row 0; the window runs over the counter
        // table itself (≤ depth·width rows, KBs) before it broadcasts
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        cells
          .withColumn("_tot", sum(when(col("i") === 0, col("cnt"))).over(w))
          .where(col("cnt") >= lit(support) * col("_tot"))
          .drop("_tot")
      }
    val est = src.distinct()
      .select(col("_v"), rowCells.as("rc"))
      .join(broadcast(sketch),
        col("rc.i") === col("i") && col("rc.cell") === col("cell"))
      .groupBy(col("_v"))
      .agg(min(col("cnt")).as("est_n"), count(lit(1)).as("_cm_hits"))
    val kept =
      if (support == 0.0) est
      else est.where(col("_cm_hits") === depth)
    kept
      .orderBy(col("est_n").desc, col("_v").asc)
      .limit(k)
      .select(col("_v").as("value"), col("est_n"))
  }

  /** The DuckDB replica of [[countMinTopK]]: same cells, same min-over-
    * rows estimate, same support pruning, same deterministic tie-break.
    * `srcSql` must yield a single VARCHAR column `v`. */
  def duckCountMinSql(srcSql: String, k: Int,
                      depth: Int = 4, width: Int = 512,
                      minSupport: Double = AutoSupport): String = {
    val support = if (minSupport < 0.0) 1.0 / width else minSupport
    val hashCell = (vExpr: String, i: Int) =>
      s"(${Hashing.duckHash64(vExpr, i)} % $width)"
    val rowSelects = (0 until depth).map(i =>
      s"SELECT $i AS i, ${hashCell("v", i)} AS cell FROM src_cm").mkString("\nUNION ALL ")
    val candSelects = (0 until depth).map(i =>
      s"SELECT v, $i AS i, ${hashCell("v", i)} AS cell FROM cand").mkString("\nUNION ALL ")
    val supportSql = if (support == 0.0) "" else
      s" WHERE cnt >= $support * (SELECT sum(cnt) FROM cells WHERE i = 0)"
    val hitsFilter = if (support == 0.0) "" else s" WHERE hits = $depth"
    s"""WITH src_cm AS ($srcSql),
       |inc AS ($rowSelects),
       |cells AS (SELECT i, cell, count(*) AS cnt FROM inc GROUP BY 1, 2),
       |sk AS (SELECT i, cell, cnt FROM cells$supportSql),
       |cand AS (SELECT DISTINCT v FROM src_cm),
       |cand_cells AS ($candSelects),
       |est AS (SELECT v, min(cnt) AS est_n, count(*) AS hits
       |  FROM cand_cells JOIN sk USING (i, cell) GROUP BY 1)
       |SELECT v AS value, est_n FROM est$hitsFilter
       |ORDER BY est_n DESC, v ASC LIMIT $k""".stripMargin
  }

  /** The DuckDB SQL replica: same registers, ranks and estimate formula,
    * for oracle queries. `table`/`keyCols`/`valExpr` are SQL fragments. */
  def duckHllSql(table: String, keyCols: Seq[String], valExpr: String,
                 m: Int = 256): String = {
    val h = Hashing.duckHash64(s"CAST($valExpr AS VARCHAR)")
    val keys = keyCols.mkString(", ")
    val keyPrefix = if (keyCols.isEmpty) "" else s"$keys, "
    // precomputed in Scala and embedded as ONE double literal (cast to
    // DOUBLE — DuckDB would otherwise parse it as DECIMAL and overflow)
    val amm = alpha(m) * m * m
    s"""WITH hll_regs AS (
       |  SELECT $keyPrefix($h % $m) AS reg,
       |    max(CASE WHEN ($h // $m) = 0 THEN 53
       |      ELSE 53 - length(bin($h // $m)) END) AS r
       |  FROM $table GROUP BY ${(1 to keyCols.size + 1).mkString(", ")}),
       |hll_g AS (
       |  SELECT ${keyPrefix}sum(power(2.0, -r)) AS s_present,
       |    count(*) AS present
       |  FROM hll_regs${if (keyCols.isEmpty) "" else s" GROUP BY $keys"})
       |SELECT ${keyPrefix}round(CASE
       |    WHEN CAST($amm AS DOUBLE) / (s_present + ($m - present)) <= ${2.5 * m}
       |         AND ($m - present) > 0
       |    THEN $m * ln(CAST($m AS DOUBLE) / ($m - present))
       |    ELSE CAST($amm AS DOUBLE) / (s_present + ($m - present)) END, 2) AS est_distinct
       |FROM hll_g""".stripMargin
  }
}
