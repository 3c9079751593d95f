package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (ARRAY<FLOAT>/ARRAY<DOUBLE>) as
  * pure built-in higher-order functions — codegen'd, no UDFs, no
  * serialization cliffs, so a brute-force scan stays memory-bandwidth
  * bound at scale.
  *
  * All accumulation is sequential left-to-right in DOUBLE, which makes
  * results bit-reproducible across engines (the DuckDB oracle mirrors the
  * same fold order).
  */
object VectorFunctions {

  /** Cast to ARRAY<DOUBLE> so all arithmetic is double-precision. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** [[cosine]] as a native codegen'd Expression ([[CosineSimilarity]]):
    * same fold order ⇒ bit-identical results, one fused loop ⇒ no
    * intermediate arrays. Use on brute-force scoring hot paths. */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.NativeBridge
    NativeBridge.column(CosineSimilarity(
      NativeBridge.expression(a), NativeBridge.expression(b)))
  }

  /** [[dot]] as a native codegen'd Expression ([[DotProduct]]): same
    * fold order ⇒ bit-identical; the IVF cell-assignment hot path. */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.NativeBridge
    NativeBridge.column(DotProduct(
      NativeBridge.expression(a), NativeBridge.expression(b)))
  }

  /** Squared L2 distance as a native codegen'd Expression
    * ([[SquaredDistance]]): same per-component fold order ⇒
    * bit-identical; the k-means assignment hot path. */
  def sqDistNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.NativeBridge
    NativeBridge.column(SquaredDistance(
      NativeBridge.expression(a), NativeBridge.expression(b)))
  }

  /** Random-hyperplane LSH bucket id: `planes` pseudo-random unit-free
    * hyperplanes derived deterministically from [[Hashing.hash64]], one
    * sign bit each → an int bucket. Vectors in the same bucket are
    * candidate near neighbors; at 100 TB this turns O(N·Q) brute force
    * into a bucket-partitioned join. */
  def lshBucket(v: Column, planes: Int, dim: Int): Column = {
    val vd = asDouble(v)
    (0 until planes).map { p =>
      // plane component j = (hash64("p,j") mod 2001 - 1000) / 1000 ∈ [-1,1]
      // — computed ONCE on the driver as a literal array: md5 inside a
      // Catalyst lambda is not constant-folded, so the expression form
      // paid planes × dim md5 calls per ROW (billions at a 100k+
      // corpus). The oracle derives the identical constants in SQL.
      val plane = array((0 until dim).map(j =>
        lit(planeComponent(p, j))): _*)
      val proj = dotNative(vd, plane)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  private def planeComponent(p: Int, j: Int): Double =
    ((Hashing.hash64Const(s"$p,$j") % 2001L) - 1000L).toDouble / 1000.0
}
