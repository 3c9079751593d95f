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

  /** Random-hyperplane LSH bucket id: `planes` pseudo-random unit-free
    * hyperplanes derived deterministically from [[Hashing.hash64]], one
    * sign bit each → an int bucket. Vectors in the same bucket are
    * candidate near neighbors; at 100 TB this turns O(N·Q) brute force
    * into a bucket-partitioned join. */
  def lshBucket(v: Column, planes: Int, dim: Int): Column = {
    val vd = asDouble(v)
    (0 until planes).map { p =>
      // plane component j = (hash64("p,j") mod 2001 - 1000) / 1000 ∈ [-1,1]
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)),
          (x, j) => x * planeComponent(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  private def planeComponent(p: Int, j: Column): Column =
    ((pmod(Hashing.hash64(concat(lit(p.toString), lit(","), j.cast("string"))),
      lit(2001L)) - lit(1000L)).cast("double")) / lit(1000.0)
}
