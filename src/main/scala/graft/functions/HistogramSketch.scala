package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable fixed-bin histogram sketch as a native
  * `TypedImperativeAggregate` — the custom-aggregate tier of the
  * extension ladder (compose built-ins < native Expression < custom
  * aggregate; SURVEY.md §4 "a TypedImperativeAggregate if we later add
  * sketches"). `graft_hist(x, lo, hi, bins)` returns the per-group bin
  * counts for equi-width bins over [lo, hi), values clamped into the
  * edge bins.
  *
  * Why this shape at 100 TB: the buffer is a fixed `bins × 8` bytes per
  * (group × partition) regardless of row count, updates are O(1) with no
  * allocation, and merge is elementwise add — so the shuffle carries
  * sketches, not values, exactly like the built-in HLL. Unlike HLL the
  * result is DETERMINISTIC integer counts, so the DuckDB oracle replays
  * it exactly (floor-divide binning on identical double literals) —
  * a sketch whose correctness is hash-checkable, not rows-only.
  *
  * Distribution-side plumbing exercised: binary buffer serialization
  * (`serialize`/`deserialize`) for buffer spill/exchange, offset-rebind
  * copies for partial/final aggregation placement.
  */
case class HistogramSketch(
    child: Expression,
    loExpr: Expression,
    hiExpr: Expression,
    binsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "graft_hist"
  override def children: Seq[Expression] = Seq(child, loExpr, hiExpr, binsExpr)
  // ExpectsInputTypes is private[sql]; check types directly (pass
  // DOUBLE/DOUBLE/DOUBLE/INT literals — no implicit casts are added)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && loExpr.dataType == DoubleType &&
        hiExpr.dataType == DoubleType && binsExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hist(x DOUBLE, lo DOUBLE, hi DOUBLE, bins INT), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // bounds/bins must be plan-time constants: the buffer layout depends on them
  private lazy val lo: Double = {
    require(loExpr.foldable, "graft_hist lo must be a literal")
    loExpr.eval().asInstanceOf[Double]
  }
  private lazy val hi: Double = {
    require(hiExpr.foldable, "graft_hist hi must be a literal")
    hiExpr.eval().asInstanceOf[Double]
  }
  private lazy val bins: Int = {
    require(binsExpr.foldable, "graft_hist bins must be a literal")
    val n = binsExpr.eval().asInstanceOf[Int]
    require(n > 0, s"graft_hist bins must be positive, got $n")
    n
  }
  private lazy val width: Double = (hi - lo) / bins

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      // clamp into the edge bins; same floor-divide the oracle replays
      val b = math.min(bins - 1,
        math.max(0, math.floor((x - lo) / width).toInt))
      buf(b) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramSketch =
    copy(child = newChildren(0), loExpr = newChildren(1),
      hiExpr = newChildren(2), binsExpr = newChildren(3))
}

object HistogramSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graft.NativeBridge

  /** Column-API entry: `hist(col, lo, hi, bins)` usable in `agg(...)`. */
  def hist(c: Column, lo: Double, hi: Double, bins: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    NativeBridge.column(HistogramSketch(
      NativeBridge.expression(c.cast("double")),
      Literal(lo), Literal(hi), Literal(bins)).toAggregateExpression())
  }

  /** PromQL-style `histogram_quantile(φ)` over the sketch's counts:
    * find the first bin whose cumulative count reaches φ·total, then
    * interpolate linearly within it. Pure higher-order built-ins
    * (O(bins²) slice-sums — bins is small by construction), evaluated in
    * the same float-op order the DuckDB oracle replays, so the estimate
    * is deterministic cross-engine. The sketch-then-estimate split is
    * the warehouse pattern: the expensive pass produces mergeable state,
    * any number of φs are read off it for free. */
  def quantile(histCol: Column, lo: Double, width: Double, phi: Double): Column = {
    val total = aggregate(histCol, lit(0L), (a, x) => a + x)
    val target = lit(phi) * total.cast("double")
    val cums = transform(sequence(lit(1), size(histCol)), i =>
      aggregate(slice(histCol, lit(1), i), lit(0L), (a, x) => a + x))
    val idx = array_position(
      transform(cums, c => c.cast("double") >= target), true)
    val cumBefore = when(idx === 1, lit(0L))
      .otherwise(element_at(cums, (idx - 1).cast("int")))
    val cnt = element_at(histCol, idx.cast("int"))
    round(lit(lo) + lit(width) *
      ((idx - 1).cast("double") +
        (target - cumBefore.cast("double")) / cnt.cast("double")), 6)
  }
}
