package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — the canonical time-series operator Spark lacks natively
  * (SURVEY.md §2.5 notes it as the extension path for a TSDB engine).
  *
  * Semantics: for every left row, attach the single most recent right row
  * with `right.ts <= left.ts` within the same key (NULL-padded when none
  * exists) — the standard "last observation carried forward" join.
  *
  * Implementation is the union-tag trick, chosen over a range join
  * because it costs ONE shuffle, the same one a sort-merge join would
  * need, and never materializes an O(n·m) intermediate:
  *   union both sides tagged → window (key ORDER BY ts, side) →
  *   last_value(right cols, ignoreNulls) over rows UNBOUNDED PRECEDING →
  *   keep left rows. AQE handles key skew; the window is a single
  *   sort-based pass per partition, so it scales linearly at 100 TB.
  */
object AsOfJoin {

  /** @param left    left table
    * @param right   right table
    * @param keyCols equi-key column names present in both sides
    * @param leftTs  left timestamp column name
    * @param rightTs right timestamp column name
    * @param rightVals right value columns to carry forward (renamed as-is
    *                  in the output)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String,
           rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTs)
    // Tag: right rows sort BEFORE left rows at equal ts (<= semantics).
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_side")) ++
        leftCols.map(c => col(c).as(s"_l_$c")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        rightVals.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (keyCols.map(col) :+ col("_ts") :+ col("_side")) ++
          leftCols.map(c => col(s"_l_$c")) ++
          rightVals.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_r_$c")): _*)
    carried.where(col("_side") === 1)
      .select(
        keyCols.map(col) ++
          leftCols.map(c => col(s"_l_$c").as(c)) ++
          Seq(col("_ts").as(leftTs)) ++
          rightVals.map(c => col(s"_r_$c").as(s"asof_$c")): _*)
  }
}
