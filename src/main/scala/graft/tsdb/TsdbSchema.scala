package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema constants + dynamic-column conventions for the wide/stored form
  * (SURVEY.md §1.4; reference `simpleSchema()` hello.go:120-157).
  *
  * The reference's load-bearing design decision is FrostDB "dynamic
  * columns": one physical, dictionary-encoded, nullable string column per
  * observed label name, flat-named `labels.<name>` (literal dot —
  * hello.go:334 trims the "labels." prefix on decode). Spark schemas are
  * fixed per DataFrame, so dynamism is realized as:
  *
  *   long form  : (time LONG, value DOUBLE, labels MAP<STRING,STRING>)
  *   wide form  : (time LONG, value DOUBLE, `labels.a` STRING, ...)
  *                discovered per-batch; later batches with new label names
  *                produce parquet files with a superset schema, reconciled
  *                at read with mergeSchema=true (FrostDB's read-time union).
  */
object TsdbSchema {
  val TimeCol = "time"
  val ValueCol = "value"
  val LabelsCol = "labels"
  val LabelPrefix = "labels."

  /** Wide-form label column name for a label name ("instance" →
    * "labels.instance"). Always address via [[labelCol]] — the dot is part
    * of the flat name, never a struct path. */
  def labelColName(name: String): String = LabelPrefix + name

  /** Backtick-safe Column for a label column (literal dot in flat name). */
  def labelCol(name: String): Column = col(s"`${labelColName(name)}`")

  /** All label column names present in a wide DataFrame, in schema order. */
  def labelColumns(df: DataFrame): Seq[String] =
    df.columns.toSeq.filter(_.startsWith(LabelPrefix))

  /** DynCol("labels") expansion (P2, hello.go:527): every concrete member
    * of the dynamic family that exists in storage, as Columns. */
  def dynCols(df: DataFrame): Seq[Column] =
    labelColumns(df).map(c => col(s"`$c`"))
}
