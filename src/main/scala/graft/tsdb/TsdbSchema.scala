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

  /** Prometheus's staleness marker: a NaN with this exact payload
    * (prometheus/model/value StaleNaN). Spark canonicalizes NaN bit
    * patterns inside UnsafeRow, so the marker cannot survive a shuffle
    * as a float — the engine's long/wide data model represents it as a
    * NULL `value` instead, mapped at source-decode time (the only place
    * the raw bits exist). Contract: NULL value ≡ staleness marker —
    * instant lookback ends a series at it, range selections skip it. */
  val StaleNaNBits = 0x7ff0000000000002L

  /** True iff the double carries the staleness-marker bit pattern
    * (exact-bits check; ordinary NaN values stay live, as in
    * Prometheus's IsStaleNaN). */
  def isStaleMarker(v: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(v) == StaleNaNBits
}
