package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL label-manipulation functions over the wide table —
  * `label_replace` / `label_join` (the last of the PromQL function
  * surface the reference was building toward). Both are pure map-side
  * column derivations: no shuffle, codegen'd, and the dynamic-column
  * rules hold — absent label reads as "", a derived "" stores as NULL
  * (absent), a never-observed src behaves as an all-NULL column.
  */
object LabelOps {
  import TsdbSchema._

  private def labelOrNull(wide: DataFrame, name: String): Column =
    if (wide.columns.contains(labelColName(name))) labelCol(name)
    else lit(null).cast("string")

  /** `label_replace(v, dst, replacement, src, regex)`: when the ANCHORED
    * regex matches src's value (absent ≡ ""), dst becomes the replacement
    * with `$n` group expansions (empty result ⇒ label removed); otherwise
    * dst keeps its prior value. */
  def labelReplace(wide: DataFrame, dst: String, replacement: String,
                   src: String, regex: String): DataFrame = {
    val srcC = coalesce(labelOrNull(wide, src), lit(""))
    val anchored = s"^(?:$regex)$$"
    wide.withColumn(labelColName(dst),
      when(srcC.rlike(anchored),
        nullif(regexp_replace(srcC, anchored, replacement), lit("")))
        .otherwise(labelOrNull(wide, dst)))
  }

  /** `label_join(v, dst, sep, src...)`: dst = src values (absent ≡ "")
    * joined with sep — NOT concat_ws, which would SKIP absent labels and
    * mis-align the join positions. All-empty result ⇒ label removed. */
  def labelJoin(wide: DataFrame, dst: String, sep: String,
                srcs: Seq[String]): DataFrame = {
    val parts = srcs.map(s => coalesce(labelOrNull(wide, s), lit("")))
    val joined = parts.tail.foldLeft(parts.head) {
      (acc, p) => concat(acc, lit(sep), p)
    }
    wide.withColumn(labelColName(dst), nullif(joined, lit("")))
  }
}
