package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Matcher

/** `promtool tsdb dump` analog — the operator's escape hatch: a whole
  * data directory (blocks + WAL head, exactly what the reference opens
  * read-only, hello.go:429-447) rendered as OpenMetrics sample lines.
  * Prometheus ships this as `promtool tsdb dump` / `dump-openmetrics`
  * (the latter added for backfill round trips: dump one server,
  * `promtool tsdb create-blocks-from openmetrics` into another); this
  * engine's inverse is [[Backfill.openMetrics]], so
  * `backfill(dump(db)) ≡ db` — the identity the `tsdb_q154` oracle
  * pins (the exact inverse of `tsdb_q130_backfill_openmetrics`).
  *
  * Flags mirror promtool's: `--min-time` INCLUSIVE, `--max-time`
  * EXCLUSIVE, `--match` selectors. Scale shape: the block scan prunes
  * matched series at PLANNING time ([[graft.sources.tsdbblock.TsdbDb
  * .select]]), the time filter pushes into the scan, and the text
  * render is one map-side projection — a 100 TB dump streams straight
  * to its sink, nothing driver-sized anywhere.
  */
object TsdbDump {

  /** OpenMetrics sample lines (one `line` column) of the data dir's
    * merged view, matchers applied, `minTime ≤ time < maxTime`. */
  def dumpOpenMetrics(spark: SparkSession, dbDir: String,
                      minTime: Long = Long.MinValue,
                      maxTime: Long = Long.MaxValue,
                      matchers: Seq[Matcher] = Nil): DataFrame =
    SampleReaders.toOpenMetricsLines(
      graft.sources.tsdbblock.TsdbDb.select(spark, dbDir, matchers)
        .where(col("time") >= minTime && col("time") < maxTime))
}
