package graft.sources.tsdbblock

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent content digest over long-form samples
  * `(time, value, labels MAP)` — xxhash64 of the canonicalized sample,
  * folded with bit_xor so the digest is independent of row order and
  * partitioning. This is the verification currency for the raw
  * Prometheus block/WAL inputs no SQL oracle can read: the streaming
  * WAL tail emits it per group ([[graft.queries.PipelineQueries]]
  * `stream_q7_wal_tail`) and specs compare it against the batch source
  * over the same directory, so "rows-only" still pins exact content. */
object SampleDigest {

  /** Per-sample 64-bit hash of (sorted label entries, time, value). */
  val perSample: Column = xxhash64(
    concat_ws(",",
      transform(array_sort(map_entries(col("labels"))),
        e => concat(e.getField("key"), lit("="), e.getField("value")))),
    col("time"), col("value"))

  /** Commutative fold of a column of per-sample hashes. */
  def folded(h: Column): Column = bit_xor(h)
}
