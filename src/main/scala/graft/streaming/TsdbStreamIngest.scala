package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.tsdb.TsdbIngest

/** Continuous TSDB ingestion — the streaming completion of the
  * reference's batch convert loop (hello.go:479-508 walks a static
  * block once; a live system tails samples forever).
  *
  * Each micro-batch pivots long→wide with the BATCH's own label
  * universe and appends sorted, time-sliced parquet. Batches carrying
  * never-seen label names simply write a superset schema; readers union
  * with `mergeSchema` — FrostDB's on-the-fly dynamic columns, realized
  * as schema evolution under exactly-once `foreachBatch` (checkpointed
  * offsets ⇒ no batch is double-applied on restart).
  *
  * State: none (stateless transform) — at 100 TB/day the only scaling
  * knob is `timePartitions` per batch (files per time slice).
  */
object TsdbStreamIngest {

  /** @param samples streaming long-form frame: (time LONG, value DOUBLE,
    *                labels MAP<STRING,STRING>)
    * @param path wide-table output directory
    * @param checkpoint checkpoint directory (exactly-once bookkeeping)
    */
  def start(samples: DataFrame, path: String, checkpoint: String,
            timePartitions: Int = 4): StreamingQuery =
    samples.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TsdbIngest.write(TsdbIngest.toWide(batch), path,
          timePartitions, SaveMode.Append)
      }
      .start()
}
