package graft.streaming

import graft.SparkSpec
import graft.sources.tsdbblock.TsdbWalWriter
import org.apache.spark.sql.functions._

/** The streaming WAL sink's delivery contract: batch-derived segment
  * indices make micro-batch replay idempotent, and the stream's own
  * checkpoint makes a restarted query a no-op over consumed input. */
class StreamWalSinkSpec extends SparkSpec {

  private def longForm(times: Seq[Long]) = {
    val s = spark
    import s.implicits._
    times.toDF("time")
      .withColumn("value", col("time").cast("double"))
      .withColumn("labels", map(
        lit("__name__"), lit("m"), lit("i"), (col("time") % 8).cast("string")))
  }

  test("pinned baseSegment makes a replayed batch overwrite, not append") {
    val dir = tmpDir("graft_swal_idem_")
    val df = longForm(0L until 100L)
    TsdbWalWriter.write(df, dir, partitions = 2, baseSegment = Some(0))
    val first = spark.read.format("tsdb-wal").load(dir).count()
    assert(first === 100)
    // the at-least-once replay: same batch, same base → same files
    TsdbWalWriter.write(df, dir, partitions = 2, baseSegment = Some(0))
    assert(spark.read.format("tsdb-wal").load(dir).count() === 100)
    // a NEXT batch with the next base appends cleanly
    TsdbWalWriter.write(longForm(100L until 150L), dir,
      partitions = 2, baseSegment = Some(2))
    assert(spark.read.format("tsdb-wal").load(dir).count() === 150)
  }

  test("restarted sink over a consumed source adds nothing") {
    val src = tmpDir("graft_swal_src_")
    val s = spark
    import s.implicits._
    (0L until 200L).toDF("t").withColumn("v", col("t").cast("double"))
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema).parquet(src)
      .select(col("t").as("time"), col("v").as("value"),
        map(lit("__name__"), lit("m"),
          lit("i"), (col("t") % 4).cast("string")).as("labels"))
    val walDir = tmpDir("graft_swal_out_")
    val ck = tmpDir("graft_swal_ck_")
    val q1 = TsdbStreamIngest.startWalSink(stream(), walDir, ck)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.format("tsdb-wal").load(walDir).count() === 200)
    // restart with the SAME checkpoint: input already committed → no-op
    val q2 = TsdbStreamIngest.startWalSink(stream(), walDir, ck)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.format("tsdb-wal").load(walDir).count() === 200)
  }
}
