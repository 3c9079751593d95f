package graft.sources.tsdbblock

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming source tailing a Prometheus WAL directory — the
  * LIVE counterpart of the reference's `DBReadOnly` open, which replays
  * the WAL into a static head once (hello.go:50-74). A monitoring
  * pipeline doesn't re-open the DB per query; it tails the WAL as
  * samples land. `spark.readStream.format("tsdb-wal-stream").load(dir)`
  * delivers exactly the batch source's rows, incrementally.
  *
  * Offsets are per-segment RAW sample counts. Each trigger re-decodes
  * segment bytes and skips already-delivered samples — O(segment) per
  * trigger, which is bounded (Prometheus caps segments at 128 MiB) and
  * correct under both growth modes: a torn tail parses up to the last
  * complete record and the next trigger resumes past it; new segments
  * appear as new offset keys. (A production source would checkpoint
  * page-aligned byte positions to skip the re-decode; count offsets keep
  * the prototype obviously correct.)
  *
  * The ref→labels dictionary is rebuilt from the Series records of ALL
  * current segments at each planning step (series records are a tiny
  * fraction of WAL bytes, and the dictionary only grows — Prometheus
  * writes a series record before that series' first sample).
  */
class TsdbWalStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tsdb-wal-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsdbBlockSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TsdbWalStreamTable(properties.get("path"))
}

final class TsdbWalStreamTable(path: String) extends Table with SupportsRead {
  require(path != null, "tsdb-wal-stream requires a WAL directory path")
  override def name(): String = s"tsdb-wal-stream($path)"
  override def schema(): StructType = TsdbBlockSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new TsdbWalStreamScan(path)
}

/** Offset: segment file name → raw samples delivered so far. */
final case class WalOffset(counts: Map[String, Long]) extends Offset {
  // stable, library-free encoding: "name:count" pairs, sorted
  override def json(): String =
    counts.toSeq.sorted.map { case (s, n) => s"$s:$n" }.mkString(",")
}
object WalOffset {
  def parse(j: String): WalOffset = WalOffset(
    if (j.isEmpty) Map.empty
    else j.split(",").map { p =>
      val i = p.lastIndexOf(':')
      p.substring(0, i) -> p.substring(i + 1).toLong
    }.toMap)
}

final class TsdbWalStreamScan(path: String) extends Scan {
  override def readSchema(): StructType = TsdbBlockSource.schema
  override def description(): String = s"tsdb-wal-stream $path"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TsdbWalMicroBatchStream(path)
}

final class TsdbWalMicroBatchStream(path: String) extends MicroBatchStream {

  override def initialOffset(): Offset = WalOffset(Map.empty)

  override def latestOffset(): Offset = WalOffset(
    WalReader.segments(path).map { seg =>
      val name = new java.io.File(seg).getName
      name -> WalReader.samples(seg).size.toLong
    }.toMap)

  override def deserializeOffset(json: String): Offset = WalOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[WalOffset].counts
    val to = end.asInstanceOf[WalOffset].counts
    val dict = WalReader.seriesDict(path)
    to.toSeq.sorted.flatMap { case (name, hi) =>
      val lo = from.getOrElse(name, 0L)
      if (hi > lo)
        Some(TsdbWalSlicePartition(s"$path/$name", lo, hi, dict): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[TsdbWalSlicePartition]
      new PartitionReader[InternalRow] {
        private val mapCache =
          scala.collection.mutable.Map.empty[Long, ArrayBasedMapData]
        private val it = WalReader.samples(p.segment)
          .slice(p.from.toInt, p.until.toInt)
          .filter(s => p.dict.contains(s.ref)) // orphan refs: dropped
        private var cur: WalReader.WalSample = _

        override def next(): Boolean =
          if (it.hasNext) { cur = it.next(); true } else false

        override def get(): InternalRow = {
          val labels = mapCache.getOrElseUpdate(cur.ref, {
            val m = p.dict(cur.ref)
            val keys = m.keys.toArray.sorted
            new ArrayBasedMapData(
              ArrayData.toArrayData(keys.map(UTF8String.fromString)),
              ArrayData.toArrayData(keys.map(k => UTF8String.fromString(m(k)))))
          })
          // staleness markers → NULL (TsdbSchema contract, ≡ batch source)
          val v: Any =
            if (graft.tsdb.TsdbSchema.isStaleMarker(cur.value)) null
            else cur.value
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](cur.time, v, labels))
        }
        override def close(): Unit = ()
      }
    }
}

final case class TsdbWalSlicePartition(
    segment: String, from: Long, until: Long,
    dict: Map[Long, Map[String, String]]) extends InputPartition
