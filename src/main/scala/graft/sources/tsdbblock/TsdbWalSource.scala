package graft.sources.tsdbblock

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 over a Prometheus WAL directory — the head samples the
  * reference's `DBReadOnly.Querier` merges with block data
  * (hello.go:429-447). Same long-form schema as `tsdb-block`.
  *
  * Planning runs one fused pass over the segments (cached per WAL
  * signature, see [[WalDictCache]]) that yields the global ref→labels
  * dictionary (samples may reference series defined in an earlier
  * segment), the tombstone map and the record-boundary split ladder;
  * tasks then decode size-balanced record ranges — a segment splits
  * into multiple tasks when it is large relative to the core count,
  * and WAL segments are bounded (128 MiB) so no split is ever huge.
  */
class TsdbWalSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tsdb-wal"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsdbBlockSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TsdbWalTable(properties.get("path"))
}

final class TsdbWalTable(path: String) extends Table with SupportsRead {
  require(path != null, "tsdb-wal requires a WAL directory path")
  override def name(): String = s"tsdb-wal($path)"
  override def schema(): StructType = TsdbBlockSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsdbWalScanBuilder(path)
}

final class TsdbWalScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TsdbBlockSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TsdbWalScan(path, required)
}

/** One replay split: the records of `segment` whose start offset lies
  * in `[from, until)` — segments split at record boundaries so the
  * post-checkpoint tail (one big live segment) is not a single task. */
final case class TsdbWalPartition(segment: String, from: Long, until: Long)
    extends InputPartition

/** Per-WAL planning cache: ONE fused driver pass builds the global
  * ref→labels dictionary, the head-tombstone map and the intra-segment
  * split ladder, and ONE broadcast ships the dictionaries as a compact
  * byte blob ([[WalReader.WalDicts]]). Keyed by the segment signature
  * (name, length, mtime) — the WAL writer only ever creates NEW segment
  * or checkpoint files, so any mutation changes the signature. Without
  * this cache every execution of every scan over the same WAL re-read
  * the segments on the driver and re-broadcast the dictionaries
  * (measured ~3 s per execution at sf0.1, nearly all of it
  * SizeEstimator + JavaSerializer walking the nested-Map object graph);
  * superseded broadcasts were never unpersisted. */
private[tsdbblock] object WalDictCache {
  import org.apache.spark.broadcast.Broadcast
  import org.apache.spark.sql.SparkSession

  final case class Entry(
      sig: Seq[(String, Long, Long)],
      dictsB: Broadcast[WalReader.WalDicts],
      segments: Seq[String],
      segmentBytes: Map[String, Long],
      splitCandidates: Map[String, Array[Long]])

  private val MaxEntries = 8
  private val cache =
    scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  private def signature(walDir: String): Seq[(String, Long, Long)] =
    WalReader.segments(walDir).map { p =>
      val f = new java.io.File(p)
      (p, f.length(), f.lastModified())
    }

  def get(spark: SparkSession, walDir: String): Entry = synchronized {
    val sig = signature(walDir)
    cache.remove(walDir) match { // re-insert on hit: LRU order
      case Some(e) if e.sig == sig =>
        cache(walDir) = e; e
      case stale =>
        stale.foreach(_.dictsB.unpersist(false))
        val meta = WalReader.walMeta(walDir)
        val dictsB = spark.sparkContext.broadcast(
          WalReader.WalDicts(meta.series, meta.stones))
        val e = Entry(sig, dictsB, meta.segments, meta.segmentBytes,
          meta.splitCandidates)
        cache(walDir) = e
        if (cache.size > MaxEntries) {
          val (k, evicted) = cache.head
          cache.remove(k)
          evicted.dictsB.unpersist(false)
        }
        e
    }
  }
}

final class TsdbWalScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"tsdb-wal $path, columns [${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val e = WalDictCache.get(spark, path)
    val totalBytes = math.max(1L, e.segmentBytes.values.sum)
    val parallelism = math.max(1, spark.sparkContext.defaultParallelism)
    // FilePartition-style sizing, derived from input size and core
    // count rather than a constant: ceil(total/cores) clamped to
    // [candidate stride, maxPartitionBytes].
    val splitBytes = math.min(
      spark.sessionState.conf.filesMaxPartitionBytes,
      math.max((totalBytes + parallelism - 1) / parallelism,
        WalReader.CandidateStrideBytes))
    e.segments.flatMap { seg =>
      val bounds = Array.newBuilder[Long]
      bounds += 0L
      var last = 0L
      e.splitCandidates.getOrElse(seg, Array.empty[Long]).foreach { c =>
        if (c - last >= splitBytes) { bounds += c; last = c }
      }
      val bs = bounds.result()
      bs.indices.map { i =>
        val until = if (i + 1 < bs.length) bs(i + 1) else Long.MaxValue
        TsdbWalPartition(seg, bs(i), until): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    // the cached broadcast: dictionaries are global (samples may
    // reference series defined in an earlier segment), shipped once as
    // a compact blob and decoded once per executor
    val spark = org.apache.spark.sql.SparkSession.active
    val dictsB = WalDictCache.get(spark, path).dictsB
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[TsdbWalPartition]
      new PartitionReader[InternalRow] {
        private val wantLabels = fields.contains("labels")
        private val mapCache =
          scala.collection.mutable.Map.empty[Long, ArrayBasedMapData]
        private val dict = dictsB.value.series
        private val stones = dictsB.value.stones
        private val it = WalReader.samples(p.segment, p.from, p.until)
          .filter(s => dict.contains(s.ref)) // orphan refs: dropped
          .filterNot(s => stones.get(s.ref)
            .exists(Tombstones.deleted(_, s.time)))
        private var cur: WalReader.WalSample = _

        override def next(): Boolean = {
          if (it.hasNext) { cur = it.next(); true } else false
        }

        override def get(): InternalRow = {
          val labels = if (!wantLabels) null
          else mapCache.getOrElseUpdate(cur.ref, {
            val m = dict(cur.ref)
            val keys = m.keys.toArray.sorted
            new ArrayBasedMapData(
              ArrayData.toArrayData(keys.map(UTF8String.fromString)),
              ArrayData.toArrayData(keys.map(k => UTF8String.fromString(m(k)))))
          })
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields.length)
          var f = 0
          while (f < fields.length) {
            fields(f) match {
              case "time" => row.update(f, cur.time)
              // staleness markers → NULL (TsdbSchema contract)
              case "value" =>
                row.update(f,
                  if (graft.tsdb.TsdbSchema.isStaleMarker(cur.value)) null
                  else cur.value)
              case "labels" => row.update(f, labels)
            }
            f += 1
          }
          row
        }

        override def close(): Unit = ()
      }
    }
  }
}

/** Long-form views over a WAL's NON-sample record kinds — exemplars
  * (kind 4) and metric metadata (kind 6). Same distribution model as
  * the sample scan: the driver reads only the tiny series records for
  * the ref→labels dictionary, one task decodes one segment. */
object TsdbWalRecords {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Exemplars with their owning series' labels resolved:
    * `(time LONG, value DOUBLE, labels MAP, exemplar MAP)` — the WAL
    * twin of [[graft.tsdb.Exemplars]]' table. Orphan refs drop, as in
    * the sample path. */
  def readExemplars(spark: SparkSession, walDir: String): DataFrame = {
    import spark.implicits._
    val entry = WalDictCache.get(spark, walDir)
    val dictsB = entry.dictsB
    val segs = entry.segments
    spark.sparkContext.parallelize(segs, math.max(1, segs.size))
      .flatMap { seg =>
        val d = dictsB.value.series
        WalReader.exemplars(seg).flatMap(e =>
          d.get(e.ref).map(lbls => (e.time, e.value, lbls, e.labels)))
      }
      .toDF("time", "value", "labels", "exemplar")
  }

  /** Native-histogram samples (kinds 7/8) with series labels resolved —
    * a [[graft.tsdb.RemoteWrite.SparseHist]] frame, ready for
    * [[graft.tsdb.RemoteWrite.denseFromSparse]] and every NHCB
    * kernel. */
  def readHistograms(spark: SparkSession, walDir: String)
      : org.apache.spark.sql.Dataset[graft.tsdb.RemoteWrite.SparseHist] = {
    import spark.implicits._
    readHistogramsFull(spark, walDir).map { case (lbls, h) =>
      graft.tsdb.RemoteWrite.SparseHist(
        h.time, lbls, h.count, h.sum, h.schema,
        h.zeroThreshold, h.zeroCount, h.positive, h.negative)
    }
  }

  /** FULL-fidelity histogram samples — every [[WalReader.WalHistogram]]
    * field (counter-reset hint, NHCB custom values, float-ness), the
    * form [[TsdbBlockWriter]] re-encodes as histogram chunks during
    * head compaction. Head tombstones mask, orphan refs drop — the same
    * contract as the float sample scan. */
  def readHistogramsFull(spark: SparkSession, walDir: String)
      : org.apache.spark.sql.Dataset[(Map[String, String],
          WalReader.WalHistogram)] = {
    import spark.implicits._
    // cached fused pass: dict + stones from one read of the segments,
    // one compact-blob broadcast shared with every other scan of this WAL
    val entry = WalDictCache.get(spark, walDir)
    val dictsB = entry.dictsB
    val segs = entry.segments
    val rdd = spark.sparkContext.parallelize(segs, math.max(1, segs.size))
      .flatMap { seg =>
        val d = dictsB.value.series
        val stones = dictsB.value.stones
        WalReader.histograms(seg)
          .filterNot(h => stones.get(h.ref)
            .exists(Tombstones.deleted(_, h.time)))
          .flatMap(h => d.get(h.ref).map(lbls => (lbls, h)))
      }
    spark.createDataset(rdd)
  }

  private val TypeNames = Array("unknown", "counter", "gauge", "histogram",
    "gaugehistogram", "summary", "info", "stateset")

  /** The `/api/v1/metadata` view: DISTINCT (metric, type, unit, help)
    * resolved through the series dictionary. Metadata volume is
    * label-universe-sized, so the per-segment decode is metadata-only
    * work; the distinct is a tiny shuffle. */
  def readMetadata(spark: SparkSession, walDir: String): DataFrame = {
    import spark.implicits._
    val entry = WalDictCache.get(spark, walDir)
    val dictsB = entry.dictsB
    val segs = entry.segments
    spark.sparkContext.parallelize(segs, math.max(1, segs.size))
      .flatMap { seg =>
        val d = dictsB.value.series
        WalReader.metadata(seg).flatMap(m =>
          d.get(m.ref).map { lbls =>
            (lbls.getOrElse("__name__", ""),
              TypeNames.lift(m.metricType).getOrElse("unknown"),
              m.fields.getOrElse("unit", ""), m.fields.getOrElse("help", ""))
          })
      }
      .toDF("metric", "type", "unit", "help")
      .distinct()
  }
}

/** The reference's whole-DB view (hello.go:429-447: `DBReadOnly.Querier`
  * over all blocks + the WAL head): union of every block directory and
  * the WAL, deduplicated on (series, time) — Prometheus's storage merge
  * keeps one sample per series-timestamp across overlapping sources.
  */
object TsdbDb {
  import org.apache.spark.sql.{Column, DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import graft.model.Matcher

  def read(spark: SparkSession, dbDir: String): DataFrame =
    select(spark, dbDir, Nil)

  /** The reference's `Querier(...).Select(matchers)` over the whole DB
    * (hello.go:442-447): blocks ∪ WAL head, label matchers applied,
    * deduped on (series, time). Eq/Re matchers push into the block
    * source as PLANNING-time series selection (non-matching series are
    * never scheduled, their chunks never fetched); every matcher is also
    * applied as a residual row filter so WAL rows and negative kinds get
    * identical semantics. Absent label ≡ "" throughout (hello.go:339-349). */
  def select(spark: SparkSession, dbDir: String,
             matchers: Seq[Matcher]): DataFrame = {
    val opts = matchers.collect {
      case Matcher.Eq(n, v) => s"matcher.$n" -> v
      case Matcher.Re(n, p) => s"matcher_re.$n" -> p
    }.toMap
    def residual(m: Matcher): Column = {
      def l(n: String) = coalesce(element_at(col("labels"), n), lit(""))
      m match {
        case Matcher.Eq(n, v) => l(n) === v
        case Matcher.NotEq(n, v) => l(n) =!= v
        case Matcher.Re(n, p) => l(n).rlike(p)
        case Matcher.NotRe(n, p) => !l(n).rlike(p)
      }
    }
    val root = new java.io.File(dbDir)
    val blockDirs = root.listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "index").isFile)
      .map(_.getPath).sorted
    val parts =
      blockDirs.map(d =>
        spark.read.format("tsdb-block").options(opts).load(d)) ++
        (if (new java.io.File(root, "wal").isDirectory)
          Seq(spark.read.format("tsdb-wal").load(s"$dbDir/wal"))
        else Nil)
    // label-only predicates select whole series, so filtering commutes
    // with the (series, time) dedup — apply before it, shrinking the
    // shuffle to the matched series
    val union = matchers.foldLeft(parts.reduce(_ unionByName _))(
      (d, m) => d.where(residual(m)))
    // maps aren't comparable: dedup on the sorted entry list, then
    // rebuild the map. One shuffle; at scale this is the same
    // merge-dedup Prometheus does per queried chunk, done set-wise.
    // min(value) ≡ the old row_number-over-(value ASC NULLS LAST)
    // first-row pick: min ignores NULLs (a real sample beats a
    // staleness marker) and is NULL only when every duplicate is a
    // marker — but unlike the window it partial-aggregates map-side
    // (duplicates collapse BEFORE the exchange) and needs no
    // per-partition sort.
    union
      .withColumn("_entries", array_sort(map_entries(col("labels"))))
      .groupBy(col("_entries"), col("time"))
      .agg(min(col("value")).as("value"))
      .select(col("time"), col("value"),
        map_from_entries(col("_entries")).as("labels"))
  }

  /** The whole-DB NATIVE-HISTOGRAM view — the histogram twin of [[read]]:
    * every block's histogram chunks ([[TsdbBlockRecords]]) ∪ the WAL's
    * kind-7/8 records ([[TsdbWalRecords.readHistogramsFull]]), deduped
    * on (series, time) as the storage merge keeps one sample per
    * series-timestamp across overlapping sources. */
  def readHistograms(spark: SparkSession, dbDir: String)
      : org.apache.spark.sql.Dataset[(Map[String, String],
          WalReader.WalHistogram)] = {
    import spark.implicits._
    val root = new java.io.File(dbDir)
    val blockDirs = root.listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "index").isFile)
      .map(_.getPath).sorted
    val parts =
      blockDirs.toSeq.map(d => TsdbBlockRecords.readHistograms(spark, d)) ++
        (if (new java.io.File(root, "wal").isDirectory)
          Seq(TsdbWalRecords.readHistogramsFull(spark, s"$dbDir/wal"))
        else Nil)
    if (parts.isEmpty)
      return spark.emptyDataset[(Map[String, String], WalReader.WalHistogram)]
    parts.reduce(_ union _)
      .groupByKey { case (lbls, h) => (lbls.toSeq.sorted, h.time) }
      // duplicates across overlapping sources are replays of the same
      // sample; pick the (count, sum, zeroCount)-least deterministically
      .reduceGroups { (a, b) =>
        val ka = (a._2.count, a._2.sum, a._2.zeroCount)
        val kb = (b._2.count, b._2.sum, b._2.zeroCount)
        if (implicitly[Ordering[(Double, Double, Double)]].lteq(ka, kb)) a
        else b
      }
      .map(_._2)
  }
}
