package graft.sources.tsdbblock

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Writer for the Prometheus write-ahead log (wlog) — the write twin of
  * [[TsdbWalSource]]/[[WalReader]], completing the data-directory story
  * in BOTH directions: with [[TsdbBlockWriter]] the engine can emit a
  * whole `<data>/wal` + block layout the reference's `DBReadOnly`
  * opens directly (format per prometheus/tsdb/docs/format/wal.md, the
  * same public doc the reader was built from).
  *
  * Format recap: numbered segment files of 32 KiB pages; records are
  * framed as `type(1) len(2 BE) crc32c(4) data`, fragmented across
  * pages (first/middle/last) when they don't fit the page remainder,
  * with bit 3 of `type` marking snappy compression of the reassembled
  * record. Series records (kind 1) map refs → label sets; samples
  * records (kind 2) carry (dref, dtime) varint deltas against a base
  * (ref, time) plus raw float bits.
  *
  * Scale model: a WAL segment is self-contained here — each Spark task
  * writes its own segment (series records first, then its samples),
  * with refs made globally unique by folding the partition id into the
  * high bits. Replay (the reader's global dict pass) is unaffected:
  * refs are arbitrary identifiers, uniqueness is the only contract. So
  * WAL write-out distributes one-segment-per-task with zero
  * coordination, the same shape as block write-out. */
object TsdbWalWriter {

  private val PageSize = 32 * 1024
  private val SnappyFlag = 0x08

  // ---- record payloads ----------------------------------------------

  /** Series record (kind 1): repeated (ref BE64, #labels, k/v strings). */
  def seriesRecord(series: Seq[(Long, Seq[(String, String)])]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def be64(v: Long): Unit = { var i = 56; while (i >= 0) { b.write(((v >>> i) & 0xff).toInt); i -= 8 } }
    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    b.write(1)
    series.foreach { case (ref, labels) =>
      be64(ref)
      uvarint(labels.size.toLong)
      labels.foreach { case (k, v) =>
        val kb = k.getBytes(UTF_8); val vb = v.getBytes(UTF_8)
        uvarint(kb.length.toLong); b.write(kb, 0, kb.length)
        uvarint(vb.length.toLong); b.write(vb, 0, vb.length)
      }
    }
    b.toByteArray
  }

  /** Samples record (kind 2): base (ref, time) BE64 then per sample
    * (dref varint, dtime varint, value raw float bits BE64) — deltas
    * against the base, as the reader decodes them. */
  def samplesRecord(samples: Seq[(Long, Long, Double)]): Array[Byte] = {
    require(samples.nonEmpty, "empty samples record")
    val b = new java.io.ByteArrayOutputStream()
    def be64(v: Long): Unit = { var i = 56; while (i >= 0) { b.write(((v >>> i) & 0xff).toInt); i -= 8 } }
    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    b.write(2)
    val (baseRef, baseTime, _) = samples.head
    be64(baseRef); be64(baseTime)
    samples.foreach { case (ref, t, v) =>
      varint(ref - baseRef)
      varint(t - baseTime)
      be64(java.lang.Double.doubleToLongBits(v))
    }
    b.toByteArray
  }

  // ---- page/fragment framing ----------------------------------------

  /** Frame whole records into 32 KiB pages: fragments sized to the page
    * remainder, 7-byte headers, zero padding when < 7 bytes remain.
    * Records ≥ `compressFrom` bytes are snappy-compressed (flag bit 3),
    * matching the reader's per-record decompression. */
  def writeSegment(path: String, records: Iterator[Array[Byte]],
                   compressFrom: Int = 128): Unit = {
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 1 << 16)
    var pagePos = 0
    def pad(): Unit = {
      while (pagePos % PageSize != 0) { out.write(0); pagePos += 1 }
    }
    records.foreach { rec =>
      val (data, snappy) =
        if (rec.length >= compressFrom)
          (org.xerial.snappy.Snappy.compress(rec), true)
        else (rec, false)
      var off = 0
      var first = true
      while (off < data.length || first) {
        if (PageSize - (pagePos % PageSize) < 7 + 1) pad() // room for header+1
        val room = PageSize - (pagePos % PageSize) - 7
        val n = math.min(room, data.length - off)
        val last = off + n == data.length
        val kind =
          if (first && last) 1
          else if (first) 2
          else if (last) 4
          else 3
        val typ = kind | (if (snappy) SnappyFlag else 0)
        val crc = new java.util.zip.CRC32C
        crc.update(data, off, n)
        val c = crc.getValue
        out.write(typ)
        out.write((n >> 8) & 0xff); out.write(n & 0xff)
        out.write(((c >>> 24) & 0xff).toInt); out.write(((c >>> 16) & 0xff).toInt)
        out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
        out.write(data, off, n)
        pagePos += 7 + n
        off += n
        first = false
      }
    }
    out.close()
  }

  // ---- Spark orchestration ------------------------------------------

  private val SamplesPerRecord = 500

  /** The next free segment index of a WAL dir: past both the live
    * segments and the latest checkpoint (a fresh segment must never
    * reuse an index a checkpoint already covers). */
  private def nextSegmentIndex(walDir: String): Int = {
    val files = Option(new java.io.File(walDir).listFiles())
      .getOrElse(Array.empty)
    val live = files.filter(f => f.isFile && f.getName.forall(_.isDigit))
      .map(_.getName.toInt)
    val cp = files.filter(f => f.isDirectory && f.getName.startsWith("checkpoint."))
      .flatMap(_.getName.stripPrefix("checkpoint.").toIntOption)
    ((live ++ cp) :+ -1).max + 1
  }

  /** Write the long-form frame `(time LONG ms, value DOUBLE,
    * labels MAP)` as a WAL directory: ONE shuffle groups samples into
    * series; each task writes one self-contained segment (its series
    * records, then time-ordered samples records). Segment names continue
    * the dir's numbering (append semantics — a second batch lands after
    * existing segments and checkpoints); refs fold the segment index
    * into the high bits for global uniqueness. Returns the segment
    * count written by this call. */
  def write(df: DataFrame, walDir: String, partitions: Int = 4): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(walDir))
    val base = nextSegmentIndex(walDir)
    val grouped = df
      .groupBy(array_sort(transform(map_entries(col("labels")),
          e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("labels"))
      .agg(array_sort(collect_list(struct(col("time").as("_1"),
        col("value").as("_2")))).as("samples"))
      .repartition(partitions)
      .as[(Seq[(String, String)], Seq[(Long, Double)])]
    val segs = grouped.mapPartitions { it =>
      val seg = base + org.apache.spark.TaskContext.getPartitionId()
      val series = it.toSeq
      if (series.isEmpty) Iterator.empty
      else {
        val withRefs = series.zipWithIndex.map { case ((labels, samples), i) =>
          ((seg.toLong << 32) | (i.toLong + 1), labels, samples)
        }
        val seriesRecs = withRefs.grouped(1000).map(g =>
          seriesRecord(g.map(s => (s._1, s._2))))
        val sampleRecs = withRefs.iterator.flatMap { case (ref, _, samples) =>
          samples.grouped(SamplesPerRecord).map(g =>
            samplesRecord(g.map { case (t, v) => (ref, t, v) }))
        }
        val path = f"$walDir/$seg%08d"
        writeSegment(path, seriesRecs ++ sampleRecs)
        Iterator.single(path)
      }
    }.collect()
    segs.length
  }

  // ---- checkpointing --------------------------------------------------

  /** Prometheus WAL CHECKPOINTING (`tsdb/wlog.Checkpoint`): fold the
    * segments with index ≤ `through` into a `checkpoint.<through>`
    * directory, dropping samples older than `keepTime` and keeping every
    * series record (Prometheus additionally drops series no longer live
    * in the head — an optimization, not a correctness requirement; a
    * read-path engine has no liveness oracle, and extra series records
    * are invisible to replay). The folded segments are then deleted,
    * exactly the truncation Prometheus performs after a successful
    * checkpoint.
    *
    * Scale model: segments are independent — one Spark task filters one
    * segment into one same-named file inside the checkpoint dir (replay
    * order is preserved by the file numbering), so checkpointing a
    * 100 TB WAL distributes with zero coordination. The dir is assembled
    * under a `.tmp` name and renamed only when complete, Prometheus's
    * own crash-safety protocol.
    *
    * Returns the number of segments folded (0 ⇒ nothing to do). */
  def checkpoint(spark: org.apache.spark.sql.SparkSession, walDir: String,
                 keepTime: Long, through: Int = Int.MaxValue): Int = {
    val folded = WalReader.segments(walDir).filter { p =>
      val f = new java.io.File(p)
      // fold live segments ≤ through; a previous checkpoint's contents
      // fold unconditionally (they are by definition older than any
      // live segment being folded)
      f.getParentFile.getName.startsWith("checkpoint.") ||
        f.getName.toInt <= through
    }
    val live = folded.filterNot(p =>
      new java.io.File(p).getParentFile.getName.startsWith("checkpoint."))
    if (live.isEmpty) return 0 // nothing new to fold
    val cpIndex = live.map(p => new java.io.File(p).getName.toInt).max
    val tmpStr = Paths.get(walDir, f"checkpoint.$cpIndex%08d.tmp").toString
    Files.createDirectories(Paths.get(tmpStr))
    // one task per segment: decode records, keep series records whole,
    // re-encode samples records without the pre-keepTime samples.
    // Checkpoint-internal files keep their names but can collide with a
    // live segment's (both start at 0) — prefix-disambiguate by source
    // order, which is exactly replay order.
    val indexed = folded.zipWithIndex
    spark.sparkContext.parallelize(indexed, indexed.size).foreach {
      case (seg, i) =>
        val kept = WalReader.records(seg).flatMap { rec =>
          if (rec.isEmpty) None
          else if (rec(0) == 2) {
            val samples = WalReader.samplesOfRecord(rec)
              .filter(_.time >= keepTime)
            if (samples.isEmpty) None
            else Some(samplesRecord(samples.map(s => (s.ref, s.time, s.value))))
          } else Some(rec) // series + unknown kinds pass through
        }
        writeSegment(f"$tmpStr/$i%08d", kept)
    }
    val tmp = Paths.get(tmpStr)
    val finalDir = Paths.get(walDir, f"checkpoint.$cpIndex%08d")
    Files.move(tmp, finalDir,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // truncate: drop the folded segments (and any superseded checkpoint)
    folded.foreach(p => Files.deleteIfExists(Paths.get(p)))
    Option(new java.io.File(walDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("checkpoint.") &&
        f.getName.stripPrefix("checkpoint.").toIntOption.exists(_ < cpIndex))
      .foreach { d =>
        d.listFiles().foreach(_.delete()); d.delete()
      }
    live.size
  }
}
