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

  /** Tombstones record (kind 3): flat (ref BE64, mint/maxt varint)
    * triples — inclusive intervals, the WAL twin of the tombstones
    * file. */
  def tombstonesRecord(stones: Seq[(Long, Long, Long)]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def be64(v: Long): Unit = { var i = 56; while (i >= 0) { b.write(((v >>> i) & 0xff).toInt); i -= 8 } }
    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    b.write(3)
    stones.foreach { case (ref, mint, maxt) =>
      be64(ref); varint(mint); varint(maxt)
    }
    b.toByteArray
  }

  /** Exemplars record (kind 4): the samples framing (base ref/time
    * BE64, zigzag deltas, raw float bits) plus each exemplar's own
    * label set (uvarint count, uvarint-len strings). */
  def exemplarRecord(
      exemplars: Seq[(Long, Long, Double, Seq[(String, String)])]): Array[Byte] = {
    require(exemplars.nonEmpty, "empty exemplar record")
    val b = new java.io.ByteArrayOutputStream()
    def be64(v: Long): Unit = { var i = 56; while (i >= 0) { b.write(((v >>> i) & 0xff).toInt); i -= 8 } }
    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    def str(s: String): Unit = {
      val sb = s.getBytes(UTF_8)
      uvarint(sb.length.toLong); b.write(sb, 0, sb.length)
    }
    b.write(4)
    val (baseRef, baseTime, _, _) = exemplars.head
    be64(baseRef); be64(baseTime)
    exemplars.foreach { case (ref, t, v, labels) =>
      varint(ref - baseRef)
      varint(t - baseTime)
      be64(java.lang.Double.doubleToLongBits(v))
      uvarint(labels.size.toLong)
      labels.foreach { case (k, value) => str(k); str(value) }
    }
    b.toByteArray
  }

  /** Metadata record (kind 6): repeated (series ref uvarint,
    * metric-type byte, field count, k/v strings — conventionally
    * `unit` and `help`). */
  def metadataRecord(
      entries: Seq[(Long, Int, Seq[(String, String)])]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    def str(s: String): Unit = {
      val sb = s.getBytes(UTF_8)
      uvarint(sb.length.toLong); b.write(sb, 0, sb.length)
    }
    b.write(6)
    entries.foreach { case (ref, typ, fields) =>
      uvarint(ref); b.write(typ & 0xff)
      uvarint(fields.size.toLong)
      fields.foreach { case (k, v) => str(k); str(v) }
    }
    b.toByteArray
  }

  /** Native-histogram record (kind 7 integer / kind 8 float) — the
    * write twin of [[WalReader.histogramsOfRecord]]. Buckets come in as
    * ABSOLUTE `(sparse index, count)` pairs; integer records re-derive
    * the wire's delta encoding and REQUIRE integral counts. */
  def histogramRecord(hists: Seq[WalReader.WalHistogram],
                      float: Boolean): Array[Byte] = {
    require(hists.nonEmpty, "empty histogram record")
    val b = new java.io.ByteArrayOutputStream()
    def be64(v: Long): Unit = { var i = 56; while (i >= 0) { b.write(((v >>> i) & 0xff).toInt); i -= 8 } }
    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      b.write(x.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    def fbits(v: Double): Unit = be64(java.lang.Double.doubleToLongBits(v))
    def integral(v: Double, what: String): Long = {
      require(v == math.rint(v) && !v.isInfinite,
        s"integer histogram record needs integral $what, got $v")
      v.toLong
    }
    def writeSpans(spans: Seq[(Int, Int)]): Unit = {
      uvarint(spans.size.toLong)
      spans.foreach { case (off, len) =>
        varint(off.toLong); uvarint(len.toLong)
      }
    }
    def writeValues(values: Seq[Double]): Unit = {
      uvarint(values.size.toLong)
      if (float) values.foreach(fbits)
      else { // absolute → delta
        var prev = 0L
        values.foreach { v =>
          val c = integral(v, "bucket count")
          varint(c - prev); prev = c
        }
      }
    }
    b.write(if (float) 8 else 7)
    be64(hists.head.ref); be64(hists.head.time)
    hists.foreach { h =>
      varint(h.ref - hists.head.ref)
      varint(h.time - hists.head.time)
      b.write(h.counterResetHint & 0xff)
      varint(h.schema.toLong)
      fbits(h.zeroThreshold)
      if (float) { fbits(h.zeroCount); fbits(h.count) }
      else {
        uvarint(integral(h.zeroCount, "zero count"))
        uvarint(integral(h.count, "count"))
      }
      fbits(h.sum)
      // Prometheus field order: both span lists, then both bucket lists
      val (posSpans, posValues) = graft.tsdb.RemoteWrite.toSpans(h.positive)
      val (negSpans, negValues) = graft.tsdb.RemoteWrite.toSpans(h.negative)
      writeSpans(posSpans)
      writeSpans(negSpans)
      writeValues(posValues)
      writeValues(negValues)
      if (h.schema == -53) {
        uvarint(h.customValues.size.toLong)
        h.customValues.foreach(fbits)
      }
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
    * count written by this call.
    *
    * `baseSegment` pins the first segment index instead of continuing
    * the numbering — the IDEMPOTENCE hook for streaming sinks: a
    * replayed micro-batch re-writes the SAME segment files (a segment
    * is written whole by one task), so at-least-once replay never
    * duplicates samples.
    *
    * MEMORY CONTRACT: each task MATERIALIZES its whole segment
    * (`it.toSeq`) before writing — series refs are assigned positionally
    * within the segment, and the record stream interleaves series and
    * sample records, so the segment cannot stream out one group at a
    * time. `partitions` is therefore a TASK-MEMORY knob, not (only) a
    * parallelism knob: per-task heap ≈ input bytes / partitions, and
    * the right setting keeps each segment near Prometheus's own 128 MB
    * segment target — size it with [[partitionsForBytes]]. At 100 TB
    * the WAL path is for micro-batch tails (the block writer is the
    * bulk path), so segments stay batch-sized by construction. */
  def write(df: DataFrame, walDir: String, partitions: Int = 4,
            baseSegment: Option[Int] = None): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(walDir))
    val base = baseSegment.getOrElse(nextSegmentIndex(walDir))
    // The series grouping is CPU-heavy (per-series list build + sort)
    // but byte-light, so AQE's byte-based partition coalescing shrinks
    // it below core count (measured: the q113 agg stage ran 8-wide on
    // local[32], ~2.8 s). An explicit repartition on the grouping key
    // pins the width — the planner reuses the exchange for the groupBy
    // (hash(labels, width) satisfies the clustering), so this is still
    // ONE grouping shuffle, just at a width AQE cannot coalesce. The
    // round-robin repartition below it is the SEGMENT-SIZING knob and
    // stays: it balances series across exactly `partitions` segments
    // independent of key skew (a hash-by-labels into `partitions`
    // buckets would make segment sizes skew-dependent).
    val width = math.max(spark.sessionState.conf.numShufflePartitions,
      partitions)
    val grouped = df
      .select(array_sort(transform(map_entries(col("labels")),
          e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("labels"), col("time"), col("value"))
      .repartition(width, col("labels"))
      .groupBy(col("labels"))
      .agg(array_sort(collect_list(struct(col("time").as("_1"),
        col("value").as("_2")))).as("samples"))
      .repartition(partitions)
      .as[(Seq[(String, String)], Seq[(Long, Double)])]
    // write-side plan evidence on demand (see TsdbBlockWriter.write)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN_WRITES"))
      System.err.println("=== TsdbWalWriter.write grouped plan ===\n" +
        grouped.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
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

  /** [[write]]'s partition-sizing helper: the partition count that
    * keeps each task's materialized segment near `targetSegmentBytes`
    * (default 128 MB — Prometheus's own `wlog` segment size, and a
    * comfortable per-task heap slice on any executor profile).
    * `estimatedBytes` is the caller's estimate of the encoded payload
    * (long-form input bytes are a safe upper bound: WAL records varint-
    * and delta-compress below raw size). */
  def partitionsForBytes(estimatedBytes: Long,
                         targetSegmentBytes: Long = 128L << 20): Int =
    math.max(1, math.ceil(
      estimatedBytes.toDouble / targetSegmentBytes.toDouble).toInt)

  /** Write a frame of DENSE engine histograms
    * `(time LONG, labels MAP, hist STRUCT{count,sum,les,counts})` in
    * the [[graft.tsdb.NativeHistogram.buildExp]] layout as a WAL of
    * kind-7 (integer) or kind-8 (float) records — the on-disk form a
    * scraping Prometheus writes for native-histogram series. The
    * dense→sparse mapping is [[graft.tsdb.RemoteWrite.encodeHistRequests]]'s:
    * counts(0) (the `(-Inf,0]` bucket) → zero count, dense position
    * p ≥ 1 → sparse index `minExp + p − 1`, overflow rides as
    * `maxExp + 1`. Same sharding as [[write]]: one self-contained
    * segment per task. Returns the segment count. */
  def writeHistograms(df: DataFrame, walDir: String, schemaId: Int,
                      minExp: Int, maxExp: Int, float: Boolean,
                      partitions: Int = 2): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(walDir))
    val base = nextSegmentIndex(walDir)
    // same width pin as [[write]]: one grouping shuffle, AQE-proof width
    val width = math.max(spark.sessionState.conf.numShufflePartitions,
      partitions)
    val grouped = df
      .select(array_sort(transform(map_entries(col("labels")),
          e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("labels"), col("time"), col("hist"))
      .repartition(width, col("labels"))
      .groupBy(col("labels"))
      .agg(array_sort(collect_list(struct(
        col("time").as("_1"),
        col("hist.count").as("_2"), col("hist.sum").as("_3"),
        element_at(col("hist.counts"), 1).as("_4"),
        slice(col("hist.counts"), 2, maxExp - minExp + 2).as("_5"))))
        .as("hists"))
      .repartition(partitions)
      .as[(Seq[(String, String)],
           Seq[(Long, Double, Double, Double, Seq[Double])])]
    val segs = grouped.mapPartitions { it =>
      val seg = base + org.apache.spark.TaskContext.getPartitionId()
      val series = it.toSeq
      if (series.isEmpty) Iterator.empty
      else {
        val withRefs = series.zipWithIndex.map { case ((labels, hists), i) =>
          ((seg.toLong << 32) | (i.toLong + 1), labels, hists)
        }
        val seriesRecs = withRefs.grouped(1000).map(g =>
          seriesRecord(g.map(s => (s._1, s._2))))
        val histRecs = withRefs.iterator.flatMap { case (ref, _, hists) =>
          hists.grouped(100).map { g =>
            histogramRecord(g.map { case (t, cnt, sm, zero, buckets) =>
              val sparse = buckets.zipWithIndex.collect {
                case (c, i) if c != 0.0 => (minExp + i, c)
              }
              WalReader.WalHistogram(ref, t, counterResetHint = 0,
                schema = schemaId, zeroThreshold = 0.0, zeroCount = zero,
                count = cnt, sum = sm, positive = sparse, negative = Nil,
                customValues = Nil, isFloat = float)
            }, float)
          }
        }
        writeSegment(f"$walDir/$seg%08d", seriesRecs ++ histRecs)
        Iterator.single(seg)
      }
    }.collect()
    segs.length
  }

  /** Append EXEMPLARS to an existing WAL: each exemplar row
    * `(time LONG, value DOUBLE, labels MAP, exemplar MAP)` is resolved
    * to the ref of the series its `labels` name (from the WAL's own
    * series records — driver-side dict, series-universe-sized, then
    * broadcast) and encoded as kind-4 records in fresh segments, one
    * per task. Exemplars whose series is absent from the WAL are
    * dropped (an exemplar annotates an existing series by contract).
    * Returns the number of exemplars written. */
  def writeExemplars(df: DataFrame, walDir: String, partitions: Int = 2): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val inv: Map[Seq[(String, String)], Long] =
      WalReader.seriesDict(walDir).map { case (ref, labels) =>
        labels.toSeq.sorted -> ref
      }
    val invB = spark.sparkContext.broadcast(inv)
    val base = nextSegmentIndex(walDir)
    val rows = df.select(
      col("time"), col("value"),
      array_sort(transform(map_entries(col("labels")),
        e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("labels"),
      array_sort(transform(map_entries(col("exemplar")),
        e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("exemplar"))
      .as[(Long, Double, Seq[(String, String)], Seq[(String, String)])]
      .repartition(partitions)
    val counts = rows.mapPartitions { it =>
      val seg = base + org.apache.spark.TaskContext.getPartitionId()
      val dict = invB.value
      val resolved = it.flatMap { case (t, v, labels, ex) =>
        dict.get(labels).map(ref => (ref, t, v, ex))
      }.toSeq.sortBy(e => (e._1, e._2))
      if (resolved.isEmpty) Iterator.empty
      else {
        writeSegment(f"$walDir/$seg%08d",
          resolved.grouped(SamplesPerRecord).map(exemplarRecord))
        Iterator.single(resolved.size.toLong)
      }
    }.collect()
    counts.sum
  }

  /** Append metric METADATA (kind 6) to an existing WAL: one record
    * attaching (type, unit, help) to every series ref of each metric
    * name. Driver-side — metadata is label-universe-sized, the same
    * class as the index walk. Returns the number of (ref, metadata)
    * entries written. */
  def writeMetadata(walDir: String,
                    byMetric: Map[String, (Int, String, String)]): Int = {
    val dict = WalReader.seriesDict(walDir)
    val entries = dict.toSeq.sortBy(_._1).flatMap { case (ref, labels) =>
      byMetric.get(labels.getOrElse("__name__", "")).map {
        case (typ, unit, help) =>
          (ref, typ, Seq("unit" -> unit, "help" -> help))
      }
    }
    if (entries.isEmpty) return 0
    val seg = nextSegmentIndex(walDir)
    writeSegment(f"$walDir/$seg%08d",
      entries.grouped(1000).map(metadataRecord))
    entries.size
  }

  /** Append TOMBSTONES (kind 3) to an existing WAL — the head's delete
    * path: stones reference series refs and mask replay immediately
    * (the WAL source applies them), without touching sample records.
    * Driver-side, metadata-sized. */
  def writeStones(walDir: String, stones: Seq[(Long, Long, Long)]): Unit = {
    if (stones.isEmpty) return
    val seg = nextSegmentIndex(walDir)
    writeSegment(f"$walDir/$seg%08d",
      stones.grouped(1000).map(tombstonesRecord))
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
          else rec(0) match {
            case 2 =>
              val samples = WalReader.samplesOfRecord(rec)
                .filter(_.time >= keepTime)
              if (samples.isEmpty) None
              else Some(samplesRecord(samples.map(s => (s.ref, s.time, s.value))))
            case 4 =>
              val kept = WalReader.exemplarsOfRecord(rec)
                .filter(_.time >= keepTime)
              if (kept.isEmpty) None
              else Some(exemplarRecord(kept.map(e =>
                (e.ref, e.time, e.value, e.labels.toSeq.sorted))))
            case 3 =>
              // a stone wholly before the horizon masks nothing anymore
              val kept = WalReader.stonesOfRecord(rec)
                .filter(_.maxt >= keepTime)
              if (kept.isEmpty) None
              else Some(tombstonesRecord(kept.map(s => (s.ref, s.mint, s.maxt))))
            case 7 | 8 =>
              val kept = WalReader.histogramsOfRecord(rec)
                .filter(_.time >= keepTime)
              if (kept.isEmpty) None
              else Some(histogramRecord(kept, float = rec(0) == 8))
            case _ => Some(rec) // series, metadata, unknown: pass through
          }
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
