package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

/** Prometheus remote-write wire codec — the snappy-compressed protobuf
  * `prompb.WriteRequest` every Prometheus server and agent emits on
  * `/api/v1/write` (remote-write 1.0 spec). The reference ingests rows
  * it synthesizes in-process (hello.go:80-104); a drop-in engine must
  * also accept the on-wire batch format those rows arrive in upstream.
  *
  * The proto schema is tiny and frozen by the spec
  * (prometheus/prompb/types.proto, public):
  *
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }
  *
  * so the codec is hand-rolled here (varint + length-delimited fields,
  * unknown fields skipped per proto3 rules) — zero dependencies beyond
  * the snappy-java Spark already ships for parquet. Both directions are
  * per-partition kernels:
  *
  *   - [[decode]] is a map-side flatMap over payload byte arrays — a
  *     100 TB backfill of captured write requests parses at scan speed,
  *     no shuffle, payloads never visit the driver;
  *   - [[encode]] groups samples into series (ONE shuffle on the label
  *     set — the same shuffle wide ingest needs anyway) then packs a
  *     bounded number of series per request inside each partition.
  *
  * The encoder sorts label pairs by name and samples by timestamp, so
  * encoding is deterministic and `decode(encode(x)) = x` exactly — which
  * puts the whole binary path under the driver's DuckDB identity oracle
  * (`tsdb_q101_remote_write`), the same proof pattern as the
  * OpenMetrics/JSON-lines text codecs in [[SampleReaders]].
  */
object RemoteWrite {

  // ---- protobuf wire primitives -------------------------------------

  private[tsdb] final class ProtoWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length.toLong); buf.write(b, 0, b.length)
    }
    def string(field: Int, s: String): Unit =
      bytes(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def fixed64(field: Int, bits: Long): Unit = {
      key(field, 1)
      var x = bits; var i = 0
      while (i < 8) { buf.write((x & 0xff).toInt); x >>>= 8; i += 1 }
    }
    def int64(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def toBytes: Array[Byte] = buf.toByteArray
  }

  private[tsdb] final class ProtoReader(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    def hasMore: Boolean = pos < until
    def varint(): Long = {
      var x = 0L; var shift = 0
      while (true) {
        val byte = b(pos); pos += 1
        x |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return x
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint overflow")
      }
      x
    }
    def fixed64(): Long = {
      var x = 0L; var i = 0
      while (i < 8) { x |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; x
    }
    /** Returns (fieldNumber, wireType) of the next key. */
    def key(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }
    /** Bounds of the next length-delimited field; advances past it. */
    def delimited(): (Int, Int) = {
      val len = varint().toInt
      val r = (pos, pos + len); pos += len; r
    }
    def string(): String = {
      val (s, e) = delimited()
      new String(b, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
    }
    /** Skip a field of the given wire type (unknown-field tolerance). */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => delimited(); ()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---- prompb encode ------------------------------------------------

  /** One TimeSeries message: sorted labels + time-sorted samples. */
  private[tsdb] def encodeSeries(labels: Seq[(String, String)],
                           samples: Seq[(Long, Double)]): Array[Byte] = {
    val w = new ProtoWriter
    labels.sortBy(_._1).foreach { case (n, v) =>
      val lw = new ProtoWriter
      lw.string(1, n); lw.string(2, v)
      w.bytes(1, lw.toBytes)
    }
    samples.sortBy(_._1).foreach { case (t, v) =>
      val sw = new ProtoWriter
      sw.fixed64(1, java.lang.Double.doubleToRawLongBits(v)); sw.int64(2, t)
      w.bytes(2, sw.toBytes)
    }
    w.toBytes
  }

  /** A snappy-compressed WriteRequest from whole TimeSeries messages. */
  def encodeRequest(series: Seq[Array[Byte]]): Array[Byte] = {
    val w = new ProtoWriter
    series.foreach(w.bytes(1, _))
    Snappy.compress(w.toBytes)
  }

  // ---- prompb decode ------------------------------------------------

  /** Decoded long-form rows of one snappy-compressed WriteRequest.
    * Unknown fields at every level are skipped, matching proto3
    * semantics — payloads from newer Prometheus versions (exemplars,
    * metadata, histograms live in fields ≥ 3) still decode their
    * samples. */
  def decodeRequest(payload: Array[Byte]): Seq[(Long, Double, Map[String, String])] = {
    val raw = Snappy.uncompress(payload)
    val out = Seq.newBuilder[(Long, Double, Map[String, String])]
    val req = new ProtoReader(raw, 0, raw.length)
    while (req.hasMore) {
      val (field, wire) = req.key()
      if (field == 1 && wire == 2) {
        val (s, e) = req.delimited()
        val ts = new ProtoReader(raw, s, e)
        val labels = Map.newBuilder[String, String]
        val samples = Seq.newBuilder[(Long, Double)]
        while (ts.hasMore) {
          val (f, w) = ts.key()
          if (f == 1 && w == 2) {
            val (ls, le) = ts.delimited()
            val lr = new ProtoReader(raw, ls, le)
            var name = ""; var value = ""
            while (lr.hasMore) {
              val (lf, lw) = lr.key()
              if (lf == 1 && lw == 2) name = lr.string()
              else if (lf == 2 && lw == 2) value = lr.string()
              else lr.skip(lw)
            }
            labels += name -> value
          } else if (f == 2 && w == 2) {
            val (ss, se) = ts.delimited()
            val sr = new ProtoReader(raw, ss, se)
            var v = 0.0; var t = 0L
            while (sr.hasMore) {
              val (sf, sw) = sr.key()
              if (sf == 1 && sw == 1) v = java.lang.Double.longBitsToDouble(sr.fixed64())
              else if (sf == 2 && sw == 0) t = sr.varint()
              else sr.skip(sw)
            }
            samples += ((t, v))
          } else ts.skip(w)
        }
        val lm = labels.result()
        samples.result().foreach { case (t, v) => out += ((t, v, lm)) }
      } else req.skip(wire)
    }
    out.result()
  }

  // ---- Spark surface ------------------------------------------------

  private[tsdb] final case class SeriesRow(labels: Seq[(String, String)],
                                     samples: Seq[(Long, Double)])
  private[tsdb] final case class LongRow(time: Long, value: Double,
                                   labels: Map[String, String])

  /** Long-form samples `(time LONG, value DOUBLE, labels MAP)` →
    * snappy-compressed WriteRequest payloads. One shuffle (group samples
    * into series on the sorted label set — MapType isn't groupable, the
    * sorted entry array is and keeps the grouping deterministic); then
    * each partition packs up to `seriesPerRequest` series per payload.
    * Payload size is bounded by series cardinality per partition, never
    * by total sample count on the driver. */
  def encode(samples: DataFrame, seriesPerRequest: Int = 500): Dataset[Array[Byte]] = {
    val spark = samples.sparkSession
    import spark.implicits._
    // pinned-width grouping: the packing below is CPU-heavy but
    // byte-light, so AQE's byte-based coalescing would shrink it below
    // core count (measured 2-wide on local[32] for q101). The explicit
    // repartition on the grouping key is REUSED by the groupBy — still
    // exactly one shuffle, at a width AQE cannot coalesce.
    samples
      .select(array_sort(transform(map_entries(col("labels")),
          e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("labels"), col("time"), col("value"))
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("labels"))
      .groupBy(col("labels"))
      .agg(collect_list(struct(col("time").as("_1"), col("value").as("_2")))
        .as("samples"))
      .as[SeriesRow]
      .mapPartitions { it =>
        it.grouped(seriesPerRequest).map { group =>
          encodeRequest(group.map(s => encodeSeries(s.labels, s.samples)))
        }
      }(Encoders.BINARY)
  }

  /** WriteRequest payloads → long-form samples. Map-side only. */
  def decode(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .flatMap(p => decodeRequest(p).map { case (t, v, l) => LongRow(t, v, l) })
      .toDF()
  }

  /** [[decode]] over a directory of captured payload files (one
    * WriteRequest per file, as `binaryFile` presents them) — the batch
    * backfill entry point. */
  def fromPayloadFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    decode(spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]])
  }

  // ---- metric metadata (prompb WriteRequest field 3) -----------------

  /** Metric types by wire enum value (prompb `MetricMetadata.MetricType`)
    * — the v1 twin of [[RemoteWrite2.TypeNames]] (same order; the v1
    * enum calls value 0 UNKNOWN where v2 says unspecified). */
  val MetaTypeNames: Seq[String] = Seq("unknown", "counter", "gauge",
    "histogram", "gaugehistogram", "summary", "info", "stateset")

  /** One payload's pushed METRIC METADATA — `WriteRequest.metadata`
    * (field 3, repeated `MetricMetadata{type = 1 enum,
    * metric_family_name = 2, help = 4, unit = 5}`), which Prometheus
    * sends by default (`metadata_config.send`, on since 2.23). Returns
    * `(metric family name, type name, unit, help)` rows — the served
    * metadata view's shape. A receiver that decodes only samples
    * 204-acks the push while leaving `/api/v1/metadata` blind to every
    * v1 sender (the decoded-but-never-stored class the v2 branch
    * already closes). */
  private[tsdb] def decodeMetadataOfRequest(p: Array[Byte])
      : Seq[(String, String, String, String)] = {
    val raw = Snappy.uncompress(p)
    val out = Seq.newBuilder[(String, String, String, String)]
    val req = new ProtoReader(raw, 0, raw.length)
    while (req.hasMore) {
      val (field, wire) = req.key()
      if (field == 3 && wire == 2) {
        val (s, e) = req.delimited()
        val mr = new ProtoReader(raw, s, e)
        var tpe = 0; var fam = ""; var help = ""; var unit = ""
        while (mr.hasMore) mr.key() match {
          case (1, 0) => tpe = mr.varint().toInt
          case (2, 2) => fam = mr.string()
          case (4, 2) => help = mr.string()
          case (5, 2) => unit = mr.string()
          case (_, w) => mr.skip(w)
        }
        if (fam.nonEmpty)
          out += ((fam, MetaTypeNames.lift(tpe).getOrElse("unknown"),
            unit, help))
      } else req.skip(wire)
    }
    out.result()
  }

  /** Spec/fixture helper: a WriteRequest carrying METADATA entries
    * `(type enum, metric family name, help, unit)` alongside its
    * series — the encoder twin of [[decodeMetadataOfRequest]]. */
  def encodeRequestWithMetadata(series: Seq[Array[Byte]],
      metadata: Seq[(Int, String, String, String)]): Array[Byte] = {
    val w = new ProtoWriter
    series.foreach(w.bytes(1, _))
    metadata.foreach { case (tpe, fam, help, unit) =>
      val mw = new ProtoWriter
      if (tpe != 0) mw.int64(1, tpe.toLong)
      mw.string(2, fam)
      if (help.nonEmpty) mw.string(4, help)
      if (unit.nonEmpty) mw.string(5, unit)
      w.bytes(3, mw.toBytes)
    }
    Snappy.compress(w.toBytes)
  }

  // ---- native histograms (prompb TimeSeries field 4) ----------------

  /** One decoded `prompb.Histogram`, sparse — exactly what the wire
    * carries: bucket i covers `(base^(i−1), base^i]` with
    * `base = 2^(2^−schema)`; spans+deltas (integer histograms) or
    * spans+counts (float histograms) are already resolved to absolute
    * `(index, count)` pairs. `customValues` carries the NHCB bucket
    * bounds when `schema = -53` (custom-bounds histograms, prompb
    * field 16 — without them the positive indices are meaningless);
    * `resetHint` is the counter-reset hint enum (field 14: 0 UNKNOWN,
    * 1 YES, 2 NO, 3 GAUGE). */
  final case class SparseHist(
      time: Long, labels: Map[String, String],
      count: Double, sum: Double, schema: Int,
      zeroThreshold: Double, zeroCount: Double,
      positive: Seq[(Int, Double)], negative: Seq[(Int, Double)],
      customValues: Seq[Double] = Nil, resetHint: Int = 0)

  /** Span/bucket lists → absolute indices. First span's offset is the
    * starting index; each later span's offset is the gap from the end
    * of the previous span (the prompb BucketSpan contract). */
  private[graft] def resolveSpans(spans: Seq[(Int, Int)], values: Seq[Double])
      : Seq[(Int, Double)] = {
    val out = Seq.newBuilder[(Int, Double)]
    var idx = 0; var vi = 0
    spans.foreach { case (offset, length) =>
      idx += offset
      var i = 0
      while (i < length) { out += ((idx, values(vi))); idx += 1; vi += 1; i += 1 }
    }
    out.result()
  }

  /** Absolute `(index, count)` pairs → (spans, counts) — consecutive
    * runs become one span; the inverse of [[resolveSpans]]. */
  private[graft] def toSpans(buckets: Seq[(Int, Double)])
      : (Seq[(Int, Int)], Seq[Double]) = {
    val sorted = buckets.sortBy(_._1)
    val spans = Seq.newBuilder[(Int, Int)]
    var prevEnd = 0; var runStart = Int.MinValue; var runLen = 0
    sorted.foreach { case (i, _) =>
      if (runLen > 0 && i == runStart + runLen) runLen += 1
      else {
        if (runLen > 0) { spans += ((runStart - prevEnd, runLen)); prevEnd = runStart + runLen }
        runStart = i; runLen = 1
      }
    }
    if (runLen > 0) spans += ((runStart - prevEnd, runLen))
    (spans.result(), sorted.map(_._2))
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** One float-form `prompb.Histogram` message (the shape Prometheus
    * sends for float histograms; integer/delta form is decode-only). */
  private[tsdb] def encodeHistogram(h: SparseHist): Array[Byte] = {
    val w = new ProtoWriter
    w.fixed64(2, java.lang.Double.doubleToRawLongBits(h.count)) // count_float
    w.fixed64(3, java.lang.Double.doubleToRawLongBits(h.sum))
    w.key(4, 0); w.varint(zigzag(h.schema.toLong)) // sint64 schema
    w.fixed64(5, java.lang.Double.doubleToRawLongBits(h.zeroThreshold))
    w.fixed64(7, java.lang.Double.doubleToRawLongBits(h.zeroCount)) // zero_count_float
    def spansAndCounts(buckets: Seq[(Int, Double)], spanField: Int,
                       countField: Int): Unit = {
      val (spans, counts) = toSpans(buckets)
      spans.foreach { case (off, len) =>
        val sw = new ProtoWriter
        sw.key(1, 0); sw.varint(zigzag(off.toLong)); sw.int64(2, len.toLong)
        w.bytes(spanField, sw.toBytes)
      }
      if (counts.nonEmpty) { // packed little-endian doubles (proto3 packed)
        val packed = new java.io.ByteArrayOutputStream()
        counts.foreach { c =>
          var x = java.lang.Double.doubleToRawLongBits(c); var i = 0
          while (i < 8) { packed.write((x & 0xff).toInt); x >>>= 8; i += 1 }
        }
        w.bytes(countField, packed.toByteArray)
      }
    }
    spansAndCounts(h.negative, 8, 10)
    spansAndCounts(h.positive, 11, 13)
    if (h.resetHint != 0) w.int64(14, h.resetHint.toLong) // ResetHint enum
    w.int64(15, h.time)
    if (h.customValues.nonEmpty) { // NHCB bounds: packed doubles
      val packed = new java.io.ByteArrayOutputStream()
      h.customValues.foreach { c =>
        var x = java.lang.Double.doubleToRawLongBits(c); var i = 0
        while (i < 8) { packed.write((x & 0xff).toInt); x >>>= 8; i += 1 }
      }
      w.bytes(16, packed.toByteArray)
    }
    w.toBytes
  }

  /** Parse one Histogram message (both integer/delta and float forms). */
  private[tsdb] def decodeHistogram(raw: Array[Byte], from: Int, until: Int,
                              labels: Map[String, String]): SparseHist = {
    val r = new ProtoReader(raw, from, until)
    var count = 0.0; var sum = 0.0; var schema = 0
    var zeroThreshold = 0.0; var zeroCount = 0.0; var time = 0L
    var resetHint = 0; var customValues = Seq.empty[Double]
    var negSpans = Seq.empty[(Int, Int)]; var posSpans = Seq.empty[(Int, Int)]
    var negVals = Seq.empty[Double]; var posVals = Seq.empty[Double]
    // packed repeated fields may legally be SPLIT across several
    // occurrences of the same field number (proto3 merge rule) — so
    // each chunk APPENDS, and the delta prefix-sum accumulator for the
    // int form threads across chunks instead of restarting at 0
    var negAcc = 0L; var posAcc = 0L
    def readSpan(s: Int, e: Int): (Int, Int) = {
      val sr = new ProtoReader(raw, s, e)
      var off = 0; var len = 0
      while (sr.hasMore) {
        val (f, w) = sr.key()
        if (f == 1 && w == 0) off = unzigzag(sr.varint()).toInt
        else if (f == 2 && w == 0) len = sr.varint().toInt
        else sr.skip(w)
      }
      (off, len)
    }
    def readPackedDeltas(s: Int, e: Int, acc0: Long): (Seq[Double], Long) = {
      val sr = new ProtoReader(raw, s, e)
      val out = Seq.newBuilder[Double]
      var acc = acc0
      while (sr.hasMore) { acc += unzigzag(sr.varint()); out += acc.toDouble }
      (out.result(), acc)
    }
    def readPackedDoubles(s: Int, e: Int): Seq[Double] = {
      val sr = new ProtoReader(raw, s, e)
      val out = Seq.newBuilder[Double]
      while (sr.hasMore) out += java.lang.Double.longBitsToDouble(sr.fixed64())
      out.result()
    }
    while (r.hasMore) {
      val (f, w) = r.key()
      (f, w) match {
        case (1, 0) => count = r.varint().toDouble // count_int
        case (2, 1) => count = java.lang.Double.longBitsToDouble(r.fixed64())
        case (3, 1) => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case (4, 0) => schema = unzigzag(r.varint()).toInt
        case (5, 1) => zeroThreshold = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 0) => zeroCount = r.varint().toDouble // zero_count_int
        case (7, 1) => zeroCount = java.lang.Double.longBitsToDouble(r.fixed64())
        case (8, 2) => val (s, e) = r.delimited(); negSpans :+= readSpan(s, e)
        case (9, 2) =>
          val (s, e) = r.delimited()
          val (vs, acc) = readPackedDeltas(s, e, negAcc)
          negVals ++= vs; negAcc = acc
        case (10, 2) => val (s, e) = r.delimited(); negVals ++= readPackedDoubles(s, e)
        case (11, 2) => val (s, e) = r.delimited(); posSpans :+= readSpan(s, e)
        case (12, 2) =>
          val (s, e) = r.delimited()
          val (vs, acc) = readPackedDeltas(s, e, posAcc)
          posVals ++= vs; posAcc = acc
        case (13, 2) => val (s, e) = r.delimited(); posVals ++= readPackedDoubles(s, e)
        case (14, 0) => resetHint = r.varint().toInt
        case (15, 0) => time = r.varint()
        case (16, 2) =>
          val (s, e) = r.delimited(); customValues ++= readPackedDoubles(s, e)
        case (16, 1) =>
          customValues :+= java.lang.Double.longBitsToDouble(r.fixed64())
        case (_, wire) => r.skip(wire)
      }
    }
    SparseHist(time, labels, count, sum, schema, zeroThreshold, zeroCount,
      resolveSpans(posSpans, posVals), resolveSpans(negSpans, negVals),
      customValues, resetHint)
  }

  /** Decoded native histograms of every TimeSeries in the payloads —
    * sparse, exactly as the wire carries them. Map-side flatMap, the
    * histogram twin of [[decode]]. */
  def decodeHistRequests(payloads: Dataset[Array[Byte]]): Dataset[SparseHist] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(decodeHistsOfRequest _)
  }

  /** One payload's native histograms, driver-side — the unit the HTTP
    * receiver's V1 branch ingests: a v1 sender with
    * `send_native_histograms` (Prometheus ≥ 2.40) carries them in
    * `TimeSeries.histograms` (field 4), and a receiver that decodes
    * only samples 204-acks the push while losing every histogram. */
  private[tsdb] def decodeHistsOfRequest(p: Array[Byte]): Seq[SparseHist] = {
    {
      val raw = Snappy.uncompress(p)
      val out = Seq.newBuilder[SparseHist]
      val req = new ProtoReader(raw, 0, raw.length)
      while (req.hasMore) {
        val (field, wire) = req.key()
        if (field == 1 && wire == 2) {
          val (s, e) = req.delimited()
          val ts = new ProtoReader(raw, s, e)
          val labels = Map.newBuilder[String, String]
          val hists = Seq.newBuilder[(Int, Int)]
          while (ts.hasMore) {
            val (f, w) = ts.key()
            if (f == 1 && w == 2) {
              val (ls, le) = ts.delimited()
              val lr = new ProtoReader(raw, ls, le)
              var name = ""; var value = ""
              while (lr.hasMore) {
                val (lf, lw) = lr.key()
                if (lf == 1 && lw == 2) name = lr.string()
                else if (lf == 2 && lw == 2) value = lr.string()
                else lr.skip(lw)
              }
              labels += name -> value
            } else if (f == 4 && w == 2) hists += ts.delimited()
            else ts.skip(w)
          }
          val lm = labels.result()
          hists.result().foreach { case (hs, he) =>
            out += decodeHistogram(raw, hs, he, lm) }
        } else req.skip(wire)
      }
      out.result()
    }
  }

  private[tsdb] final case class HistSeriesRow(
      labels: Seq[(String, String)],
      hists: Seq[(Long, Double, Double, Double, Seq[Double])])

  /** Dense engine histograms → remote-write payloads. Input rows carry
    * `(time LONG, labels MAP, hist STRUCT{count,sum,les,counts})` in the
    * [[NativeHistogram.buildExp]] layout over
    * `les = [0, base^minExp … base^maxExp, +Inf]`. Dense→sparse per
    * series: counts(0) (the `(-Inf,0]` zero bucket) becomes the wire's
    * zero count, dense position p ≥ 1 becomes sparse index
    * `minExp + p − 1`, and the +Inf overflow rides as index
    * `maxExp + 1` (documented convention — the wire's sparse form has
    * no overflow bucket; [[denseFromSparse]] inverts it exactly). One
    * shuffle (the series groupBy), then map-side packing. */
  def encodeHistRequests(df: DataFrame, schemaId: Int, minExp: Int, maxExp: Int,
                         seriesPerRequest: Int = 500): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    // pinned-width grouping — see [[encode]]
    df.select(array_sort(transform(map_entries(col("labels")),
          e => struct(e.getField("key").as("_1"), e.getField("value").as("_2"))))
        .as("labels"), col("time"), col("hist"))
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("labels"))
      .groupBy(col("labels"))
      .agg(collect_list(struct(
        col("time").as("_1"),
        col("hist.count").as("_2"), col("hist.sum").as("_3"),
        element_at(col("hist.counts"), 1).as("_4"),
        slice(col("hist.counts"), 2, maxExp - minExp + 2).as("_5")))
        .as("hists"))
      .as[HistSeriesRow]
      .mapPartitions { it =>
        it.grouped(seriesPerRequest).map { group =>
          encodeRequest(group.map { s =>
            val w = new ProtoWriter
            s.labels.sortBy(_._1).foreach { case (n, v) =>
              val lw = new ProtoWriter
              lw.string(1, n); lw.string(2, v)
              w.bytes(1, lw.toBytes)
            }
            s.hists.sortBy(_._1).foreach { case (t, cnt, sm, zero, buckets) =>
              val sparse = buckets.zipWithIndex.collect {
                case (c, i) if c != 0.0 => (minExp + i, c)
              }
              w.bytes(4, encodeHistogram(SparseHist(t, Map.empty, cnt, sm,
                schemaId, 0.0, zero, sparse, Seq.empty)))
            }
            w.toBytes
          })
        }
      }(Encoders.BINARY)
  }

  /** Sparse wire histograms → the dense [[NativeHistogram]] struct over
    * the fixed `(schema, minExp, maxExp)` grid, ready for every NHCB
    * kernel (quantile/fraction/merge/rate). Pure built-in expressions
    * (aggregate/filter over the bucket array — codegen'd, map-side):
    *   - zero bucket + every negative bucket + indices ≤ minExp−1 →
    *     dense position 0 `(-Inf, 0]`… except indices in
    *     `(minExp−1, minExp]` which land at position 1 — i.e. index
    *     i ≤ minExp folds to position 1, matching the grid's first
    *     finite bucket `(0, base^minExp]`;
    *   - index i in (minExp, maxExp] → position i − minExp + 1;
    *   - index i > maxExp → the +Inf overflow (last position). */
  def denseFromSparse(sparse: Dataset[SparseHist], schemaId: Int,
                      minExp: Int, maxExp: Int): DataFrame = {
    val les = (0.0 +: NativeHistogram.exponentialLes(schemaId, minExp, maxExp)) :+
      Double.PositiveInfinity
    val nDense = les.size
    def bucketSum(pred: Column => Column): Column =
      coalesce(aggregate(
        filter(col("positive"), b => pred(b.getField("_1"))),
        lit(0.0), (acc, b) => acc + b.getField("_2")), lit(0.0))
    val negSum = coalesce(aggregate(col("negative"), lit(0.0),
      (acc, b) => acc + b.getField("_2")), lit(0.0))
    val denseCounts = (0 until nDense).map {
      case 0 => (col("zeroCount") + negSum).as("c0")
      case 1 => bucketSum(_ <= minExp).as("c1")
      case p if p == nDense - 1 => bucketSum(_ > maxExp).as(s"c$p")
      case p => bucketSum(i => i === lit(minExp + p - 1)).as(s"c$p")
    }
    sparse.toDF().select(
      col("time"), col("labels"),
      struct(
        col("count"), col("sum"),
        array(les.map(lit(_)): _*).as("les"),
        array(denseCounts: _*).as("counts")).as("hist"))
  }

  // ---- exemplars (prompb TimeSeries field 3) -------------------------

  /** Decoded exemplars: `(series labels, exemplar labels (trace ids…),
    * value, time)` — the shape [[Exemplars]] queries over. Map-side. */
  def decodeExemplars(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(decodeExemplarsOfRequest _)
      .toDF("labels", "exemplar_labels", "value", "time")
  }

  /** One payload's exemplars, driver-side — the unit the HTTP
    * receiver's V1 branch ingests (a v1 sender with `send_exemplars`
    * carries them in `TimeSeries.exemplars`, field 3). */
  private[tsdb] def decodeExemplarsOfRequest(p: Array[Byte])
      : Seq[(Map[String, String], Map[String, String], Double, Long)] = {
    {
      val raw = Snappy.uncompress(p)
      val out = Seq.newBuilder[(Map[String, String], Map[String, String], Double, Long)]
      def readLabel(s: Int, e: Int): (String, String) = {
        val lr = new ProtoReader(raw, s, e)
        var name = ""; var value = ""
        while (lr.hasMore) {
          val (lf, lw) = lr.key()
          if (lf == 1 && lw == 2) name = lr.string()
          else if (lf == 2 && lw == 2) value = lr.string()
          else lr.skip(lw)
        }
        (name, value)
      }
      val req = new ProtoReader(raw, 0, raw.length)
      while (req.hasMore) {
        val (field, wire) = req.key()
        if (field == 1 && wire == 2) {
          val (s, e) = req.delimited()
          val ts = new ProtoReader(raw, s, e)
          val labels = Map.newBuilder[String, String]
          val exRanges = Seq.newBuilder[(Int, Int)]
          while (ts.hasMore) {
            val (f, w) = ts.key()
            if (f == 1 && w == 2) { val r = ts.delimited(); labels += readLabel(r._1, r._2) }
            else if (f == 3 && w == 2) exRanges += ts.delimited()
            else ts.skip(w)
          }
          val lm = labels.result()
          exRanges.result().foreach { case (es, ee) =>
            val er = new ProtoReader(raw, es, ee)
            val exLabels = Map.newBuilder[String, String]
            var v = 0.0; var t = 0L
            while (er.hasMore) {
              val (f, w) = er.key()
              if (f == 1 && w == 2) { val r = er.delimited(); exLabels += readLabel(r._1, r._2) }
              else if (f == 2 && w == 1) v = java.lang.Double.longBitsToDouble(er.fixed64())
              else if (f == 3 && w == 0) t = er.varint()
              else er.skip(w)
            }
            out += ((lm, exLabels.result(), v, t))
          }
        } else req.skip(wire)
      }
      out.result()
    }
  }

  /** Spec/fixture helper: one TimeSeries carrying NATIVE HISTOGRAMS
    * (field 4) — the v1 encoder twin of [[decodeHistsOfRequest]]. */
  def encodeSeriesWithHistograms(labels: Seq[(String, String)],
                                 hists: Seq[SparseHist]): Array[Byte] = {
    val w = new ProtoWriter
    labels.sortBy(_._1).foreach { case (n, v) =>
      val lw = new ProtoWriter
      lw.string(1, n); lw.string(2, v)
      w.bytes(1, lw.toBytes)
    }
    hists.foreach(h => w.bytes(4, encodeHistogram(h)))
    w.toBytes
  }

  /** Spec/fixture helper: one TimeSeries carrying exemplars (field 3)
    * alongside its samples — the encoder twin of [[decodeExemplars]]. */
  def encodeSeriesWithExemplars(
      labels: Seq[(String, String)], samples: Seq[(Long, Double)],
      exemplars: Seq[(Seq[(String, String)], Double, Long)]): Array[Byte] = {
    val w = new ProtoWriter
    labels.sortBy(_._1).foreach { case (n, v) =>
      val lw = new ProtoWriter
      lw.string(1, n); lw.string(2, v)
      w.bytes(1, lw.toBytes)
    }
    samples.sortBy(_._1).foreach { case (t, v) =>
      val sw = new ProtoWriter
      sw.fixed64(1, java.lang.Double.doubleToRawLongBits(v)); sw.int64(2, t)
      w.bytes(2, sw.toBytes)
    }
    exemplars.foreach { case (exLabels, v, t) =>
      val ew = new ProtoWriter
      exLabels.sortBy(_._1).foreach { case (n, lv) =>
        val lw = new ProtoWriter
        lw.string(1, n); lw.string(2, lv)
        ew.bytes(1, lw.toBytes)
      }
      ew.fixed64(2, java.lang.Double.doubleToRawLongBits(v))
      ew.int64(3, t)
      w.bytes(3, ew.toBytes)
    }
    w.toBytes
  }
}
