package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

/** The remote-write wire codec: round-trip identity, golden bytes
  * (hand-assembled prompb), proto3 unknown-field tolerance, and the
  * payload-file backfill entry point. */
class RemoteWriteSpec extends SparkSpec {

  private def longForm(rows: Seq[(Long, Double, Map[String, String])]) = {
    val s = spark; import s.implicits._
    rows.toDF("time", "value", "labels")
  }

  private val fixture = Seq(
    (1000L, 1.5, Map("__name__" -> "http_requests", "job" -> "api", "code" -> "200")),
    (2000L, 2.5, Map("__name__" -> "http_requests", "job" -> "api", "code" -> "200")),
    (1000L, -0.25, Map("__name__" -> "http_requests", "job" -> "api", "code" -> "500")),
    // empty label value ≡ absent per Prometheus; keep it to prove the
    // codec carries it verbatim (matcher semantics are a later layer)
    (1500L, 0.0, Map("__name__" -> "up", "env" -> "")),
    // non-ASCII label value (UTF-8 length-delimited strings)
    (3000L, 7.0, Map("__name__" -> "up", "env" -> "prod-€µ")))

  test("decode(encode(x)) = x exactly, including payload batching") {
    val df = longForm(fixture)
    for (perReq <- Seq(1, 2, 500)) {
      val back = RemoteWrite.decode(RemoteWrite.encode(df, perReq))
        .select(col("time"), col("value"), col("labels"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          r.getMap[String, String](2).toMap))
        .toSet
      assert(back === fixture.toSet, s"seriesPerRequest=$perReq")
    }
  }

  test("golden bytes: hand-assembled prompb WriteRequest decodes exactly") {
    // WriteRequest{ TimeSeries{ Label{"__name__","up"}, Label{"job","x"},
    //               Sample{v=1.0, t=300} } } assembled byte-by-byte from
    // the proto3 wire spec, independent of our writer.
    def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte]((field << 3 | 2).toByte, body.length.toByte) ++ body
    def protoStr(field: Int, s: String): Array[Byte] =
      lenDelim(field, s.getBytes("UTF-8"))
    val label1 = protoStr(1, "__name__") ++ protoStr(2, "up")
    val label2 = protoStr(1, "job") ++ protoStr(2, "x")
    val sample = Array[Byte](0x09, // field 1, wire 1 (fixed64)
        0, 0, 0, 0, 0, 0, -16, 0x3f) ++ // little-endian 1.0
      Array[Byte](0x10, (300 & 0x7f | 0x80).toByte, (300 >> 7).toByte) // int64 t=300
    val ts = lenDelim(1, label1) ++ lenDelim(1, label2) ++ lenDelim(2, sample)
    val req = Snappy.compress(lenDelim(1, ts))
    assert(RemoteWrite.decodeRequest(req) ===
      Seq((300L, 1.0, Map("__name__" -> "up", "job" -> "x"))))
  }

  test("unknown fields (exemplars/metadata/histograms slots) are skipped") {
    // Our encoder's own payload, decompressed, with an extra unknown
    // field spliced into the request (field 3, a length-delimited blob —
    // where prompb puts Metadata) and one into a fresh TimeSeries
    // (field 3 = exemplars). A spec-following decoder skips both.
    val base = RemoteWrite.encodeRequest(Seq.empty)
    assert(RemoteWrite.decodeRequest(base) === Seq.empty)

    def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte]((field << 3 | 2).toByte, body.length.toByte) ++ body
    def protoStr(field: Int, s: String): Array[Byte] =
      lenDelim(field, s.getBytes("UTF-8"))
    val label = protoStr(1, "__name__") ++ protoStr(2, "up")
    val sample = Array[Byte](0x09, 0, 0, 0, 0, 0, 0, -16, 0x3f,
      0x10, 0x05) // v=1.0 t=5
    val exemplar = lenDelim(3, Array[Byte](1, 2, 3)) // unknown in TimeSeries
    val varintUnknown = Array[Byte](0x20, 0x2a) // field 4, wire 0, value 42
    val ts = lenDelim(1, label) ++ exemplar ++ lenDelim(2, sample) ++ varintUnknown
    val metadata = lenDelim(3, Array[Byte](9, 9)) // unknown in WriteRequest
    val req = Snappy.compress(lenDelim(1, ts) ++ metadata)
    assert(RemoteWrite.decodeRequest(req) ===
      Seq((5L, 1.0, Map("__name__" -> "up"))))
  }

  test("metadata round-trips: WriteRequest.metadata decodes per prompb") {
    val req = RemoteWrite.encodeRequestWithMetadata(
      series = Seq(RemoteWrite.encodeSeries(
        Seq("__name__" -> "m1"), Seq(1L -> 1.0))),
      metadata = Seq(
        (1, "m1", "a counter", "seconds"),
        (0, "m2", "", ""),          // UNKNOWN type, no help/unit
        (3, "m3", "buckets", "")))
    assert(RemoteWrite.decodeMetadataOfRequest(req) === Seq(
      ("m1", "counter", "seconds", "a counter"),
      ("m2", "unknown", "", ""),
      ("m3", "histogram", "", "buckets")))
    // samples in the same request still decode
    assert(RemoteWrite.decodeRequest(req) ===
      Seq((1L, 1.0, Map("__name__" -> "m1"))))
    // a metadata-free request decodes to no metadata
    assert(RemoteWrite.decodeMetadataOfRequest(
      RemoteWrite.encodeRequest(Seq.empty)) === Seq.empty)
  }

  test("payload-file backfill: fromPayloadFiles over captured requests") {
    val dir = tmpDir("graft_rw_")
    val payloads = RemoteWrite.encode(longForm(fixture), seriesPerRequest = 2)
      .collect()
    payloads.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"req_$i.bin"), p)
    }
    val back = RemoteWrite.fromPayloadFiles(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getMap[String, String](2).toMap))
      .toSet
    assert(back === fixture.toSet)
  }

  test("encoder emits sorted labels and time-sorted samples (deterministic)") {
    val df = longForm(fixture)
    val a = RemoteWrite.encode(df, 500).collect().map(_.toSeq).toSet
    val b = RemoteWrite.encode(df, 500).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  // ---- native histograms over the wire ----

  test("dense→wire→dense histogram round trip equals the direct build") {
    import org.apache.spark.sql.Row
    val s = spark; import s.implicits._
    // raw observations per series, including zero/negative (zero bucket),
    // in-range and overflow values
    val obs = Seq(
      ("a", 0.5), ("a", 1.5), ("a", 100.0), ("a", 600.0), ("a", -3.0),
      ("b", 0.0), ("b", 2.0), ("b", 2.0), ("b", 512.0))
      .toDF("series", "v")
    val dense = NativeHistogram.buildExp(obs, Seq(col("series")), col("v"),
      schema = 0, minExp = 0, maxExp = 9)
      .select(lit(1000L).as("time"),
        map(lit("s"), col("series")).as("labels"), col("hist"))
    val wire = RemoteWrite.encodeHistRequests(dense, 0, 0, 9)
    val back = RemoteWrite.denseFromSparse(
      RemoteWrite.decodeHistRequests(wire), 0, 0, 9)
    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, Double, Double, Seq[Double])] =
      df.select(col("labels")("s"), col("hist.count"), col("hist.sum"),
          col("hist.counts")).collect().toSet.map { (r: Row) =>
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getSeq[Double](3))
      }
    assert(canon(back) === canon(dense))
  }

  test("golden integer histogram: spans + zigzag deltas decode exactly") {
    // Histogram{count_int=7, sum=12.5, schema=0, zero_count_int=2,
    //   positive_spans=[{offset=1,len=2},{offset=2,len=1}],
    //   positive_deltas=[2,-1,3]}  → buckets idx1→2, idx2→1, idx5→4
    def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte]((field << 3 | 2).toByte, body.length.toByte) ++ body
    def vint(field: Int, v: Long): Array[Byte] =
      Array[Byte]((field << 3).toByte, v.toByte) // single-byte varints only
    def zz(v: Long): Long = (v << 1) ^ (v >> 63)
    val span1 = vint(1, zz(1)) ++ vint(2, 2)
    val span2 = vint(1, zz(2)) ++ vint(2, 1)
    val deltas = lenDelim(12, Array[Byte](zz(2).toByte, zz(-1).toByte, zz(3).toByte))
    val sumBytes = {
      val bits = java.lang.Double.doubleToLongBits(12.5)
      Array[Byte](0x19) ++ (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte)
    } // field 3, wire 1
    val hist = vint(1, 7) ++ sumBytes ++ vint(4, zz(0)) ++ vint(6, 2) ++
      lenDelim(11, span1) ++ lenDelim(11, span2) ++ deltas
    val label = lenDelim(1, "__name__".getBytes("UTF-8")) ++
      lenDelim(2, "lat".getBytes("UTF-8"))
    val ts = lenDelim(1, label) ++ lenDelim(4, hist)
    val req = org.xerial.snappy.Snappy.compress(lenDelim(1, ts))
    val s = spark; import s.implicits._
    val got = RemoteWrite.decodeHistRequests(Seq(req).toDS()).collect().toSeq
    assert(got.size === 1)
    val h = got.head
    assert(h.count === 7.0)
    assert(h.sum === 12.5)
    assert(h.schema === 0)
    assert(h.zeroCount === 2.0)
    assert(h.positive === Seq((1, 2.0), (2, 1.0), (5, 4.0)))
    assert(h.negative === Seq.empty)
  }

  test("densification folds zero/negative/underflow/overflow correctly") {
    val s = spark; import s.implicits._
    // schema 0, minExp 0, maxExp 2 → les [0, 1, 2, 4, +Inf], 5 positions
    val sparse = Seq(RemoteWrite.SparseHist(
      time = 5L, labels = Map("m" -> "x"), count = 20.0, sum = 9.0,
      schema = 0, zeroThreshold = 0.0, zeroCount = 3.0,
      positive = Seq((-2, 1.0), (0, 2.0), (1, 4.0), (2, 5.0), (3, 6.0), (9, 7.0)),
      negative = Seq((1, 2.0)))).toDS()
    val dense = RemoteWrite.denseFromSparse(sparse, 0, 0, 2)
      .select(col("hist.counts")).collect().head.getSeq[Double](0)
    // pos idx ≤ 0 (underflow -2, 0) joins bucket (0,1] with idx... idx<=minExp=0
    // → position 1: 1+2=3; idx 1 → pos 2: 4; idx 2 → pos 3: 5;
    // idx 3, 9 overflow → last: 6+7=13; zero+negative → pos 0: 3+2=5
    assert(dense === Seq(5.0, 3.0, 4.0, 5.0, 13.0))
  }

  // ---- exemplars over the wire ----

  test("exemplars decode with series and exemplar label sets") {
    val s = spark; import s.implicits._
    val ts = RemoteWrite.encodeSeriesWithExemplars(
      labels = Seq("__name__" -> "latency", "job" -> "api"),
      samples = Seq((100L, 0.5)),
      exemplars = Seq(
        (Seq("trace_id" -> "abc123"), 0.93, 105L),
        (Seq("trace_id" -> "def456", "span_id" -> "s1"), 1.07, 110L)))
    val req = RemoteWrite.encodeRequest(Seq(ts))
    val got = RemoteWrite.decodeExemplars(Seq(req).toDS())
      .collect().map(r => (r.getMap[String, String](0).toMap,
        r.getMap[String, String](1).toMap, r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (Map("__name__" -> "latency", "job" -> "api"),
        Map("trace_id" -> "abc123"), 0.93, 105L),
      (Map("__name__" -> "latency", "job" -> "api"),
        Map("trace_id" -> "def456", "span_id" -> "s1"), 1.07, 110L)))
    // and the SAME payload still yields its samples through decode()
    val samples = RemoteWrite.decodeRequest(req)
    assert(samples === Seq((100L, 0.5,
      Map("__name__" -> "latency", "job" -> "api"))))
  }

  test("packed histogram fields split across field occurrences decode as one") {
    // proto3 merge rule: a packed repeated field may legally arrive as
    // SEVERAL occurrences of the same field number — chunks concatenate,
    // and for the sint64 delta form the prefix-sum accumulator threads
    // across chunks instead of restarting at zero
    import RemoteWrite._
    def zz(v: Long): Long = (v << 1) ^ (v >> 63)
    def span(w: ProtoWriter, field: Int, off: Int, len: Int): Unit = {
      val sw = new ProtoWriter
      sw.key(1, 0); sw.varint(zz(off.toLong)); sw.int64(2, len.toLong)
      w.bytes(field, sw.toBytes)
    }
    def packedDeltas(deltas: Seq[Long]): Array[Byte] = {
      val pw = new ProtoWriter; deltas.foreach(d => pw.varint(zz(d))); pw.toBytes
    }
    def packedDoubles(vs: Seq[Double]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      vs.foreach { v =>
        var x = java.lang.Double.doubleToLongBits(v); var i = 0
        while (i < 8) { out.write((x & 0xff).toInt); x >>>= 8; i += 1 }
      }
      out.toByteArray
    }

    // int/delta form: positive deltas (2,+1,+2,-1) split 2|2, and an
    // independent negative run split 1|1 — separate accumulators
    val w = new ProtoWriter
    w.int64(1, 17)                                     // count_int
    w.fixed64(3, java.lang.Double.doubleToLongBits(1.5)) // sum
    w.key(4, 0); w.varint(zz(0))                       // schema
    span(w, 8, 0, 2)                                   // negative span
    w.bytes(9, packedDeltas(Seq(2L)))                  // neg chunk 1
    w.bytes(9, packedDeltas(Seq(1L)))                  // neg chunk 2
    span(w, 11, 0, 4)                                  // positive span
    w.bytes(12, packedDeltas(Seq(2L, 1L)))             // pos chunk 1
    w.bytes(12, packedDeltas(Seq(2L, -1L)))            // pos chunk 2
    w.int64(15, 1234)
    val raw = w.toBytes
    val h = RemoteWrite.decodeHistogram(raw, 0, raw.length, Map("x" -> "y"))
    assert(h.positive === Seq((0, 2.0), (1, 3.0), (2, 5.0), (3, 4.0)))
    assert(h.negative === Seq((0, 2.0), (1, 3.0)))
    assert(h.count === 17.0 && h.time === 1234L && h.labels === Map("x" -> "y"))

    // float form (packed fixed64): chunks concatenate, no delta state
    val wf = new ProtoWriter
    wf.fixed64(2, java.lang.Double.doubleToLongBits(14.0)) // count_float
    wf.fixed64(3, java.lang.Double.doubleToLongBits(1.5))
    wf.key(4, 0); wf.varint(zz(0))
    span(wf, 11, 0, 4)
    wf.bytes(13, packedDoubles(Seq(2.0, 3.0)))
    wf.bytes(13, packedDoubles(Seq(5.0, 4.0)))
    wf.int64(15, 99)
    val rawF = wf.toBytes
    val hf = RemoteWrite.decodeHistogram(rawF, 0, rawF.length, Map.empty)
    assert(hf.positive === Seq((0, 2.0), (1, 3.0), (2, 5.0), (3, 4.0)))
  }
}
