package graft.tsdb

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

import RemoteWrite.{ProtoReader, ProtoWriter, SparseHist}

/** Prometheus REMOTE-WRITE 2.0 wire codec — the snappy-compressed
  * `io.prometheus.write.v2.Request` of the PRW 2.0 specification
  * (Prometheus 3's preferred content type,
  * `application/x-protobuf;proto=io.prometheus.write.v2.Request`).
  * The 2.0 redesign is STRING INTERNING: a request carries one
  * `symbols` table and every label/exemplar-label/metadata string is a
  * uint32 ref into it — typically 2-4× smaller on the wire than 1.0's
  * repeated label strings, which at 100 TB/day of telemetry is the
  * difference that motivated the protocol.
  *
  * Proto shape (public spec, io/prometheus/write/v2/types.proto):
  *
  *   Request    { repeated string symbols = 4;
  *                repeated TimeSeries timeseries = 5; }
  *   TimeSeries { repeated uint32 labels_refs = 1 [packed];
  *                repeated Sample samples = 2;
  *                repeated Exemplar exemplars = 3;
  *                repeated Histogram histograms = 4;
  *                Metadata metadata = 5;
  *                int64 created_timestamp = 6; }
  *   Sample     { double value = 1; int64 timestamp = 2; }
  *   Exemplar   { repeated uint32 labels_refs = 1 [packed];
  *                double value = 2; int64 timestamp = 3; }
  *   Metadata   { MetricType type = 1; uint32 help_ref = 3;
  *                uint32 unit_ref = 4; }
  *
  * `labels_refs` is the flat `[name_ref, value_ref, …]` pair list; the
  * spec REQUIRES `symbols[0] = ""`. `Histogram` is the same message as
  * 1.0's, so the span/delta codec is shared with [[RemoteWrite]].
  *
  * Same Spark shape as the 1.0 codec: decode is a map-side flatMap
  * (scan-speed backfill, no shuffle); encode pays the one series
  * groupBy and builds each request's symbol table inside the task.
  * Encoding is deterministic (sorted symbols, sorted labels, sorted
  * samples), so `decode(encode(x)) = x` puts the whole 2.0 binary path
  * under the DuckDB identity oracle (`tsdb_q120_remote_write2`), and
  * the histogram path replays the exponential-grid oracle
  * (`tsdb_q121_remote_write2_hist`).
  */
object RemoteWrite2 {

  /** Metric types, by wire enum value (Metadata.MetricType). */
  val TypeNames: Seq[String] = Seq("unspecified", "counter", "gauge",
    "histogram", "gaugehistogram", "summary", "info", "stateset")

  // ---- request assembly ---------------------------------------------

  /** One request's symbol table: "" first (spec rule), the rest sorted
    * for deterministic encoding. */
  private def symbolTable(strings: Iterable[String])
      : (Seq[String], Map[String, Int]) = {
    val syms = "" +: strings.toSeq.distinct.filterNot(_.isEmpty).sorted
    (syms, syms.zipWithIndex.toMap)
  }

  private def packedRefs(w: ProtoWriter, field: Int, refs: Seq[Int]): Unit = {
    if (refs.isEmpty) return
    val pw = new ProtoWriter
    refs.foreach(r => pw.varint(r.toLong))
    w.bytes(field, pw.toBytes)
  }

  /** One series' worth of RW2 payload content. `createdTimestamp`
    * (field 6, ms) is the series' created/reset time — the v2 twin of
    * OTLP's `start_time_unix_nano`; 0 = not sent. */
  final case class Rw2Series(
      labels: Seq[(String, String)],
      samples: Seq[(Long, Double)] = Nil,
      exemplars: Seq[(Seq[(String, String)], Double, Long)] = Nil,
      histograms: Seq[SparseHist] = Nil,
      metricType: Int = 0, unit: String = "", help: String = "",
      createdTimestamp: Long = 0L)

  /** A snappy-compressed v2 Request from whole series. */
  def encodeRequest(series: Seq[Rw2Series]): Array[Byte] = {
    val strings = series.flatMap { s =>
      s.labels.flatMap(p => Seq(p._1, p._2)) ++
        s.exemplars.flatMap(_._1.flatMap(p => Seq(p._1, p._2))) ++
        Seq(s.unit, s.help)
    }
    val (syms, ref) = symbolTable(strings)
    val w = new ProtoWriter
    syms.foreach(w.string(4, _))
    series.foreach { s =>
      val tw = new ProtoWriter
      packedRefs(tw, 1, s.labels.sortBy(_._1)
        .flatMap(p => Seq(ref(p._1), ref(p._2))))
      s.samples.sortBy(_._1).foreach { case (t, v) =>
        val sw = new ProtoWriter
        sw.fixed64(1, java.lang.Double.doubleToRawLongBits(v)); sw.int64(2, t)
        tw.bytes(2, sw.toBytes)
      }
      s.exemplars.foreach { case (lbls, v, t) =>
        val ew = new ProtoWriter
        packedRefs(ew, 1, lbls.sortBy(_._1)
          .flatMap(p => Seq(ref(p._1), ref(p._2))))
        ew.fixed64(2, java.lang.Double.doubleToRawLongBits(v))
        ew.int64(3, t)
        tw.bytes(3, ew.toBytes)
      }
      s.histograms.foreach(h => tw.bytes(4, RemoteWrite.encodeHistogram(h)))
      if (s.metricType != 0 || s.unit.nonEmpty || s.help.nonEmpty) {
        val mw = new ProtoWriter
        if (s.metricType != 0) mw.int64(1, s.metricType.toLong)
        if (s.help.nonEmpty) mw.int64(3, ref(s.help).toLong)
        if (s.unit.nonEmpty) mw.int64(4, ref(s.unit).toLong)
        tw.bytes(5, mw.toBytes)
      }
      if (s.createdTimestamp != 0L) tw.int64(6, s.createdTimestamp)
      w.bytes(5, tw.toBytes)
    }
    Snappy.compress(w.toBytes)
  }

  // ---- request decode -----------------------------------------------

  /** Decode one v2 Request fully. Two passes over the raw buffer —
    * proto fields may arrive in any order, and `timeseries` refs are
    * only resolvable once every `symbols` entry is known. Unknown
    * fields skip at every level (proto3 tolerance). */
  def decodeRequest(payload: Array[Byte]): Seq[Rw2Series] = {
    val raw = Snappy.uncompress(payload)
    val syms = Seq.newBuilder[String]
    val spans = Seq.newBuilder[(Int, Int)]
    val req = new ProtoReader(raw, 0, raw.length)
    while (req.hasMore) {
      val (field, wire) = req.key()
      if (field == 4 && wire == 2) syms += req.string()
      else if (field == 5 && wire == 2) spans += req.delimited()
      else req.skip(wire)
    }
    val symbols = syms.result().toIndexedSeq
    def readRefs(s: Int, e: Int): Seq[Int] = {
      val rr = new ProtoReader(raw, s, e)
      val out = Seq.newBuilder[Int]
      while (rr.hasMore) out += rr.varint().toInt
      out.result()
    }
    def toLabels(refs: Seq[Int]): Seq[(String, String)] =
      refs.grouped(2).collect { case Seq(n, v) =>
        symbols(n) -> symbols(v)
      }.toSeq
    spans.result().map { case (s, e) =>
      val ts = new ProtoReader(raw, s, e)
      // packed refs may legally arrive unpacked (one varint per key) —
      // accumulate the flat list either way, pair up at the end
      val labelRefs = Seq.newBuilder[Int]
      val samples = Seq.newBuilder[(Long, Double)]
      val exemplars = Seq.newBuilder[(Seq[(String, String)], Double, Long)]
      val hists = Seq.newBuilder[SparseHist]
      var mType = 0; var unit = ""; var help = ""
      var created = 0L
      while (ts.hasMore) {
        val (f, w) = ts.key()
        (f, w) match {
          case (1, 2) => val (rs, re) = ts.delimited()
            labelRefs ++= readRefs(rs, re)
          case (1, 0) => labelRefs += ts.varint().toInt
          case (2, 2) =>
            val (ss, se) = ts.delimited()
            val sr = new ProtoReader(raw, ss, se)
            var v = 0.0; var t = 0L
            while (sr.hasMore) {
              val (sf, sw) = sr.key()
              if (sf == 1 && sw == 1)
                v = java.lang.Double.longBitsToDouble(sr.fixed64())
              else if (sf == 2 && sw == 0) t = sr.varint()
              else sr.skip(sw)
            }
            samples += ((t, v))
          case (3, 2) =>
            val (es, ee) = ts.delimited()
            val er = new ProtoReader(raw, es, ee)
            var elbls = Seq.empty[(String, String)]
            var v = 0.0; var t = 0L
            while (er.hasMore) {
              val (ef, ew) = er.key()
              if (ef == 1 && ew == 2) {
                val (rs, re) = er.delimited()
                elbls = toLabels(readRefs(rs, re))
              } else if (ef == 2 && ew == 1)
                v = java.lang.Double.longBitsToDouble(er.fixed64())
              else if (ef == 3 && ew == 0) t = er.varint()
              else er.skip(ew)
            }
            exemplars += ((elbls, v, t))
          case (4, 2) =>
            val (hs, he) = ts.delimited()
            hists += RemoteWrite.decodeHistogram(raw, hs, he, Map.empty)
          case (5, 2) =>
            val (ms, me) = ts.delimited()
            val mr = new ProtoReader(raw, ms, me)
            while (mr.hasMore) {
              val (mf, mw) = mr.key()
              if (mf == 1 && mw == 0) mType = mr.varint().toInt
              else if (mf == 3 && mw == 0) help = symbols(mr.varint().toInt)
              else if (mf == 4 && mw == 0) unit = symbols(mr.varint().toInt)
              else mr.skip(mw)
            }
          case (6, 0) => created = ts.varint() // created_timestamp
          case (_, wire) => ts.skip(wire)
        }
      }
      val labels = toLabels(labelRefs.result())
      Rw2Series(labels, samples.result(), exemplars.result(),
        hists.result().map(h => h.copy(labels = labels.toMap)),
        mType, unit, help, created)
    }
  }

  // ---- Spark surface ------------------------------------------------

  private[tsdb] final case class SeriesRow(labels: Seq[(String, String)],
                                           samples: Seq[(Long, Double)])
  private[tsdb] final case class LongRow(time: Long, value: Double,
                                         labels: Map[String, String])

  /** Long-form samples → v2 payloads: one shuffle (series groupBy),
    * then per-partition packing with a per-request symbol table —
    * identical plan shape to the 1.0 encoder, smaller bytes. */
  def encode(samples: DataFrame, seriesPerRequest: Int = 500,
             metricType: Int = 2): Dataset[Array[Byte]] = {
    val spark = samples.sparkSession
    import spark.implicits._
    // pinned-width grouping — see [[RemoteWrite.encode]]
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
          encodeRequest(group.map(s =>
            Rw2Series(s.labels, s.samples, metricType = metricType)))
        }
      }(Encoders.BINARY)
  }

  /** v2 payloads → long-form samples. Map-side only. */
  def decode(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap { p =>
      decodeRequest(p).flatMap(s =>
        s.samples.map { case (t, v) => LongRow(t, v, s.labels.toMap) })
    }.toDF()
  }

  /** Dense engine histograms → v2 payloads (the 2.0 twin of
    * [[RemoteWrite.encodeHistRequests]] — same dense→sparse grid
    * mapping, symbol-interned framing). */
  def encodeHistRequests(df: DataFrame, schemaId: Int, minExp: Int,
                         maxExp: Int,
                         seriesPerRequest: Int = 500): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    // pinned-width grouping — see [[RemoteWrite.encode]]
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
      .as[(Seq[(String, String)],
           Seq[(Long, Double, Double, Double, Seq[Double])])]
      .mapPartitions { it =>
        it.grouped(seriesPerRequest).map { group =>
          encodeRequest(group.map { case (labels, hists) =>
            Rw2Series(labels,
              histograms = hists.sortBy(_._1).map {
                case (t, cnt, sm, zero, buckets) =>
                  val sparse = buckets.zipWithIndex.collect {
                    case (c, i) if c != 0.0 => (minExp + i, c)
                  }
                  SparseHist(t, Map.empty, cnt, sm, schemaId, 0.0, zero,
                    sparse, Seq.empty)
              },
              metricType = 3)
          })
        }
      }(Encoders.BINARY)
  }

  /** v2 payloads → sparse histograms with series labels attached. */
  def decodeHistRequests(payloads: Dataset[Array[Byte]]): Dataset[SparseHist] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(p => decodeRequest(p).flatMap(_.histograms))
  }
}
