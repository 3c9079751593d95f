package graft.tsdb

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import RemoteWrite.{ProtoReader, ProtoWriter, SparseHist}

/** OTLP/HTTP **binary protobuf** metrics — the encoding an OTel
  * collector's `otlphttp` exporter actually sends, and the one
  * Prometheus's own OTLP receiver (`/api/v1/otlp/v1/metrics`,
  * Prometheus ≥ 2.47) accepts. Field numbers follow the public
  * `opentelemetry-proto` `metrics.proto`:
  * ExportMetricsServiceRequest.resource_metrics = 1;
  * ResourceMetrics{resource = 1, scope_metrics = 2};
  * ScopeMetrics{scope = 1, metrics = 2};
  * Metric{name = 1, gauge = 5, sum = 7, histogram = 9,
  * exponential_histogram = 10, summary = 11};
  * NumberDataPoint{time_unix_nano = 3 fixed64, as_double = 4,
  * as_int = 6 sfixed64, attributes = 7};
  * SummaryDataPoint{time_unix_nano = 3 fixed64, count = 4 fixed64,
  * sum = 5, quantile_values = 6 {quantile = 1, value = 2},
  * attributes = 7};
  * ExponentialHistogramDataPoint{attributes = 1, time = 3, count = 4
  * fixed64, sum = 5, scale = 6 sint32, zero_count = 7 fixed64,
  * positive = 8, negative = 9, zero_threshold = 14} with
  * Buckets{offset = 1 sint32, bucket_counts = 2 packed uint64};
  * KeyValue{key = 1, value = 2} / AnyValue{string_value = 1}.
  *
  * This is the JSON tier's ([[SampleReaders.fromOtlpJsonLines]] et al.)
  * binary twin, sharing the SAME semantics: metric-point attributes
  * become labels, the metric name lands as `__name__`, exp-hist bucket
  * index `j = offset + i + 1` (the OTel→Prometheus shift), packed
  * repeated fields accumulate across occurrences (proto3 merge rule —
  * the same contract [[RemoteWrite.decodeHistogram]] honors). RESOURCE
  * attributes follow Prometheus's translation: the identifying trio
  * (`service.name`/`service.namespace`/`service.instance.id`) promotes
  * to `job`/`instance` on every series, and the remaining attributes
  * route to `target_info` ([[decodeTargetInfo]], served by the PromQL
  * `info()` tier) — never onto every series.
  *
  * Scale shape: decode is a map-side flatMap over payload byte arrays
  * (no shuffle — the [[RemoteWrite.decode]] shape); encode is one
  * request per row, map-side. */
object OtlpProto {

  // ---- decode ---------------------------------------------------------

  /** Gauge + Sum data points of every request → long-form samples
    * `(time ms, value, labels)` — map-side. */
  def decodeRequests(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(decodeSamples _)
      .toDF("time", "value", "labels")
  }

  /** Exponential-histogram data points of every request → the
    * wire-sparse [[RemoteWrite.SparseHist]] rows
    * [[RemoteWrite.denseFromSparse]] densifies — map-side. */
  def decodeHistRequests(payloads: Dataset[Array[Byte]]): Dataset[SparseHist] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(decodeHists _)
  }

  private[tsdb] def decodeSamples(raw: Array[Byte])
      : Seq[(Long, Double, Map[String, String])] =
    decodeSamplesFull(raw).map { case (t, v, ls, _, _) => (t, v, ls) }

  /** Point KINDS the receiver's translation strategy needs:
    * Gauge; Sum split by `aggregation_temporality` (field 2 enum:
    * 1 = DELTA, 2 = CUMULATIVE) and `is_monotonic` (field 3). */
  private[tsdb] val KindGauge = 0
  private[tsdb] val KindCounter = 1 // cumulative monotonic sum
  private[tsdb] val KindSum = 2     // cumulative non-monotonic sum
  private[tsdb] val KindDeltaSum = 3

  /** Full-fidelity gauge/sum decode: `(time ms, value, labels, kind,
    * start time ms)`. The START TIME (`start_time_unix_nano`, field 2
    * — OTel's created/reset timestamp) rides along so the receiver can
    * implement Prometheus's `created-timestamp-zero-ingestion` (a zero
    * sample at the start time seeds counter-reset detection); 0 when
    * the producer sent none. */
  private[tsdb] def decodeSamplesFull(raw: Array[Byte])
      : Seq[(Long, Double, Map[String, String], Int, Long)] = {
    val out = Seq.newBuilder[(Long, Double, Map[String, String], Int, Long)]
    foreachMetricWithResource(raw) { (res, name, field, s, e) =>
      if (field == 5 || field == 7) { // gauge / sum
        val g = new ProtoReader(raw, s, e)
        var temporality = 0; var monotonic = false
        val points = Seq.newBuilder[(Long, Double, Map[String, String], Long)]
        while (g.hasMore) g.key() match {
          case (1, 2) => // data_points
            val (ds, de) = g.delimited()
            val dp = new ProtoReader(raw, ds, de)
            var t = 0L; var v = 0.0; var has = false; var flags = 0L
            var start = 0L
            var labels = Map("__name__" -> name)
            while (dp.hasMore) dp.key() match {
              case (2, 1) => start = dp.fixed64() // start_time_unix_nano
              case (3, 1) => t = dp.fixed64()
              case (4, 1) =>
                v = java.lang.Double.longBitsToDouble(dp.fixed64()); has = true
              case (6, 1) => v = dp.fixed64().toDouble; has = true
              case (7, 2) =>
                val (as, ae) = dp.delimited()
                readAttr(raw, as, ae).foreach(kv => labels += kv)
              case (8, 0) => flags = dp.varint() // DataPointFlags
              case (_, w) => dp.skip(w)
            }
            // FLAG_NO_RECORDED_VALUE (bit 0) is OTel's staleness signal:
            // the point becomes a StaleNaN sample (Prometheus's OTLP
            // translation), which the receiver maps to the engine's
            // NULL-value staleness row — the instant kernel then ends
            // the series at it. Such points legally omit the value.
            if (noRecorded(flags))
              points += ((divNsToMs(t), StaleNaN, labels, divNsToMs(start)))
            else if (has)
              points += ((divNsToMs(t), v, labels, divNsToMs(start)))
          case (2, 0) => temporality = g.varint().toInt // Sum only
          case (3, 0) => monotonic = g.varint() != 0L   // Sum only
          case (_, w) => g.skip(w)
        }
        val kind =
          if (field == 5) KindGauge
          else if (temporality == 1) KindDeltaSum
          else if (monotonic) KindCounter
          else KindSum
        // resource-identifying attributes promote to job/instance on
        // every series (Prometheus's OTLP translation), overriding
        // same-named point attributes
        val promo = jobInstance(res)
        points.result().foreach { case (t, v, ls, st) =>
          out += ((t, v, ls ++ promo, kind, st)) }
      }
    }
    out.result()
  }

  private[tsdb] def decodeHists(raw: Array[Byte]): Seq[SparseHist] =
    decodeHistsFull(raw).map(_._1)

  /** Full-fidelity exponential-histogram decode: each point plus its
    * START TIME (`start_time_unix_nano`, field 2 — OTel's created/reset
    * timestamp, 0 when the producer sent none), the histogram twin of
    * [[decodeSamplesFull]]'s fifth element: the receiver's
    * created-timestamp-zero ingestion seeds an EMPTY histogram at the
    * start time so hist-tier rate/increase see the reset. */
  private[tsdb] def decodeHistsFull(raw: Array[Byte])
      : Seq[(SparseHist, Long)] = {
    val out = Seq.newBuilder[(SparseHist, Long)]
    foreachMetricWithResource(raw) { (res, name, field, s, e) =>
      if (field == 10) { // exponential_histogram
        val promo = jobInstance(res)
        val g = new ProtoReader(raw, s, e)
        // ExponentialHistogram.aggregation_temporality (field 2):
        // DELTA rejects loudly, like the Sum and classic-hist paths —
        // buffered flush because field order is not guaranteed
        var temporality = 0
        val pending = Seq.newBuilder[(SparseHist, Long)]
        while (g.hasMore) g.key() match {
          case (2, 0) => temporality = g.varint().toInt
          case (1, 2) =>
            val (ds, de) = g.delimited()
            val (p, st) = decodeExpPoint(raw, ds, de, name)
            pending += ((p.copy(labels = p.labels ++ promo), st))
          case (_, w) => g.skip(w)
        }
        requireCumulative(temporality, name, "exponential histogram")
        out ++= pending.result()
      }
    }
    out.result()
  }

  /** EXPLICIT-BOUNDS histogram data points of every request → classic
    * Prometheus series — exactly
    * [[SampleReaders.fromOtlpHistogramJsonLines]]'s mapping over the
    * binary framing: cumulative `<name>_bucket{le=<bound>}`,
    * `_bucket{le="+Inf"}` = count, `_count`, `_sum`. Map-side.
    * HistogramDataPoint{time_unix_nano = 3 fixed64, count = 4 fixed64,
    * sum = 5, bucket_counts = 6 packed fixed64, explicit_bounds = 7
    * packed double, attributes = 9 — field 1 is `reserved` (the removed
    * v0.x StringKeyValue labels), NOT attributes}. */
  def decodeClassicHistRequests(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(decodeClassicHists _)
      .toDF("time", "value", "labels")
  }

  private[tsdb] def decodeClassicHists(raw: Array[Byte])
      : Seq[(Long, Double, Map[String, String])] = {
    val out = Seq.newBuilder[(Long, Double, Map[String, String])]
    foreachMetricWithResource(raw) { (res, name, field, s, e) =>
      if (field == 9) { // histogram
        val g = new ProtoReader(raw, s, e)
        // Histogram.aggregation_temporality (field 2) splits the same
        // way the Sum path's does — and a cumulative store must reject
        // DELTA loudly: proto field order is not guaranteed, so points
        // buffer locally and flush only after the whole message is read
        var temporality = 0
        val pending = Seq.newBuilder[(Long, Double, Map[String, String])]
        while (g.hasMore) g.key() match {
          case (2, 0) => temporality = g.varint().toInt
          case (1, 2) =>
            val (ds, de) = g.delimited()
            val dp = new ProtoReader(raw, ds, de)
            var t = 0L; var count = 0.0; var sum = 0.0; var flags = 0L
            var attrs = Map.empty[String, String]
            val bc = Seq.newBuilder[Double]
            val bounds = Seq.newBuilder[Double]
            while (dp.hasMore) dp.key() match {
              case (3, 1) => t = dp.fixed64()
              case (4, 1) => count = dp.fixed64().toDouble
              case (5, 1) =>
                sum = java.lang.Double.longBitsToDouble(dp.fixed64())
              case (6, 2) => // packed fixed64 bucket_counts (merge rule)
                val (ps, pe) = dp.delimited()
                val pr = new ProtoReader(raw, ps, pe)
                while (pr.hasMore) bc += pr.fixed64().toDouble
              case (6, 1) => bc += dp.fixed64().toDouble // unpacked
              case (7, 2) => // packed double explicit_bounds
                val (ps, pe) = dp.delimited()
                val pr = new ProtoReader(raw, ps, pe)
                while (pr.hasMore)
                  bounds += java.lang.Double.longBitsToDouble(pr.fixed64())
              case (7, 1) =>
                bounds += java.lang.Double.longBitsToDouble(dp.fixed64())
              case (9, 2) =>
                val (as, ae) = dp.delimited()
                readAttr(raw, as, ae).foreach(kv => attrs += kv)
              case (10, 0) => flags = dp.varint() // DataPointFlags
              case (_, w) => dp.skip(w)
            }
            attrs = attrs ++ jobInstance(res) // resource promotion
            val ms = divNsToMs(t)
            val bs = bounds.result(); val cs = bc.result()
            // FLAG_NO_RECORDED_VALUE: EVERY derived series gets the
            // staleness marker at this timestamp (Prometheus's OTLP
            // translation does the same per series)
            val staleAll = noRecorded(flags)
            var cum = 0.0
            bs.indices.foreach { i =>
              cum += (if (i < cs.length) cs(i) else 0.0)
              pending += ((ms, if (staleAll) StaleNaN else cum, attrs ++ Map(
                "__name__" -> (name + "_bucket"),
                "le" -> bs(i).toString)))
            }
            val countV = if (staleAll) StaleNaN else count
            pending += ((ms, countV, attrs ++ Map(
              "__name__" -> (name + "_bucket"), "le" -> "+Inf")))
            pending += ((ms, countV, attrs + ("__name__" -> (name + "_count"))))
            pending += ((ms, if (staleAll) StaleNaN else sum,
              attrs + ("__name__" -> (name + "_sum"))))
          case (_, w) => g.skip(w)
        }
        requireCumulative(temporality, name, "histogram")
        out ++= pending.result()
      }
    }
    out.result()
  }

  /** Prometheus's staleness-marker double (exact bit pattern) — what
    * every `FLAG_NO_RECORDED_VALUE` point decodes to. */
  private val StaleNaN =
    java.lang.Double.longBitsToDouble(TsdbSchema.StaleNaNBits)

  /** `DataPointFlags` bit 0 (`FLAG_NO_RECORDED_VALUE`, metrics.proto):
    * the producer recorded no value at this timestamp — OTel's
    * staleness signal. */
  private def noRecorded(flags: Long): Boolean = (flags & 1L) != 0L

  /** The Sum path 400-rejects delta temporality; the histogram paths
    * must too — a delta-configured collector's histograms ingested as
    * if cumulative silently corrupt every `rate()` /
    * `histogram_quantile()` over them, with no failing query to show
    * for it. AGGREGATION_TEMPORALITY_DELTA = 1 (enum in the public
    * metrics.proto). */
  private def requireCumulative(temporality: Int, metric: String,
                                kind: String): Unit =
    if (temporality == 1)
      throw new IllegalArgumentException(
        s"delta-temporality $kind (metric $metric) is not ingestible by" +
          " a cumulative store; re-export with cumulative temporality")

  /** SUMMARY data points of every request → classic Prometheus series,
    * per the otlptranslator mapping (`prometheus/storage/remote/
    * otlptranslator`, `addSummary`): each quantile value becomes
    * `{name}{quantile="φ"}` (φ rendered like Go's
    * `strconv.FormatFloat(q, 'f', -1, 64)`), plus `{name}_count` and
    * `{name}_sum`. Field 11 of the Metric oneof — the one a
    * client-library latency metric exported through an OTel collector
    * lands on; dropping it would 200-ack the push and lose the data
    * (the exact failure class the explicit-bounds path closed). */
  def decodeSummaryRequests(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap(decodeSummaries _)
      .toDF("time", "value", "labels")
  }

  private[tsdb] def decodeSummaries(raw: Array[Byte])
      : Seq[(Long, Double, Map[String, String])] = {
    val out = Seq.newBuilder[(Long, Double, Map[String, String])]
    foreachMetricWithResource(raw) { (res, name, field, s, e) =>
      if (field == 11) { // summary
        val g = new ProtoReader(raw, s, e)
        while (g.hasMore) g.key() match {
          case (1, 2) => // data_points
            val (ds, de) = g.delimited()
            val dp = new ProtoReader(raw, ds, de)
            var t = 0L; var count = 0.0; var sum = 0.0; var flags = 0L
            var attrs = Map.empty[String, String]
            val qs = Seq.newBuilder[(Double, Double)]
            while (dp.hasMore) dp.key() match {
              case (3, 1) => t = dp.fixed64()
              case (4, 1) => count = dp.fixed64().toDouble
              case (5, 1) =>
                sum = java.lang.Double.longBitsToDouble(dp.fixed64())
              case (6, 2) => // ValueAtQuantile
                val (vs, ve) = dp.delimited()
                val vr = new ProtoReader(raw, vs, ve)
                var q = 0.0; var v = 0.0
                while (vr.hasMore) vr.key() match {
                  case (1, 1) =>
                    q = java.lang.Double.longBitsToDouble(vr.fixed64())
                  case (2, 1) =>
                    v = java.lang.Double.longBitsToDouble(vr.fixed64())
                  case (_, w) => vr.skip(w)
                }
                qs += ((q, v))
              case (7, 2) =>
                val (as, ae) = dp.delimited()
                readAttr(raw, as, ae).foreach(kv => attrs += kv)
              case (8, 0) => flags = dp.varint() // DataPointFlags
              case (_, w) => dp.skip(w)
            }
            attrs = attrs ++ jobInstance(res) // resource promotion
            val ms = divNsToMs(t)
            val staleAll = noRecorded(flags) // stale on every series
            qs.result().foreach { case (q, v) =>
              out += ((ms, if (staleAll) StaleNaN else v, attrs ++ Map(
                "__name__" -> name, "quantile" -> fmtQuantile(q))))
            }
            out += ((ms, if (staleAll) StaleNaN else count,
              attrs + ("__name__" -> (name + "_count"))))
            out += ((ms, if (staleAll) StaleNaN else sum,
              attrs + ("__name__" -> (name + "_sum"))))
          case (_, w) => g.skip(w)
        }
      }
    }
    out.result()
  }

  /** EXEMPLARS attached to any data point (`NumberDataPoint.exemplars
    * = 5`, `HistogramDataPoint.exemplars = 8`,
    * `ExponentialHistogramDataPoint.exemplars = 11`; Exemplar
    * {time_unix_nano = 2 fixed64, as_double = 3, span_id = 4 bytes,
    * trace_id = 5 bytes, as_int = 6 sfixed64, filtered_attributes =
    * 7}) → `(time ms, value, owning-series labels, exemplar labels)`.
    * Filtered attributes become exemplar labels; trace/span ids render
    * as lowercase hex — Prometheus's OTLP exemplar mapping. */
  def decodeExemplarRows(raw: Array[Byte])
      : Seq[(Long, Double, Map[String, String], Map[String, String])] = {
    val out = Seq.newBuilder[
      (Long, Double, Map[String, String], Map[String, String])]
    foreachMetricWithResource(raw) { (res, name, field, s, e) =>
      // per-kind field numbers inside the data point
      val (attrField, exField) = field match {
        case 5 | 7 => (7, 5) // NumberDataPoint
        case 9 => (9, 8)     // HistogramDataPoint
        case 10 => (1, 11)   // ExponentialHistogramDataPoint
        case _ => (-1, -1)
      }
      if (exField > 0) {
        // the owning-series labels get the SAME job/instance resource
        // promotion the sample decoders apply — otherwise an exemplar
        // pushed with resource attributes lands with a label set that
        // matches no stored series, and query_exemplars' series
        // matching can never find it
        val promo = jobInstance(res)
        val g = new ProtoReader(raw, s, e)
        while (g.hasMore) g.key() match {
          case (1, 2) => // data_points
            val (ds, de) = g.delimited()
            val dp = new ProtoReader(raw, ds, de)
            var attrs = Map("__name__" -> name)
            val exSpans = Seq.newBuilder[(Int, Int)]
            while (dp.hasMore) dp.key() match {
              case (f, 2) if f == attrField =>
                val (as, ae) = dp.delimited()
                readAttr(raw, as, ae).foreach(kv => attrs += kv)
              case (f, 2) if f == exField =>
                val (es, ee) = dp.delimited(); exSpans += ((es, ee))
              case (_, w) => dp.skip(w)
            }
            exSpans.result().foreach { case (es, ee) =>
              out += decodeExemplar(raw, es, ee, attrs ++ promo)
            }
          case (_, w) => g.skip(w)
        }
      }
    }
    out.result()
  }

  private def decodeExemplar(raw: Array[Byte], from: Int, until: Int,
      series: Map[String, String])
      : (Long, Double, Map[String, String], Map[String, String]) = {
    def hex(s: Int, e: Int): String =
      raw.slice(s, e).map(b => f"${b & 0xff}%02x").mkString
    val r = new ProtoReader(raw, from, until)
    var t = 0L; var v = 0.0
    var labels = Map.empty[String, String]
    while (r.hasMore) r.key() match {
      case (2, 1) => t = r.fixed64()
      case (3, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
      case (6, 1) => v = r.fixed64().toDouble
      case (4, 2) =>
        val (s, e) = r.delimited(); labels += ("span_id" -> hex(s, e))
      case (5, 2) =>
        val (s, e) = r.delimited(); labels += ("trace_id" -> hex(s, e))
      case (7, 2) =>
        val (s, e) = r.delimited()
        readAttr(raw, s, e).foreach(kv => labels += kv)
      case (_, w) => r.skip(w)
    }
    (divNsToMs(t), v, series, labels)
  }

  /** Go `strconv.FormatFloat(q, 'f', -1, 64)` for the quantile label:
    * shortest plain-decimal form — 0.5 → "0.5", 1 → "1", 0.99 → "0.99"
    * (Java's `Double.toString` would render 1.0 as "1.0"). */
  private[tsdb] def fmtQuantile(q: Double): String = {
    val bd = java.math.BigDecimal.valueOf(q).stripTrailingZeros()
    bd.toPlainString
  }

  private def decodeExpPoint(raw: Array[Byte], from: Int, until: Int,
                             name: String): (SparseHist, Long) = {
    val dp = new ProtoReader(raw, from, until)
    var t = 0L; var count = 0.0; var sum = 0.0; var scale = 0
    var start = 0L
    var zeroCount = 0.0; var zeroThreshold = 0.0
    var labels = Map("__name__" -> name)
    var pos = Seq.empty[(Int, Double)]; var neg = Seq.empty[(Int, Double)]
    def readBuckets(s: Int, e: Int): Seq[(Int, Double)] = {
      val b = new ProtoReader(raw, s, e)
      var offset = 0
      val counts = Seq.newBuilder[Double]
      while (b.hasMore) b.key() match {
        case (1, 0) => offset = unzigzag(b.varint()).toInt
        case (2, 2) => // packed uint64 — chunks accumulate (merge rule)
          val (ps, pe) = b.delimited()
          val pr = new ProtoReader(raw, ps, pe)
          while (pr.hasMore) counts += pr.varint().toDouble
        case (2, 0) => counts += b.varint().toDouble // unpacked form
        case (_, w) => b.skip(w)
      }
      // prom index j = otlp offset + i + 1; zero-count buckets drop
      counts.result().zipWithIndex.collect {
        case (c, i) if c != 0.0 => (offset + i + 1, c)
      }
    }
    var flags = 0L
    while (dp.hasMore) dp.key() match {
      case (2, 1) => start = dp.fixed64() // start_time_unix_nano
      case (3, 1) => t = dp.fixed64()
      case (4, 1) => count = dp.fixed64().toDouble
      case (5, 1) => sum = java.lang.Double.longBitsToDouble(dp.fixed64())
      case (6, 0) => scale = unzigzag(dp.varint()).toInt
      case (7, 1) => zeroCount = dp.fixed64().toDouble
      case (8, 2) => val (s, e) = dp.delimited(); pos ++= readBuckets(s, e)
      case (9, 2) => val (s, e) = dp.delimited(); neg ++= readBuckets(s, e)
      case (10, 0) => flags = dp.varint() // DataPointFlags
      case (14, 1) =>
        zeroThreshold = java.lang.Double.longBitsToDouble(dp.fixed64())
      case (1, 2) =>
        val (as, ae) = dp.delimited()
        readAttr(raw, as, ae).foreach(kv => labels += kv)
      case (_, w) => dp.skip(w)
    }
    // FLAG_NO_RECORDED_VALUE: a stale native histogram carries the
    // StaleNaN marker in its sum (Prometheus's otlptranslator sets
    // exactly that); the receiver's append detects the bit pattern and
    // lands a NULL-hist staleness row in the dense head
    if (noRecorded(flags))
      (SparseHist(divNsToMs(t), labels, 0.0, StaleNaN, scale, 0.0, 0.0,
        Nil, Nil), divNsToMs(start))
    else
      (SparseHist(divNsToMs(t), labels, count, sum, scale, zeroThreshold,
        zeroCount, pos, neg), divNsToMs(start))
  }

  /** Walk request → resource_metrics → scope_metrics → metrics and hand
    * each metric's data oneof plus each metric's RESOURCE attributes
    * (`ResourceMetrics.resource = 1` → `Resource.attributes = 1`) —
    * scanned in a first pass over the ResourceMetrics span because
    * proto field order is not guaranteed. */
  private def foreachMetricWithResource(raw: Array[Byte])
      (f: (Map[String, String], String, Int, Int, Int) => Unit): Unit = {
    val req = new ProtoReader(raw, 0, raw.length)
    while (req.hasMore) req.key() match {
      case (1, 2) =>
        val (rs, re) = req.delimited()
        val rm = new ProtoReader(raw, rs, re)
        var resAttrs = Map.empty[String, String]
        val smSpans = Seq.newBuilder[(Int, Int)]
        while (rm.hasMore) rm.key() match {
          case (1, 2) => // resource
            val (s, e) = rm.delimited()
            val rr = new ProtoReader(raw, s, e)
            while (rr.hasMore) rr.key() match {
              case (1, 2) =>
                val (as, ae) = rr.delimited()
                readAttr(raw, as, ae).foreach(kv => resAttrs += kv)
              case (_, w) => rr.skip(w)
            }
          case (2, 2) =>
            val (s, e) = rm.delimited(); smSpans += ((s, e))
          case (_, w) => rm.skip(w)
        }
        smSpans.result().foreach { case (ss, se) =>
          val sm = new ProtoReader(raw, ss, se)
          while (sm.hasMore) sm.key() match {
            case (2, 2) =>
              val (ms, me) = sm.delimited()
              val m = new ProtoReader(raw, ms, me)
              var name = ""
              val spans = Seq.newBuilder[(Int, Int, Int)]
              while (m.hasMore) m.key() match {
                case (1, 2) => name = m.string()
                case (fld, 2) if fld == 5 || fld == 7 ||
                    fld == 9 || fld == 10 || fld == 11 =>
                  val (s, e) = m.delimited(); spans += ((fld, s, e))
                case (_, w) => m.skip(w)
              }
              spans.result().foreach { case (fld, s, e) =>
                f(resAttrs, name, fld, s, e) }
            case (_, w) => sm.skip(w)
          }
        }
      case (_, w) => req.skip(w)
    }
  }

  /** Prometheus's OTLP identifying-attribute mapping: `service.name`
    * (prefixed by `service.namespace` when present) → `job`;
    * `service.instance.id` → `instance`. */
  private[tsdb] def jobInstance(res: Map[String, String])
      : Map[String, String] =
    (res.get("service.name").map(n =>
      "job" -> res.get("service.namespace").fold(n)(ns => s"$ns/$n")) ++
      res.get("service.instance.id").map("instance" -> _)).toMap

  /** One `target_info` row per RESOURCE carrying identifying service
    * attributes — value 1 at the resource's latest point timestamp,
    * labels = the non-identifying resource attributes plus the
    * promoted job/instance. Prometheus's OTLP endpoint writes exactly
    * this series (the `info()` tier's data source); resources without
    * extra attributes are skipped (an attr-less target_info carries
    * no information). Label names keep their dotted OTel form — this
    * engine stores UTF-8 label names (Prometheus 3). */
  def decodeTargetInfo(raw: Array[Byte])
      : Seq[(Long, Double, Map[String, String])] = {
    val latest =
      scala.collection.mutable.LinkedHashMap.empty[Map[String, String], Long]
    foreachMetricWithResource(raw) { (res, _, _, s, e) =>
      if (res.contains("service.name")) {
        val g = new ProtoReader(raw, s, e)
        while (g.hasMore) g.key() match {
          case (1, 2) => // data_points: time_unix_nano = 3 on every kind
            val (ds, de) = g.delimited()
            val dp = new ProtoReader(raw, ds, de)
            while (dp.hasMore) dp.key() match {
              case (3, 1) =>
                val t = divNsToMs(dp.fixed64())
                if (t > latest.getOrElse(res, Long.MinValue)) latest(res) = t
              case (_, w) => dp.skip(w)
            }
          case (_, w) => g.skip(w)
        }
      }
    }
    val ident =
      Set("service.name", "service.namespace", "service.instance.id")
    latest.toSeq.flatMap { case (res, t) =>
      val extra = res.filterNot(kv => ident(kv._1))
      if (extra.isEmpty) None
      else Some((t, 1.0,
        extra ++ jobInstance(res) + ("__name__" -> "target_info")))
    }
  }

  /** Wrap an encoded request's ResourceMetrics with RESOURCE
    * attributes (the collector always sends them; [[wrapMetric]]'s
    * single-metric requests carry none) — the spec-side harness for
    * the resource tier. */
  private[tsdb] def addResource(request: Array[Byte],
                                attrs: Map[String, String]): Array[Byte] = {
    val r = new ProtoReader(request, 0, request.length)
    val out = new ProtoWriter
    while (r.hasMore) r.key() match {
      case (1, 2) =>
        val (s, e) = r.delimited()
        val res = new ProtoWriter
        attrBytes(attrs).foreach(a => res.bytes(1, a))
        val header = new ProtoWriter
        header.bytes(1, res.toBytes)
        out.bytes(1, header.toBytes ++
          java.util.Arrays.copyOfRange(request, s, e))
      case (_, w) => r.skip(w)
    }
    out.toBytes
  }

  private def readAttr(raw: Array[Byte], from: Int,
                       until: Int): Option[(String, String)] = {
    val kv = new ProtoReader(raw, from, until)
    var k = ""; var v: Option[String] = None
    while (kv.hasMore) kv.key() match {
      case (1, 2) => k = kv.string()
      case (2, 2) =>
        val (as, ae) = kv.delimited()
        val any = new ProtoReader(raw, as, ae)
        while (any.hasMore) any.key() match {
          case (1, 2) => v = Some(any.string())
          case (_, w) => any.skip(w)
        }
      case (_, w) => kv.skip(w)
    }
    v.map(k -> _)
  }

  // ---- encode ---------------------------------------------------------

  /** Long-form samples → one single-gauge request per row, map-side —
    * the binary twin of [[SampleReaders.toOtlpJsonLines]] (and the
    * round-trip harness that puts the decoder under the oracle). */
  def encodeRequests(samples: DataFrame): Dataset[Array[Byte]] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .select(col("time").cast("long"), col("value").cast("double"),
        col("labels"))
      .as[(Long, Double, Map[String, String])]
      .mapPartitions(_.map { case (t, v, labels) =>
        encodeGauge(t, v, labels)
      })(Encoders.BINARY)
  }

  /** The dense-histogram twin: `(time, labels, hist)` frames in the
    * [[NativeHistogram.buildExp]] layout → one single-exp-hist request
    * per row, the grid mapped exactly as
    * [[SampleReaders.toOtlpExpHistJsonLines]] (offset = minExp − 1,
    * +Inf overflow riding as the last bucket). */
  def encodeHistRequests(df: DataFrame, schemaId: Int, minExp: Int,
                         maxExp: Int): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("time").cast("long"), col("labels"),
        col("hist.count").cast("double"), col("hist.sum").cast("double"),
        col("hist.counts").cast("array<double>"))
      .as[(Long, Map[String, String], Double, Double, Seq[Double])]
      .mapPartitions(_.map { case (t, labels, count, sum, counts) =>
        encodeExpHist(t, labels, count, sum, counts, schemaId, minExp, maxExp)
      })(Encoders.BINARY)
  }

  private[tsdb] def encodeGauge(t: Long, v: Double,
                                labels: Map[String, String]): Array[Byte] =
    encodeGaugeWithExemplars(t, v, labels, Nil)

  /** A no-recorded-value gauge point (`DataPointFlags` bit 0 set, no
    * value fields — the legal staleness shape) — the spec harness for
    * the FLAG_NO_RECORDED_VALUE decode path. */
  private[tsdb] def encodeStaleGauge(t: Long,
      labels: Map[String, String]): Array[Byte] = {
    val dp = new ProtoWriter
    dp.fixed64(3, t * 1000000L)
    attrBytes(labels).foreach(a => dp.bytes(7, a))
    dp.int64(8, 1L) // FLAG_NO_RECORDED_VALUE
    val gauge = new ProtoWriter
    gauge.bytes(1, dp.toBytes)
    wrapMetric(labels.getOrElse("__name__", ""), 5, gauge.toBytes)
  }

  /** Gauge point + attached exemplars — `(time ms, value, trace_id
    * bytes, span_id bytes, filtered attributes)` each. The spec-side
    * harness for [[decodeExemplarRows]]. */
  private[tsdb] def encodeGaugeWithExemplars(t: Long, v: Double,
      labels: Map[String, String],
      exemplars: Seq[(Long, Double, Array[Byte], Array[Byte],
        Map[String, String])]): Array[Byte] = {
    val dp = new ProtoWriter
    dp.fixed64(3, t * 1000000L)
    dp.fixed64(4, java.lang.Double.doubleToLongBits(v))
    exemplars.foreach { case (et, ev, traceId, spanId, attrs) =>
      val ew = new ProtoWriter
      ew.fixed64(2, et * 1000000L)
      ew.fixed64(3, java.lang.Double.doubleToLongBits(ev))
      if (spanId.nonEmpty) ew.bytes(4, spanId)
      if (traceId.nonEmpty) ew.bytes(5, traceId)
      attrBytes(attrs).foreach(a => ew.bytes(7, a))
      dp.bytes(5, ew.toBytes)
    }
    attrBytes(labels).foreach(a => dp.bytes(7, a))
    val gauge = new ProtoWriter
    gauge.bytes(1, dp.toBytes)
    wrapMetric(labels.getOrElse("__name__", ""), 5, gauge.toBytes)
  }

  /** One single-point SUM request — the counter/up-down-counter shape
    * (`Sum{data_points = 1, aggregation_temporality = 2,
    * is_monotonic = 3}`); the receiver-side translation-strategy spec
    * harness. */
  private[tsdb] def encodeSum(t: Long, v: Double,
                              labels: Map[String, String],
                              monotonic: Boolean,
                              delta: Boolean = false,
                              startTimeMs: Long = 0L): Array[Byte] = {
    val dp = new ProtoWriter
    if (startTimeMs != 0L) dp.fixed64(2, startTimeMs * 1000000L)
    dp.fixed64(3, t * 1000000L)
    dp.fixed64(4, java.lang.Double.doubleToLongBits(v))
    attrBytes(labels).foreach(a => dp.bytes(7, a))
    val sum = new ProtoWriter
    sum.bytes(1, dp.toBytes)
    sum.int64(2, if (delta) 1L else 2L)
    if (monotonic) sum.int64(3, 1L)
    wrapMetric(labels.getOrElse("__name__", ""), 7, sum.toBytes)
  }

  private[tsdb] def encodeExpHist(t: Long, labels: Map[String, String],
                                  count: Double, sum: Double,
                                  counts: Seq[Double], schemaId: Int,
                                  minExp: Int, maxExp: Int,
                                  delta: Boolean = false,
                                  stale: Boolean = false,
                                  startTimeMs: Long = 0L): Array[Byte] = {
    val dp = new ProtoWriter
    attrBytes(labels).foreach(a => dp.bytes(1, a))
    if (stale) dp.int64(10, 1L) // FLAG_NO_RECORDED_VALUE
    if (startTimeMs != 0L) dp.fixed64(2, startTimeMs * 1000000L)
    dp.fixed64(3, t * 1000000L)
    dp.fixed64(4, count.toLong)
    dp.fixed64(5, java.lang.Double.doubleToLongBits(sum))
    dp.key(6, 0); dp.varint(zigzag(schemaId.toLong))
    dp.fixed64(7, counts.head.toLong) // zero bucket
    val pos = new ProtoWriter
    pos.key(1, 0); pos.varint(zigzag((minExp - 1).toLong))
    val packed = new ProtoWriter
    // grid buckets + the +Inf overflow as the trailing entry
    counts.slice(1, maxExp - minExp + 3).foreach(c => packed.varint(c.toLong))
    pos.bytes(2, packed.toBytes)
    dp.bytes(8, pos.toBytes)
    val hist = new ProtoWriter
    hist.bytes(1, dp.toBytes)
    // aggregation_temporality (field 2) — what a real exporter always
    // stamps; cumulative = 2, delta = 1 (the receiver rejects 1)
    hist.int64(2, if (delta) 1L else 2L)
    wrapMetric(labels.getOrElse("__name__", ""), 10, hist.toBytes)
  }

  /** The explicit-bounds encoder twin: `(time, labels with `__name__`,
    * count, sum, bounds, bucketCounts per-interval)` rows to one
    * single-point histogram request each, map-side. */
  def encodeClassicHistRequests(df: DataFrame): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("time").cast("long"), col("labels"),
        col("count").cast("double"), col("sum").cast("double"),
        col("bounds").cast("array<double>"),
        col("bucketCounts").cast("array<double>"))
      .as[(Long, Map[String, String], Double, Double, Seq[Double], Seq[Double])]
      .mapPartitions(_.map { case (t, labels, count, sum, bounds, bc) =>
        encodeClassicHist(t, labels, count, sum, bounds, bc)
      })(Encoders.BINARY)
  }

  private[tsdb] def encodeClassicHist(t: Long, labels: Map[String, String],
      count: Double, sum: Double, bounds: Seq[Double], bc: Seq[Double],
      delta: Boolean = false, stale: Boolean = false): Array[Byte] = {
    val dp = new ProtoWriter
    attrBytes(labels).foreach(a => dp.bytes(9, a))
    if (stale) dp.int64(10, 1L) // FLAG_NO_RECORDED_VALUE
    dp.fixed64(3, t * 1000000L)
    dp.fixed64(4, count.toLong)
    dp.fixed64(5, java.lang.Double.doubleToLongBits(sum))
    val packedC = new java.io.ByteArrayOutputStream()
    bc.foreach { c =>
      var x = c.toLong; var i = 0
      while (i < 8) { packedC.write((x & 0xff).toInt); x >>>= 8; i += 1 }
    }
    dp.bytes(6, packedC.toByteArray)
    val packedB = new java.io.ByteArrayOutputStream()
    bounds.foreach { b =>
      var x = java.lang.Double.doubleToLongBits(b); var i = 0
      while (i < 8) { packedB.write((x & 0xff).toInt); x >>>= 8; i += 1 }
    }
    dp.bytes(7, packedB.toByteArray)
    val hist = new ProtoWriter
    hist.bytes(1, dp.toBytes)
    // aggregation_temporality (field 2): cumulative = 2, delta = 1
    hist.int64(2, if (delta) 1L else 2L)
    wrapMetric(labels.getOrElse("__name__", ""), 9, hist.toBytes)
  }

  /** The summary encoder twin: `(time, labels with `__name__`, count,
    * sum, quantiles array<struct<q,v>>)` rows to one single-point
    * summary request each (Metric oneof field 11), map-side. */
  def encodeSummaryRequests(df: DataFrame): Dataset[Array[Byte]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("time").cast("long"), col("labels"),
        col("count").cast("double"), col("sum").cast("double"),
        col("quantiles").cast("array<struct<q:double,v:double>>"))
      .as[(Long, Map[String, String], Double, Double, Seq[(Double, Double)])]
      .mapPartitions(_.map { case (t, labels, count, sum, quantiles) =>
        encodeSummary(t, labels, count, sum, quantiles)
      })(Encoders.BINARY)
  }

  private[tsdb] def encodeSummary(t: Long, labels: Map[String, String],
      count: Double, sum: Double, quantiles: Seq[(Double, Double)],
      stale: Boolean = false): Array[Byte] = {
    val dp = new ProtoWriter
    dp.fixed64(3, t * 1000000L)
    dp.fixed64(4, count.toLong)
    dp.fixed64(5, java.lang.Double.doubleToLongBits(sum))
    quantiles.foreach { case (q, v) =>
      val vq = new ProtoWriter
      vq.fixed64(1, java.lang.Double.doubleToLongBits(q))
      vq.fixed64(2, java.lang.Double.doubleToLongBits(v))
      dp.bytes(6, vq.toBytes)
    }
    attrBytes(labels).foreach(a => dp.bytes(7, a))
    if (stale) dp.int64(8, 1L) // FLAG_NO_RECORDED_VALUE
    val summary = new ProtoWriter
    summary.bytes(1, dp.toBytes)
    wrapMetric(labels.getOrElse("__name__", ""), 11, summary.toBytes)
  }

  private def wrapMetric(name: String, dataField: Int,
                         dataBytes: Array[Byte]): Array[Byte] = {
    val m = new ProtoWriter
    m.string(1, name)
    m.bytes(dataField, dataBytes)
    val sm = new ProtoWriter
    sm.bytes(2, m.toBytes)
    val rm = new ProtoWriter
    rm.bytes(2, sm.toBytes)
    val req = new ProtoWriter
    req.bytes(1, rm.toBytes)
    req.toBytes
  }

  private def attrBytes(labels: Map[String, String]): Seq[Array[Byte]] =
    labels.toSeq.filter(_._1 != "__name__").sortBy(_._1).map { case (k, v) =>
      val any = new ProtoWriter
      any.string(1, v)
      val kv = new ProtoWriter
      kv.string(1, k); kv.bytes(2, any.toBytes)
      kv.toBytes
    }

  private def divNsToMs(ns: Long): Long = ns / 1000000L

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)
}
