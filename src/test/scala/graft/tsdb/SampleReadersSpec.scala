package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SampleReadersSpec extends SparkSpec {
  import spark.implicits._

  test("OpenMetrics parser handles comments, blanks, and label-less lines") {
    val text = Seq(
      "# HELP up Whether the target is up.",
      "# TYPE up gauge",
      "",
      """up{instance="localhost:9090",job="prometheus"} 1 1679382479083""",
      """scrape_duration_seconds{instance="localhost:9090",job="prometheus"} 0.0042 1679382479083""",
      "go_goroutines 33 1679382479083")
    val got = SampleReaders.fromOpenMetricsLines(text.toDF("line"))
      .orderBy(col("value"))
      .collect()
    assert(got.length == 3)
    val up = got.find(_.getDouble(1) == 1.0).get
    assert(up.getLong(0) == 1679382479083L)
    val labels = up.getMap[String, String](2)
    assert(labels("__name__") == "up")
    assert(labels("instance") == "localhost:9090")
    assert(labels("job") == "prometheus")
    // label-less line: only __name__
    val go = got.find(_.getDouble(1) == 33.0).get
    assert(go.getMap[String, String](2).toMap == Map("__name__" -> "go_goroutines"))
  }

  test("formatter ⇄ parser round-trips samples exactly") {
    val in = Seq(
      (1000L, 1.5, Map("__name__" -> "m", "a" -> "x")),
      (2000L, -0.25, Map("__name__" -> "m2", "b" -> "y", "a" -> "z")),
      (3000L, 1.0e7, Map("__name__" -> "m3")))
      .toDF("time", "value", "labels")
    val back = SampleReaders.fromOpenMetricsLines(
        SampleReaders.toOpenMetricsLines(in))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(back == in.as[(Long, Double, Map[String, String])].collect().toSet)
  }

  test("UTF-8 names use Prometheus 3's quoted exposition form") {
    // non-legacy metric names move inside the braces as a leading
    // quoted string; non-legacy label names quote in place — and both
    // round-trip through the parser (a classic renderer would emit
    // unparseable `my.metric{...}` text)
    val in = Seq(
      (1000L, 2.5, Map("__name__" -> "http.requests.总数",
        "user" -> "a", "data.center" -> "dc1")),
      (2000L, 1.0, Map("__name__" -> "service.latency")),
      (3000L, 4.0, Map("__name__" -> "legacy_ok", "a.b" -> "v")))
      .toDF("time", "value", "labels")
    val lines = SampleReaders.toOpenMetricsLines(in)
      .as[String].collect().sorted
    assert(lines(0) == """legacy_ok{"a.b"="v"} 4.0 3000""",
      lines.mkString("\n"))
    assert(lines(1) ==
      """{"http.requests.总数","data.center"="dc1",user="a"} 2.5 1000""",
      lines.mkString("\n"))
    assert(lines(2) == """{"service.latency"} 1.0 2000""",
      lines.mkString("\n"))
    val back = SampleReaders.fromOpenMetricsLines(
        SampleReaders.toOpenMetricsLines(in))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(back == in.as[(Long, Double, Map[String, String])]
      .collect().toSet)
  }

  test("CSV long-form reader parses k=v;k=v label encoding") {
    val dir = tmpDir("graft_csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/s.csv"),
      "time,value,labels\n100,2.5,__name__=up;job=prom\n200,3.5,__name__=up\n")
    val got = SampleReaders.fromCsv(spark, dir)
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(got == Set(
      (100L, 2.5, Map("__name__" -> "up", "job" -> "prom")),
      (200L, 3.5, Map("__name__" -> "up"))))
  }

  test("JSON-lines reader round-trips and drops malformed lines") {
    val good = Seq(
      (100L, 2.5, Map("__name__" -> "up", "job" -> "prom")),
      (200L, -1.25e-3, Map("__name__" -> "up")))
    val lines = SampleReaders.toJsonLines(
      good.toDF("time", "value", "labels"))
      .union(Seq("not json at all", """{"no_time_field": true}""", "")
        .toDF("line"))
    val got = SampleReaders.fromJsonLines(lines)
      .as[(Long, Double, Map[String, String])].collect().toSet
    // malformed/field-less lines are dropped, never a job failure;
    // doubles (incl. scientific notation) round-trip exactly
    assert(got == good.toSet)
  }

  test("OTLP/JSON reader parses collector-shaped gauge/sum requests") {
    // a multi-metric, multi-data-point request as an OTel collector
    // emits it: gauge + monotonic sum, int64-as-string values, nanos
    // beyond 2^53 (precision must survive — no double division)
    val line =
      """{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":[{
        |"scope":{"name":"meter"},"metrics":[
        |{"name":"temp","gauge":{"dataPoints":[
        |  {"timeUnixNano":"1704067200123000000","asDouble":21.5,
        |   "attributes":[{"key":"room","value":{"stringValue":"a"}}]},
        |  {"timeUnixNano":"1704067260123000000","asDouble":22.5,
        |   "attributes":[{"key":"room","value":{"stringValue":"b"}}]}]}},
        |{"name":"requests","sum":{"isMonotonic":true,"aggregationTemporality":2,
        |  "dataPoints":[{"timeUnixNano":"1704067200123000000","asInt":"41"}]}}
        |]}]}]}""".stripMargin.replace("\n", "")
    val got = SampleReaders.fromOtlpJsonLines(
        (line +: Seq("not json", """{"resourceMetrics":[]}""")).toDF("line"))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(got == Set(
      (1704067200123L, 21.5, Map("__name__" -> "temp", "room" -> "a")),
      (1704067260123L, 22.5, Map("__name__" -> "temp", "room" -> "b")),
      (1704067200123L, 41.0, Map("__name__" -> "requests"))))
  }

  test("OTLP exporter ⇄ parser round-trips samples exactly") {
    val good = Seq(
      (1704067200123L, 2.5, Map("__name__" -> "up", "job" -> "prom")),
      (200L, -1.25e-3, Map("__name__" -> "up")))
    val got = SampleReaders.fromOtlpJsonLines(
        SampleReaders.toOtlpJsonLines(good.toDF("time", "value", "labels")))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(got == good.toSet)
  }

  test("OpenMetrics metadata lines pivot to the per-metric view") {
    val lines = Seq(
      "# TYPE http_requests counter",
      "# UNIT http_requests requests",
      "# HELP http_requests Total HTTP requests served",
      "# TYPE queue_depth gauge", // no UNIT/HELP: empty fields
      "http_requests{job=\"a\"} 1 1000", // sample lines are not metadata
      "# EOF")
    val got = SampleReaders.fromOpenMetricsMeta(lines.toDF("line"))
      .as[(String, String, String, String)].collect().toSet
    assert(got === Set(
      ("http_requests", "counter", "requests", "Total HTTP requests served"),
      ("queue_depth", "gauge", "", "")))
    // exporter ⇄ parser identity
    val meta = Seq(("m", "gauge", "seconds", "a help string"))
      .toDF("metric", "type", "unit", "help")
    assert(SampleReaders.fromOpenMetricsMeta(
        SampleReaders.toOpenMetricsMetaLines(meta))
      .as[(String, String, String, String)].collect().toSeq ===
      Seq(("m", "gauge", "seconds", "a help string")))
  }

  test("OpenMetrics exemplar tails parse; the sample parser skips them") {
    val lines = Seq(
      """req_total{job="a"} 17 1000 # {trace_id="abc"} 0.5 900""",
      """req_total{job="b"} 3 2000""", // no exemplar
      "# TYPE req_total counter")
    // exemplar view: annotated lines only
    val ex = SampleReaders.fromOpenMetricsExemplars(lines.toDF("line"))
      .collect()
    assert(ex.length === 1)
    val r = ex.head
    assert(r.getAs[Long]("time") === 1000L &&
      r.getAs[Double]("value") === 17.0)
    assert(r.getAs[Map[String, String]]("exemplar") ===
      Map("trace_id" -> "abc"))
    assert(r.getAs[Double]("ex_value") === 0.5 &&
      r.getAs[Long]("ex_time") === 900L)
    // sample view: BOTH lines parse, exemplar tail invisible
    val samples = SampleReaders.fromOpenMetricsLines(lines.toDF("line"))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(samples === Set(
      (1000L, 17.0, Map("__name__" -> "req_total", "job" -> "a")),
      (2000L, 3.0, Map("__name__" -> "req_total", "job" -> "b"))))
  }

  test("OTLP exponential-histogram points parse with the index shift") {
    // a collector-shaped exp-hist data point: scale 0, zero bucket,
    // positive run at offset -1 → Prometheus indices 0,1,2 (j = off+i+1),
    // uint64 fields as strings; zero-count buckets drop from the sparse
    // form, a negative run keeps its own accumulator
    val line =
      """{"resourceMetrics":[{"scopeMetrics":[{"metrics":[
        |{"name":"lat","exponentialHistogram":{"aggregationTemporality":2,
        |  "dataPoints":[{"timeUnixNano":"1704067200123000000",
        |   "count":"11","sum":12.5,"scale":0,"zeroCount":"2",
        |   "positive":{"offset":-1,"bucketCounts":["3","0","4"]},
        |   "negative":{"offset":0,"bucketCounts":["2"]},
        |   "attributes":[{"key":"job","value":{"stringValue":"a"}}]}]}}
        |]}]}]}""".stripMargin.replace("\n", "")
    val got = SampleReaders.fromOtlpExpHistJsonLines(
      Seq(line, "junk").toDF("line")).collect()
    assert(got.length === 1)
    val h = got.head
    assert(h.time === 1704067200123L)
    assert(h.labels === Map("__name__" -> "lat", "job" -> "a"))
    assert(h.count === 11.0 && h.sum === 12.5 && h.schema === 0)
    assert(h.zeroCount === 2.0)
    assert(h.positive === Seq((0, 3.0), (2, 4.0))) // zero bucket dropped
    assert(h.negative === Seq((1, 2.0)))
  }

  test("OTLP explicit-bounds histogram maps to classic _bucket/_count/_sum") {
    // per-interval bucketCounts [2,3,5] over bounds [1,4] → cumulative
    // _bucket{le="1.0"}=2, {le="4.0"}=5, {le="+Inf"}=10=count
    val line =
      """{"resourceMetrics":[{"scopeMetrics":[{"metrics":[
        |{"name":"size","histogram":{"aggregationTemporality":2,
        |  "dataPoints":[{"timeUnixNano":"1704067200123000000",
        |   "count":"10","sum":33.25,
        |   "bucketCounts":["2","3","5"],"explicitBounds":[1.0,4.0],
        |   "attributes":[{"key":"job","value":{"stringValue":"a"}}]}]}}
        |]}]}]}""".stripMargin.replace("\n", "")
    val got = SampleReaders.fromOtlpHistogramJsonLines(Seq(line).toDF("line"))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(got === Set(
      (1704067200123L, 2.0, Map("__name__" -> "size_bucket", "le" -> "1.0", "job" -> "a")),
      (1704067200123L, 5.0, Map("__name__" -> "size_bucket", "le" -> "4.0", "job" -> "a")),
      (1704067200123L, 10.0, Map("__name__" -> "size_bucket", "le" -> "+Inf", "job" -> "a")),
      (1704067200123L, 10.0, Map("__name__" -> "size_count", "job" -> "a")),
      (1704067200123L, 33.25, Map("__name__" -> "size_sum", "job" -> "a"))))
  }

  test("binary OTLP codec: gauge and exp-hist round-trip; merge rule holds") {
    // gauge round trip through the real protobuf framing
    val samples = Seq(
      (1704067200123L, 21.5, Map("__name__" -> "temp", "room" -> "a")),
      (1704067260123L, -3.25, Map("__name__" -> "temp")))
    val back = OtlpProto.decodeRequests(
      OtlpProto.encodeRequests(samples.toDF("time", "value", "labels")))
      .as[(Long, Double, Map[String, String])].collect().toSet
    assert(back === samples.toSet)

    // exp-hist: hand-build a data point with an UNPACKED bucket run and
    // a SPLIT packed run — both legal wire forms must decode identically
    // to the packed single-chunk form the encoder emits
    val hist = OtlpProto.encodeExpHist(2000L,
      Map("__name__" -> "lat", "job" -> "x"),
      count = 9.0, sum = 4.5,
      counts = Seq(2.0, 3.0, 4.0), schemaId = 0, minExp = 0, maxExp = 0)
    val hs = OtlpProto.decodeHists(hist)
    assert(hs.length === 1)
    val h = hs.head
    assert(h.time === 2000L && h.count === 9.0 && h.sum === 4.5)
    assert(h.labels === Map("__name__" -> "lat", "job" -> "x"))
    assert(h.zeroCount === 2.0)
    // grid: offset = minExp-1 = -1 → indices 0 (le 1) and 1 (+Inf ride)
    assert(h.positive === Seq((0, 3.0), (1, 4.0)))
  }

  test("binary OTLP decode: every truncation terminates — parse or throw") {
    // a receiver fed a cut-off body must fail FAST (400 upstream),
    // never hang or fabricate rows: walk every prefix of a valid
    // request through all three decoders
    val full = OtlpProto.encodeGauge(1000L, 1.5,
      Map("__name__" -> "m", "a" -> "b"))
    (0 until full.length).foreach { n =>
      val cut = full.take(n)
      scala.util.Try(OtlpProto.decodeSamples(cut)).foreach { rows =>
        // a prefix that still parses may only yield the true sample
        // or nothing — never a corrupted row
        assert(rows.forall(r => r == ((1000L, 1.5,
          Map("__name__" -> "m", "a" -> "b")))), s"prefix $n: $rows")
      }
      scala.util.Try(OtlpProto.decodeHists(cut))        // must terminate
      scala.util.Try(OtlpProto.decodeClassicHists(cut)) // must terminate
    }
  }
}
