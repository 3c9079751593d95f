package graft.tsdb

import graft.SparkSpec
import graft.tsdb.RemoteWrite.SparseHist
import graft.tsdb.RemoteWrite2.Rw2Series
import org.apache.spark.sql.functions._

/** The remote-write 2.0 codec: symbol-table rules, full-content round
  * trips (samples, exemplars, histograms, metadata), the interning
  * size win over 1.0, and the Spark encode⇄decode identity. */
class RemoteWrite2Spec extends SparkSpec {

  private val series = Rw2Series(
    labels = Seq("__name__" -> "http_requests", "job" -> "api",
      "instance" -> "1"),
    samples = Seq((1000L, 1.5), (2000L, 2.5)),
    exemplars = Seq((Seq("trace_id" -> "abc"), 9.9, 1500L)),
    histograms = Seq(SparseHist(3000L, Map.empty, 4.0, 10.0, 0, 0.0, 1.0,
      Seq((0, 2.0), (2, 1.0)), Nil)),
    metricType = 1, unit = "requests", help = "total requests",
    createdTimestamp = 500L)

  test("round trip preserves every content kind") {
    val back = RemoteWrite2.decodeRequest(
      RemoteWrite2.encodeRequest(Seq(series)))
    assert(back.size === 1)
    val s = back.head
    assert(s.labels.toMap === series.labels.toMap)
    assert(s.samples === series.samples)
    assert(s.exemplars === Seq((Seq("trace_id" -> "abc"), 9.9, 1500L)))
    assert(s.histograms.size === 1)
    val h = s.histograms.head
    assert(h.time === 3000L && h.count === 4.0 && h.sum === 10.0 &&
      h.zeroCount === 1.0 && h.positive === Seq((0, 2.0), (2, 1.0)))
    assert(h.labels === s.labels.toMap,
      "decoded histograms carry their series labels")
    assert((s.metricType, s.unit, s.help) === ((1, "requests", "total requests")))
    assert(s.createdTimestamp === 500L) // field 6, the v2 created time
  }

  test("symbol table: empty string first, deduped, shared across series") {
    import org.xerial.snappy.Snappy
    val two = Seq(series, series.copy(
      labels = Seq("__name__" -> "http_requests", "job" -> "api",
        "instance" -> "2")))
    val raw = Snappy.uncompress(RemoteWrite2.encodeRequest(two))
    // hand-walk the Request: collect field-4 strings in order
    var pos = 0
    def varint(): Long = {
      var x = 0L; var s = 0
      while ({ val b = raw(pos); pos += 1; x |= (b & 0x7fL) << s
               s += 7; (b & 0x80) != 0 }) ()
      x
    }
    val syms = Seq.newBuilder[String]
    var nSeries = 0
    while (pos < raw.length) {
      val k = varint(); val field = (k >>> 3).toInt
      val len = varint().toInt
      if (field == 4)
        syms += new String(raw, pos, len, "UTF-8")
      else if (field == 5) nSeries += 1
      pos += len
    }
    val table = syms.result()
    assert(table.head === "", "spec rule: symbols[0] is the empty string")
    assert(table.distinct === table, "symbols are interned exactly once")
    assert(nSeries === 2)
    // every shared string appears once despite two series using it
    assert(table.count(_ == "http_requests") === 1)
  }

  test("interning beats 1.0 framing on label-heavy payloads") {
    val s = spark
    import s.implicits._
    val long = (0L until 2000L).toDF("time")
      .select(col("time"), col("time").cast("double").as("value"),
        map(lit("__name__"), lit("metric_with_a_rather_long_name"),
          lit("service_namespace"), lit("checkout-production-cluster"),
          lit("instance"), (col("time") % 50).cast("string")).as("labels"))
    // the interning win is a WIRE-layout property: compare uncompressed
    // proto bytes (snappy itself dedupes repeated strings, so the
    // compressed sizes converge — which is fine; v2's point is cheaper
    // encode/decode and bounded string duplication before compression)
    import org.xerial.snappy.Snappy
    val v1 = RemoteWrite.encode(long).collect()
      .map(p => Snappy.uncompress(p).length.toLong).sum
    val v2 = RemoteWrite2.encode(long).collect()
      .map(p => Snappy.uncompress(p).length.toLong).sum
    assert(v2 < v1,
      s"v2 ($v2 B) must be smaller than v1 ($v1 B) on repeated labels")
  }

  test("Spark encode ⇄ decode identity on a multi-series frame") {
    val s = spark
    import s.implicits._
    val long = (0L until 500L).toDF("time")
      .select(col("time"), (col("time") * 0.5).as("value"),
        map(lit("__name__"), lit("m"),
          lit("i"), (col("time") % 7).cast("string")).as("labels"))
    val back = RemoteWrite2.decode(RemoteWrite2.encode(long))
    assert(back.count() === 500)
    val got = back.select(col("time"), col("value"),
        element_at(col("labels"), "i").as("i"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === (0L until 500L).map(t =>
      (t, t * 0.5, (t % 7).toString)).toSet)
  }
}
