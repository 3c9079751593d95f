package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staleness-marker semantics (Prometheus's explicit staleness): the
  * marker NaN is represented as a NULL value in the long/wide data
  * model (mapped at source decode — [[TsdbSchema.isStaleMarker]]),
  * instant lookback ends a series at it, range selections skip it. */
class StalenessSpec extends SparkSpec {
  import spark.implicits._

  test("isStaleMarker: exact bit pattern only; ordinary NaN stays live") {
    val stale = java.lang.Double.longBitsToDouble(TsdbSchema.StaleNaNBits)
    assert(TsdbSchema.isStaleMarker(stale))
    assert(!TsdbSchema.isStaleMarker(Double.NaN))
    assert(!TsdbSchema.isStaleMarker(java.lang.Double.longBitsToDouble(
      0x7ff0000000000001L)))
    assert(!TsdbSchema.isStaleMarker(1.0))
  }

  // marker-bearing wide table: a ends at a marker, b starts after one,
  // c has a real sample and a marker at the SAME timestamp
  private val wide: DataFrame = Seq(
    (1000L, Option(5.0), "m", "a"), (2000L, Option.empty[Double], "m", "a"),
    (1000L, Option.empty[Double], "m", "b"), (2000L, Option(7.0), "m", "b"),
    (2000L, Option.empty[Double], "m", "c"), (2000L, Option(3.0), "m", "c")
  ).toDF("time", "value", "labels.name", "labels.user")

  test("instant lookback: a winning marker drops the series") {
    val iv = RangeVectors.instant(wide, at = 3000L, lookbackMs = 5000L)
    val got = iv.select(col("`labels.user`"), col("value"))
      .as[(String, Double)].collect().toMap
    // a: latest sample is the marker → absent; b: live again;
    // c: real sample beats the marker at the equal timestamp
    assert(got === Map("b" -> 7.0, "c" -> 3.0))
  }

  test("sliding instant: the series is ended exactly from the marker on") {
    val iv = RangeVectors.slidingInstant(wide, lookbackMs = 5000L,
      stepMs = 1000L, startMs = 1000L, endMs = 4000L)
    val a = iv.where(col("`labels.user`") === "a")
      .select(col("t"), col("value")).as[(Long, Double)].collect().toMap
    // live at t=1000 (sample 5.0), gone from t=2000 (marker latest)
    assert(a === Map(1000L -> 5.0))
    val b = iv.where(col("`labels.user`") === "b")
      .select(col("t"), col("value")).as[(Long, Double)].collect().toMap
    assert(b === Map(2000L -> 7.0, 3000L -> 7.0, 4000L -> 7.0))
  }

  test("range selections skip markers (PromQL live-sample filter)") {
    def q(s: String): Map[String, Double] =
      PromQL.eval(PromQL.parse(s), wide, at = 4000L, lookbackMs = 5000L,
        start = -1L, end = 5000L)
        .select(col("`labels.user`"), col("value"))
        .as[(String, Double)].collect().toMap
    // count_over_time counts only live samples per series
    assert(q("""count_over_time({name="m"}[10s])""") ===
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    // sum ignores the markers, not poisoned by them
    assert(q("""sum_over_time({name="m"}[10s])""") ===
      Map("a" -> 5.0, "b" -> 7.0, "c" -> 3.0))
  }

  test("WAL round-trip: the marker bit pattern decodes to NULL") {
    val dir = java.nio.file.Files.createTempDirectory("wal_stale")
    java.nio.file.Files.write(dir.resolve("00000000"), synthSegment())
    val df = spark.read.format("tsdb-wal").load(dir.toString)
    assert(df.schema("value").nullable)
    val got = df.select(col("time"), col("value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1000L -> Some(5.0), 2000L -> None))
    // labels survived alongside
    assert(df.where(col("value").isNull)
      .select(element_at(col("labels"), "__name__")).as[String].head() === "m")
  }

  // ---- minimal Prometheus WAL segment encoder (full, uncompressed
  // records; one page): Series record + Samples record with one live
  // and one stale sample ----
  private def synthSegment(): Array[Byte] = {
    val series = {
      val b = new java.io.ByteArrayOutputStream
      b.write(1) // record kind: Series
      be64(b, 1L) // ref
      uvarint(b, 2) // two labels
      for ((k, v) <- Seq("__name__" -> "m", "job" -> "x")) {
        uvarint(b, k.length); b.write(k.getBytes("UTF-8"))
        uvarint(b, v.length); b.write(v.getBytes("UTF-8"))
      }
      b.toByteArray
    }
    val samples = {
      val b = new java.io.ByteArrayOutputStream
      b.write(2) // record kind: Samples
      be64(b, 1L) // base ref
      be64(b, 1000L) // base time
      varint(b, 0); varint(b, 0) // (dref, dtime) of the live sample
      be64(b, java.lang.Double.doubleToRawLongBits(5.0))
      varint(b, 0); varint(b, 1000) // the stale marker at t=2000
      be64(b, TsdbSchema.StaleNaNBits)
      b.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream
    for (data <- Seq(series, samples)) {
      out.write(1) // full fragment, uncompressed
      out.write((data.length >> 8) & 0xff); out.write(data.length & 0xff)
      val crc = new java.util.zip.CRC32C
      crc.update(data)
      val c = crc.getValue
      out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
      out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
      out.write(data)
    }
    out.toByteArray
  }

  private def be64(b: java.io.ByteArrayOutputStream, v: Long): Unit =
    (7 to 0 by -1).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))

  private def uvarint(b: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { b.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    b.write(v.toInt)
  }

  private def varint(b: java.io.ByteArrayOutputStream, v: Long): Unit =
    uvarint(b, (v << 1) ^ (v >> 63))
}
