package graft.sources

import graft.SparkSpec
import graft.sources.tsdbblock.{TsdbWalRecords, TsdbWalWriter, WalReader}
import org.apache.spark.sql.functions._

/** The non-sample WAL record kinds: tombstones (3), exemplars (4),
  * metadata (6) — codec round trips, replay masking, ref resolution,
  * and how checkpointing filters each kind across the horizon. */
class WalRecordKindsSpec extends SparkSpec {

  private def longForm(times: Seq[Long]) = {
    val s = spark
    import s.implicits._
    times.toDF("time")
      .withColumn("value", col("time").cast("double"))
      .withColumn("labels", map(
        lit("__name__"), lit("m"),
        lit("i"), (col("time") % 4).cast("string")))
  }

  test("exemplar records round-trip with labels; orphan refs drop") {
    val rec = TsdbWalWriter.exemplarRecord(Seq(
      (7L, 1000L, 1.5, Seq("trace_id" -> "abc")),
      (9L, 900L, -2.0, Seq("span" -> "s1", "trace_id" -> "def")),
      (7L, 1100L, Double.NaN, Nil)))
    val back = WalReader.exemplarsOfRecord(rec)
    assert(back.map(e => (e.ref, e.time)) ===
      Seq((7L, 1000L), (9L, 900L), (7L, 1100L)))
    assert(back(1).labels === Map("span" -> "s1", "trace_id" -> "def"))
    assert(java.lang.Double.isNaN(back(2).value))
    // other decoders ignore the kind
    assert(WalReader.samplesOfRecord(rec).isEmpty)
    assert(WalReader.stonesOfRecord(rec).isEmpty)
  }

  test("tombstone and metadata records round-trip") {
    val st = TsdbWalWriter.tombstonesRecord(Seq(
      (1L, -5L, 100L), (2L, Long.MinValue, Long.MaxValue)))
    assert(WalReader.stonesOfRecord(st).map(s => (s.ref, s.mint, s.maxt)) ===
      Seq((1L, -5L, 100L), (2L, Long.MinValue, Long.MaxValue)))
    val md = TsdbWalWriter.metadataRecord(Seq(
      (3L, 2, Seq("unit" -> "seconds", "help" -> "latency"))))
    val one = {
      // decode through a real segment file
      val dir = tmpDir("graft_rk_md_")
      TsdbWalWriter.writeSegment(s"$dir/00000000", Iterator(md))
      WalReader.metadata(s"$dir/00000000").toSeq
    }
    assert(one.map(x => (x.ref, x.metricType, x.fields)) ===
      Seq((3L, 2, Map("unit" -> "seconds", "help" -> "latency"))))
  }

  test("writeExemplars resolves refs; readExemplars re-joins labels") {
    val dir = tmpDir("graft_rk_ex_")
    TsdbWalWriter.write(longForm(0L until 100L), dir, partitions = 2)
    val ex = longForm(0L until 100L)
      .where(col("value") >= 90.0)
      .withColumn("exemplar", map(lit("trace_id"),
        concat(lit("t"), col("time").cast("string"))))
    // plus one exemplar whose series does NOT exist in the WAL: dropped
    val orphan = longForm(Seq(50L))
      .withColumn("labels", map(lit("__name__"), lit("other")))
      .withColumn("exemplar", map(lit("trace_id"), lit("orphan")))
    val n = TsdbWalWriter.writeExemplars(ex.unionByName(orphan), dir)
    assert(n === 10)
    val back = TsdbWalRecords.readExemplars(spark, dir)
      .select(col("time"), element_at(col("labels"), "i").as("i"),
        element_at(col("exemplar"), "trace_id").as("tid"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(back.length === 10)
    assert(back.toSet === (90L until 100L).map(t =>
      (t, (t % 4).toString, s"t$t")).toSet)
  }

  test("WAL stones mask replay; checkpoint drops expired stones") {
    val dir = tmpDir("graft_rk_st_")
    TsdbWalWriter.write(longForm(0L until 100L), dir, partitions = 1)
    val dict = WalReader.seriesDict(dir)
    // stone series i=1 over [0, 49] — masks its first half
    val refs1 = dict.collect { case (r, l) if l("i") == "1" => r }.toSeq
    TsdbWalWriter.writeStones(dir, refs1.map(r => (r, 0L, 49L)))
    val times = spark.read.format("tsdb-wal").load(dir)
      .where(element_at(col("labels"), "i") === "1")
      .select(col("time")).collect().map(_.getLong(0)).toSet
    assert(times === (0L until 100L).filter(t =>
      t % 4 == 1 && t > 49).toSet)

    // checkpoint with horizon 60: the [0,49] stone is wholly expired —
    // it must not survive the fold
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 60L)
    val survivingStones = WalReader.stoneDict(dir)
    assert(survivingStones.isEmpty, "expired stones must be dropped")
    // and a stone straddling the horizon survives (re-encoded intact)
    TsdbWalWriter.write(longForm(100L until 120L), dir, partitions = 1)
    val refs2 = dict.collect { case (r, l) if l("i") == "2" => r }.toSeq
    TsdbWalWriter.writeStones(dir, refs2.map(r => (r, 50L, 110L)))
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 70L)
    val after = WalReader.stoneDict(dir)
    assert(after.nonEmpty && after.keySet === refs2.toSet)
  }

  test("unknown record kinds (e.g. kind 5 mmap-markers) are skipped") {
    // a data dir written by a REAL Prometheus contains record kinds
    // this engine never writes — kind 5 (memory-mapped chunk markers)
    // on every head flush. Forward compatibility = replay ignores
    // them; a reader that errors on an unknown kind cannot open a
    // real Prometheus WAL. The readers skip by the kind byte; this
    // pins it against a synthetic kind-5 record in a live segment.
    val dir = tmpDir("graft_rk_unk_")
    TsdbWalWriter.write(longForm(0L until 50L), dir, partitions = 1)
    val baseline = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0)).sorted
    // kind-5 record: [kind byte | be64 series ref | be64 mmap offset]
    val mmapMarker = {
      val b = java.nio.ByteBuffer.allocate(17)
      b.put(5.toByte); b.putLong(1L); b.putLong(0x4000L)
      b.array()
    }
    // and a kind from the FUTURE (never assigned) in the same segment
    val futureKind = Array[Byte](42, 1, 2, 3)
    val segs = new java.io.File(dir).listFiles().map(_.getName).sorted
    val next = f"${segs.last.toInt + 1}%08d"
    TsdbWalWriter.writeSegment(s"$dir/$next",
      Iterator(mmapMarker, futureKind))
    // replay: identical samples, no error
    val after = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0)).sorted
    assert(after === baseline)
    // every typed accessor ignores the foreign kinds
    Seq(mmapMarker, futureKind).foreach { rec =>
      assert(WalReader.samplesOfRecord(rec).isEmpty)
      assert(WalReader.stonesOfRecord(rec).isEmpty)
      assert(WalReader.exemplarsOfRecord(rec).isEmpty)
      assert(WalReader.histogramsOfRecord(rec).isEmpty)
    }
    // and the checkpoint fold carries the WAL past them without error
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 0L)
    val post = spark.read.format("tsdb-wal").load(dir)
      .select(col("time")).collect().map(_.getLong(0)).sorted
    assert(post === baseline)
  }

  test("histogram records round-trip: integer deltas, float, NHCB") {
    import graft.sources.tsdbblock.WalReader.WalHistogram
    // integer (kind 7): sparse buckets with gaps force multi-span
    // encoding; deltas go negative between buckets
    val hInt = WalHistogram(5L, 1000L, counterResetHint = 1, schema = 2,
      zeroThreshold = 1e-128, zeroCount = 3, count = 10, sum = 55.5,
      positive = Seq((0, 4.0), (1, 2.0), (7, 1.0)),
      negative = Seq((-2, 3.0)), customValues = Nil, isFloat = false)
    val recInt = TsdbWalWriter.histogramRecord(Seq(hInt), float = false)
    assert(recInt(0) === 7)
    assert(WalReader.histogramsOfRecord(recInt) === Seq(hInt))
    // non-integral counts must refuse the integer form
    intercept[IllegalArgumentException] {
      TsdbWalWriter.histogramRecord(
        Seq(hInt.copy(positive = Seq((0, 1.5)))), float = false)
    }
    // float (kind 8): fractional counts are the point
    val hF = hInt.copy(zeroCount = 0.25, count = 2.75,
      positive = Seq((3, 1.25), (4, 1.5)), negative = Nil, isFloat = true)
    val recF = TsdbWalWriter.histogramRecord(Seq(hF), float = true)
    assert(recF(0) === 8)
    assert(WalReader.histogramsOfRecord(recF) === Seq(hF))
    // NHCB (schema −53) carries custom boundaries
    val hC = hInt.copy(schema = -53, customValues = Seq(0.1, 0.5, 2.5))
    assert(WalReader.histogramsOfRecord(
      TsdbWalWriter.histogramRecord(Seq(hC), float = false)) === Seq(hC))
    // two samples share the base-ref/time framing
    val pair = Seq(hInt, hInt.copy(ref = 9L, time = 2000L, sum = -1.0))
    assert(WalReader.histogramsOfRecord(
      TsdbWalWriter.histogramRecord(pair, float = false)) === pair)
  }

  test("writeHistograms → readHistograms resolves series; checkpoint filters") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_rk_hist_")
    // two series, two snapshot times, on the schema-0 grid [1,2,4,8]
    val dense = Seq(
      (1000L, Map("__name__" -> "lat", "job" -> "a"),
        (6.0, 12.5, Seq(1.0, 2.0, 3.0, 0.0, 0.0, 0.0))),
      (2000L, Map("__name__" -> "lat", "job" -> "a"),
        (8.0, 20.0, Seq(1.0, 2.0, 4.0, 1.0, 0.0, 0.0))),
      (2000L, Map("__name__" -> "lat", "job" -> "b"),
        (2.0, 3.0, Seq(0.0, 1.0, 1.0, 0.0, 0.0, 0.0))))
      .toDF("time", "labels", "h")
      .select(col("time"), col("labels"), struct(
        col("h._1").as("count"), col("h._2").as("sum"),
        array(lit(0.0), lit(1.0), lit(2.0), lit(4.0), lit(8.0),
          lit(Double.PositiveInfinity)).as("les"),
        col("h._3").as("counts")).as("hist"))
    val nSegs = TsdbWalWriter.writeHistograms(dense, dir,
      schemaId = 0, minExp = 0, maxExp = 3, float = false)
    assert(nSegs >= 1)
    val back = graft.sources.tsdbblock.TsdbWalRecords
      .readHistograms(spark, dir)
    assert(back.count() === 3)
    val one = back.collect()
      .find(h => h.time == 2000L && h.labels("job") == "a").get
    assert(one.count === 8.0 && one.sum === 20.0 && one.zeroCount === 1.0)
    // dense positions 2..4 → sparse indices 0..3 (gap at zero counts)
    assert(one.positive === Seq((0, 2.0), (1, 4.0), (2, 1.0)))
    // checkpoint horizon drops the t=1000 snapshot
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 1500L)
    val after = graft.sources.tsdbblock.TsdbWalRecords
      .readHistograms(spark, dir).collect()
    assert(after.length === 2 && after.forall(_.time == 2000L))
  }

  test("checkpoint filters exemplars by the horizon") {
    val dir = tmpDir("graft_rk_cpex_")
    TsdbWalWriter.write(longForm(0L until 100L), dir, partitions = 1)
    val ex = longForm(0L until 100L)
      .withColumn("exemplar", map(lit("trace_id"),
        col("time").cast("string")))
    TsdbWalWriter.writeExemplars(ex, dir)
    TsdbWalWriter.checkpoint(spark, dir, keepTime = 95L)
    val back = TsdbWalRecords.readExemplars(spark, dir)
      .select(col("time")).collect().map(_.getLong(0)).toSet
    assert(back === (95L until 100L).toSet)
  }
}
