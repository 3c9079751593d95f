package graft.sources

import graft.sources.tsdbblock.{HistChunk, WalReader}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip pinning for the native-histogram chunk codec (encodings
  * 2/3) — encode ∘ decode = identity on the chunk's union layout, both
  * encodings, across deterministic pseudo-random inputs. */
class HistChunkSpec extends AnyFunSuite {

  private def mk(time: Long, cnt: Double, sum: Double,
                 pos: Seq[(Int, Double)], neg: Seq[(Int, Double)] = Nil,
                 schema: Int = 0, zt: Double = 0.0, zc: Double = 0.0,
                 hint: Int = 0, custom: Seq[Double] = Nil,
                 float: Boolean = false): WalReader.WalHistogram =
    WalReader.WalHistogram(0L, time, hint, schema, zt, zc, cnt, sum,
      pos, neg, custom, float)

  /** Sparse view on the union layout: zero-count buckets dropped, so
    * inputs with differing layouts compare equal after round-trip. */
  private def sparse(h: WalReader.WalHistogram) =
    (h.time, h.counterResetHint, h.schema, h.zeroThreshold, h.zeroCount,
      h.count, h.sum, h.positive.filter(_._2 != 0.0),
      h.negative.filter(_._2 != 0.0), h.customValues)

  private def roundtrip(points: Seq[WalReader.WalHistogram],
                        float: Boolean): Unit = {
    val data = HistChunk.encode(points, float)
    val back = HistChunk.decode(data, float)
    assert(back.size == points.size)
    assert(back.map(sparse) == points.map(sparse),
      s"float=$float\n got ${back.map(sparse)}\n want ${points.map(sparse)}")
  }

  test("integer chunk: single sample round-trips") {
    roundtrip(Seq(mk(1000L, 7.0, 12.5,
      pos = Seq((0, 3.0), (1, 2.0), (5, 2.0)), zc = 1.0, hint = 2)), float = false)
  }

  test("integer chunk: growing counter run round-trips (delta + dod)") {
    val points = (0 until 200).map { i =>
      mk(1000L + i * 15000L, cnt = 10.0 + 3 * i, sum = 1.5 * i,
        pos = Seq((0, 4.0 + i), (1, 3.0 + 2 * i), (7, 3.0)),
        neg = Seq((-2, 1.0 + i)), zc = i.toDouble, hint = 2)
    }
    // batches at 120 — two chunks
    val batches = HistChunk.chunkBatches(points)
    assert(batches.map(_.size) == Seq(120, 80))
    batches.foreach(roundtrip(_, float = false))
  }

  test("integer chunk: samples with DIFFERENT bucket sets share the union layout") {
    val points = Seq(
      mk(0L, 2.0, 1.0, pos = Seq((1, 2.0))),
      mk(60000L, 5.0, 4.0, pos = Seq((1, 2.0), (3, 3.0))),
      mk(120000L, 9.0, 9.0, pos = Seq((1, 3.0), (3, 4.0), (4, 2.0))))
    roundtrip(points, float = false)
  }

  test("float chunk: fractional counts round-trip bit-exactly") {
    val points = (0 until 50).map { i =>
      mk(i * 30000L, cnt = 1.25 * i + 0.5, sum = math.Pi * i,
        pos = Seq((0, 0.25 * i), (2, 1.0 / (i + 1))),
        zc = 0.125 * i, zt = math.pow(2, -128) / 2, float = true)
    }
    roundtrip(points, float = true)
  }

  test("zero threshold codec: 0, powers of two, arbitrary") {
    val pts = Seq(0.0, math.pow(2, -128), 0.5, 1024.0, 3.5e-10).map { zt =>
      mk(5L, 1.0, 1.0, pos = Seq((0, 1.0)), zt = zt, float = true)
    }
    pts.foreach(p => roundtrip(Seq(p), float = true))
  }

  test("NHCB custom bounds (schema -53) ride the layout") {
    val points = Seq(
      mk(0L, 6.0, 30.0, pos = Seq((0, 2.0), (1, 4.0)), schema = -53,
        custom = Seq(0.1, 2.5)),
      mk(60000L, 8.0, 42.0, pos = Seq((0, 3.0), (1, 5.0)), schema = -53,
        custom = Seq(0.1, 2.5)))
    roundtrip(points, float = false)
  }

  test("chunkBatches cuts on schema / zeroThreshold / custom / float changes") {
    val a = mk(0L, 1.0, 1.0, pos = Seq((0, 1.0)), schema = 0)
    val b = mk(1L, 1.0, 1.0, pos = Seq((0, 1.0)), schema = 3)
    val c = mk(2L, 1.0, 1.0, pos = Seq((0, 1.0)), schema = 3, zt = 0.5)
    val d = mk(3L, 1.0, 1.0, pos = Seq((0, 1.0)), schema = 3, zt = 0.5,
      float = true)
    assert(HistChunk.chunkBatches(Seq(a, b, c, d)).map(_.size) ==
      Seq(1, 1, 1, 1))
    assert(HistChunk.chunkBatches(Seq(a, a, a)).map(_.size) == Seq(3))
  }

  test("chunkBatches cuts on hint changes, explicit resets, regressions") {
    def h(t: Long, cnt: Double, hint: Int = 0,
          pos: Seq[(Int, Double)] = Seq((0, 1.0))) =
      mk(t, cnt, cnt, pos = pos, hint = hint)
    // mid-run reset MARKER: survives the chunk tier because the reset
    // sample heads its own chunk (one chunk = one header hint) — a
    // compaction re-encode is lossless for the hint too
    val run = Seq(h(0, 5.0, hint = 2), h(1, 6.0, hint = 2),
      h(2, 1.0, hint = 1), h(3, 2.0, hint = 2))
    val batches = HistChunk.chunkBatches(run)
    assert(batches.map(_.size) == Seq(2, 1, 1))
    val back = batches.flatMap(b =>
      HistChunk.decode(HistChunk.encode(b, float = false), float = false))
    assert(back.map(_.counterResetHint) == Seq(2, 2, 1, 2))
    // ACTUAL count regression on an unknown-hint run: non-appendable,
    // the new chunk starts at the reset (Prometheus's appender rule)
    assert(HistChunk.chunkBatches(Seq(h(0, 5.0), h(1, 3.0)))
      .map(_.size) == Seq(1, 1))
    // bucket-level regression with equal total count also cuts
    assert(HistChunk.chunkBatches(Seq(
      h(0, 2.0, pos = Seq((0, 2.0))),
      h(1, 2.0, pos = Seq((1, 2.0))))).map(_.size) == Seq(1, 1))
    // GAUGE histograms fluctuate freely — no regression cuts
    assert(HistChunk.chunkBatches(Seq(h(0, 5.0, hint = 3),
      h(1, 3.0, hint = 3))).map(_.size) == Seq(2))
  }

  test("NHCB bounds use the compact 25-bit form; escapes round-trip") {
    // histogram_meta.go putCustomBound: 0.5-multiples in [0, 2^25−2]
    // take 25 bits; anything else escapes to the all-ones sentinel +
    // raw float64 (89 bits). Same chunk, compact vs escaped bounds:
    def chunk(bounds: Seq[Double]) = HistChunk.encode(Seq(
      mk(0L, 2.0, 3.0, pos = Seq((0, 2.0)), schema = -53,
        custom = bounds)), float = false)
    val compact = chunk(Seq(0.5, 1.0, 2.5, 10.0))
    val escaped = chunk(Seq(1.0 / 3, 0.1, -2.5, 1e9))
    assert(compact.length < escaped.length,
      s"compact=${compact.length}B escaped=${escaped.length}B")
    // escape values (incl. the compact-range boundary 2^24−0.5·1)
    // round-trip bit-exactly
    val bs = Seq(1.0 / 3, 0.1, -2.5, 1e9, 16777215.0)
    val b2 = HistChunk.decode(chunk(bs), float = false)
    assert(b2.head.customValues == bs)
  }

  test("integer chunk rejects fractional counts loudly") {
    val e = intercept[IllegalArgumentException] {
      HistChunk.encode(Seq(mk(0L, 1.5, 1.0, pos = Seq((0, 1.5)))),
        float = false)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("pseudo-random fuzz: 40 chunks, both encodings") {
    val rnd = new scala.util.Random(42)
    (0 until 40).foreach { trial =>
      val float = trial % 2 == 1
      val n = 1 + rnd.nextInt(150)
      // ONE hint per chunk: the counter-reset header is chunk-level
      // (byte 2 describes the first sample; in-chunk samples are
      // appendable by construction, hence never resets)
      val hint = rnd.nextInt(4)
      val idxPool = Seq(-8, -3, -1, 0, 1, 2, 3, 9, 40, 41, 42, 200)
      var t = rnd.nextInt(1000000).toLong
      val points = (0 until n).map { _ =>
        t += 1 + rnd.nextInt(90000)
        val k = 1 + rnd.nextInt(6)
        val idx = rnd.shuffle(idxPool).take(k).sorted
        def v(): Double =
          if (float) rnd.nextDouble() * 100 else rnd.nextInt(1000).toDouble
        mk(t, cnt = v() + 1, sum = rnd.nextGaussian() * 50,
          pos = idx.map(_ -> (v() + 1)),
          neg = if (rnd.nextBoolean()) Seq((-20, v() + 1)) else Nil,
          schema = 2, zc = v(), hint = hint, float = float)
      }
      roundtrip(points, float)
    }
  }
}
