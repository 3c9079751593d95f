package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing, chunk-level dedup, and k-means — model-checked on
  * hand-computable inputs. */
class PackingClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: per-shard cumsum, seq of first token, straddle flag") {
    // one shard so the stream order is fully determined by (hash, id)
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),   // 3 tokens
      (2L, Seq.fill(4)("w").mkString(" ")),   // 4
      (3L, Seq.fill(5)("w").mkString(" "))    // 5
    ).toDF("doc_id", "text")
    val out = TextPipeline.packSequences(docs, "doc_id", "text",
      capacity = 6, shards = 1)
      .orderBy(col("cum"))
      .select(col("doc_id"), col("n_tokens"), col("cum"), col("seq"), col("straddles"))
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // stream = docs in hash order; total 12 tokens over capacity 6:
    // cum partitions the stream; a doc straddles iff its first and last
    // token land in different sequences
    assert(out.map(_._2).sum === 12L)
    assert(out.map(_._3) === out.map(_._2).scanLeft(0L)(_ + _).tail)
    out.foreach { case (_, n, cum, seq, straddles) =>
      assert(seq === (cum - n) / 6)
      assert(straddles === ((cum - n) / 6 != (cum - 1) / 6))
    }
  }

  test("packSequences shards independently (cumsum never crosses shards)") {
    val docs = (1L to 40L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = TextPipeline.packSequences(docs, "doc_id", "text",
      capacity = 10, shards = 4)
    val perShard = out.groupBy("shard").agg(max("cum").as("m"), sum("n_tokens").as("s"))
      .as[(Long, Long, Long)].collect()
    assert(perShard.length > 1)
    perShard.foreach { case (_, m, s) => assert(m === s) }
  }

  test("chunkDedup keeps the globally first occurrence of each chunk") {
    // 2-word chunks; "a b" appears in docs 1 and 2, and twice in doc 1
    val docs = Seq(
      (1L, "a b c d a b"),  // chunks: "a b", "c d", "a b"
      (2L, "a b x y")       // chunks: "a b", "x y"
    ).toDF("doc_id", "text")
    val out = TextPipeline.chunkDedup(docs, "doc_id", "text", chunkWords = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: 3 chunks, "a b"(pos 0) and "c d" kept, "a b"(pos 2) dropped
    assert(out(1L) === ((3L, 2L, "a b c d")))
    // doc 2: "a b" lost to doc 1, "x y" kept
    assert(out(2L) === ((2L, 1L, "x y")))
  }

  test("chunkDedup: trailing short chunk is preserved verbatim") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextPipeline.chunkDedup(docs, "doc_id", "text", chunkWords = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out === ((1L, 2L, 2L, "a b c")))
  }

  test("kmeans: total membership, cluster range, and Lloyd improvement") {
    val emb = (0L until 60L).map { i =>
      val base = (i % 3).toDouble * 10.0
      (i, Array.tabulate(4)(j => (base + (i % 5) * 0.1 + j).toFloat))
    }.toDF("vec_id", "embedding")
    def distortion(iters: Int): Double =
      Clustering.kmeansStats(emb, "vec_id", "embedding", k = 3, iters = iters)
        .agg(sum(col("distortion"))).head.getDouble(0)
    val assigned = Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 2)
    assert(assigned.count() === 60L)
    assert(assigned.where(col("cluster") < 0 || col("cluster") >= 3).count() === 0)
    // a Lloyd update never increases total distortion
    assert(distortion(1) <= distortion(0) + 1e-9)
    assert(distortion(2) <= distortion(1) + 1e-9)
  }

  test("kmeans is run-to-run deterministic") {
    val emb = (0L until 30L).map(i =>
      (i, Array.tabulate(4)(j => ((i * 7 % 13) + j).toFloat)))
      .toDF("vec_id", "embedding")
    def run() = Clustering.kmeansAssign(emb, "vec_id", "embedding", 4, 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(run() === run())
  }

  test("sampled training: non-binding sample equals the full-corpus run") {
    val emb = (0L until 60L).map { i =>
      val base = (i % 3).toDouble * 10.0
      (i, Array.tabulate(4)(j => (base + (i % 5) * 0.1 + j).toFloat))
    }.toDF("vec_id", "embedding")
    def run(sample: Int) =
      Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 2,
        trainSample = sample).as[(Long, Long, Double)].collect().toSet
    // sample >= corpus selects every row: identical training
    assert(run(60) === run(1000000))
    assert(run(0) === run(60)) // 0 = the max(50k, 1000k) default, non-binding here
  }

  test("sampled training: a binding sample still assigns the full corpus") {
    val emb = (0L until 60L).map { i =>
      val base = (i % 3).toDouble * 10.0
      (i, Array.tabulate(4)(j => (base + (i % 5) * 0.1 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 2,
      trainSample = 20).as[(Long, Long, Double)].collect()
    assert(out.length === 60)                 // every vector assigned
    assert(out.forall(r => r._2 >= 0 && r._2 < 3))
    // deterministic: the sample is hash-selected, not random
    val again = Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 2,
      trainSample = 20).as[(Long, Long, Double)].collect()
    assert(out.toSet === again.toSet)
    // each row sits at its ARGMIN trained centroid: per-cluster mean
    // distance must beat swapping any row to another cluster's centroid
    // — covered by construction (dist = min over when-chain); spot-check
    // the sample actually bound by differing from full-corpus training
    val full = Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 2)
      .as[(Long, Long, Double)].collect()
    assert(full.map(r => (r._1, r._3)).toSet !== out.map(r => (r._1, r._3)).toSet)
  }
}
