package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The ANN/clustering operators must not leak block-manager entries: a
  * long-lived session (the bench JVM, a notebook, a server) calls them
  * repeatedly, and an un-unpersisted corpus-sized frame per call is a
  * memory leak. Training-internal caches (the bounded samples) are
  * persist/unpersist-balanced; nothing else may persist. */
class UnpersistHygieneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb: DataFrame = (0 until 60).map { i =>
    (i.toLong, Array.tabulate(4)(j => math.sin(i * 7 + j) + (i % 5)))
  }.toDF("vec_id", "embedding")

  /** Run the operator to completion and assert it left the
    * block-manager registry exactly as it found it (baseline-relative:
    * the session is shared across suites). Training-internal bounded
    * caches are persist/unpersist-balanced, so they never show here. */
  private def assertNoResidentCache(what: String)(run: => DataFrame): Unit = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    run.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"$what leaked persisted RDDs: $leaked")
  }

  test("pqKnn leaves no persisted frames behind") {
    assertNoResidentCache("pqKnn") {
      Similarity.pqKnn(emb, emb.limit(2), "vec_id", "embedding",
        dim = 4, m = 2, kCodes = 4, iters = 2, topK = 3, trainSample = 40)
    }
  }

  test("ivfPqKnn leaves no persisted frames behind") {
    assertNoResidentCache("ivfPqKnn") {
      Similarity.ivfPqKnn(emb, emb.limit(2), "vec_id", "embedding",
        dim = 4, nCells = 3, nProbe = 2, m = 2, kCodes = 4, iters = 2,
        topK = 3, trainSample = 40)
    }
  }

  test("ivfPqResidualKnn leaves no persisted frames behind") {
    assertNoResidentCache("ivfPqResidualKnn") {
      Similarity.ivfPqResidualKnn(emb, emb.limit(2), "vec_id", "embedding",
        dim = 4, nCells = 3, nProbe = 2, m = 2, kCodes = 4, iters = 2,
        topK = 3, trainSample = 40)
    }
  }

  test("kmeansAssign / kmeansStats leave no persisted frames behind") {
    assertNoResidentCache("kmeansAssign") {
      Clustering.kmeansAssign(emb, "vec_id", "embedding",
        k = 3, iters = 2, trainSample = 40)
    }
    assertNoResidentCache("kmeansStats") {
      Clustering.kmeansStats(emb, "vec_id", "embedding",
        k = 3, iters = 2, trainSample = 40)
    }
  }

  test("semanticNearDups leaves only its result's own checkpoint blocks") {
    // the operator persists the assignment for its self-join, then
    // eagerly checkpoints the OUTPUT-sized pair set and unpersists —
    // the only block-manager residue is the returned frame's own
    // checkpoint RDD, which dies with the frame (no cache-manager
    // entry, the class that leaks)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Clustering.semanticNearDups(emb, "vec_id", "embedding",
      k = 3, iters = 2, threshold = 0.5, trainSample = 40)
    out.collect()
    val ownRdds = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet -- before --
        ownRdds.map(_.id)
    assert(leaked.isEmpty,
      s"semanticNearDups leaked beyond its result: $leaked")
    ownRdds.foreach(_.unpersist(false)) // caller-side release
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("minhashLshPairs leaves only its result's own checkpoint blocks") {
    // the signature frame is persisted for the 4-way reuse (self-join
    // sides + verify probes), then the OUTPUT-sized verified pair set
    // is eagerly checkpointed and the signatures unpersisted — the
    // last unbalanced persist in the repo, closed round 14
    val docs = (0 until 40).map { i =>
      (i.toLong, s"alpha beta gamma delta ${"epsilon " * (i % 3)} ${i / 8}")
    }.toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 8, bands = 4, shingleK = 2, threshold = 0.3)
    out.collect()
    val ownRdds = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet -- before --
        ownRdds.map(_.id)
    assert(leaked.isEmpty,
      s"minhashLshPairs leaked beyond its result: $leaked")
    ownRdds.foreach(_.unpersist(false)) // caller-side release
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
