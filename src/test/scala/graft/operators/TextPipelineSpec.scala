package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub redacts emails, IPs and phones with typed placeholders") {
    val df = Seq(
      ("mail me at a.b+c@sub.example.org now", "[EMAIL]"),
      ("server 192.168.0.1 down", "[IP]"),
      ("call 555-867-5309 or 555.867.5309", "[PHONE]"),
      ("clean text stays clean", null)
    ).toDF("text", "expect_token")
    val out = df.select(col("expect_token"),
      TextFunctions.piiScrub(col("text")).as("scrubbed")).collect()
    out.foreach { r =>
      val tok = r.getString(0)
      val s = r.getString(1)
      if (tok == null) assert(s === "clean text stays clean")
      else assert(s.contains(tok) && !s.exists(_.isDigit) && !s.contains("@"),
        s"scrub failed: $s")
    }
    // exactness: every PII kind replaced, order-independent content intact
    val one = df.sparkSession.range(1).select(TextFunctions.piiScrub(
      lit("x a@b.co 1.2.3.4 555-123-4567 y")).as("s")).head.getString(0)
    assert(one === "x [EMAIL] [IP] [PHONE] y")
  }

  test("contamination flags exactly the train docs sharing a shingle") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),     // shares "alpha beta gamma"
      (2L, "zeta eta theta iota"),        // clean
      (3L, "alpha beta gamma alpha beta gamma") // duplicate shingles count once
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val got = TextPipeline.contamination(train, bench, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    // doc 1: shingles {abg, bgd} distinct=2, shared=1; doc 3: distinct
    // shingles {abg, bga, gab, abg…}→ check: tokens a b g a b g, 3-shingles:
    // abg, bga, gab, abg → distinct {abg,bga,gab}=3, shared {abg}=1
    assert(got === Set(
      (1L, 2L, 1L, 0.5),
      (3L, 3L, 1L, 0.333333)))
  }

  test("lshConnectedComponents ≡ union-find over the same bucket graph") {
    // replicated + mutated docs: several multi-doc components plus
    // singletons; fixpoint label = component min id
    val docs = (0L until 40L).map { i =>
      val fam = i % 7
      val text = s"family $fam shared body of text " +
        (if (i % 3 == 0) s"tail variant ${i % 2}" else s"tail variant ${i % 5}")
      (i, text)
    }.toDF("doc_id", "text")
    val got = Dedup.lshConnectedComponents(docs, "doc_id", "text",
        k = 8, bands = 4, shingleK = 3)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, comp, _) => id -> comp }.toMap

    // independent model: bucket graph from the signature columns, plain
    // union-find to the fixpoint
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", k = 8, shingleK = 3)
      .collect().map(r => r.getLong(0) ->
        (0 until 8).map(i => r.getLong(r.fieldIndex(s"mh$i"))))
    val parent = scala.collection.mutable.Map((0L until 40L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (b <- 0 until 4) {
      sig.groupBy { case (_, mh) => mh.slice(b * 2, b * 2 + 2) }
        .values.foreach { members =>
          members.map(_._1).toSeq.sliding(2).foreach {
            case Seq(x, y) => union(x, y); case _ => ()
          }
        }
    }
    val want = (0L until 40L).map(i => i -> find(i)).toMap
    assert(got === want)
    assert(want.values.toSet.size < 40, "fixture must form real components")
  }

  test("repetition stats expose degenerate documents") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // all shingles identical
      (2L, "one two three four five six")    // all distinct
    ).toDF("doc_id", "text")
    val got = TextPipeline.repetition(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got === Set(
      (1L, 4L, 1L, 4L, 1.0, 0.25),
      (2L, 4L, 4L, 1L, 0.25, 1.0)))
  }

  test("classifier score: hashed uni+bigram features, sigmoid gate") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a"), (3L, "a b c")).toDF("doc_id", "text")
    val out = TextPipeline.classifierScore(docs, "doc_id", "text")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    // "a b c": 3 unigrams + 2 bigrams; "a": 1 unigram, no bigrams
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 5L), (2L, 1L), (3L, 5L)))
    // deterministic: identical text, identical score; bounded in (0,1)
    assert(out(0)._3 === out(2)._3)
    assert(out.forall(r => r._3 > 0.0 && r._3 < 1.0))
    // keep is exactly the thresholded (rounded) score
    assert(out.forall(r => r._4 === (r._3 >= 0.5)))
    // the score is the mean-pooled hashed-weight sigmoid: recompute one
    def w(g: String): Double =
      ((graft.functions.Hashing.hash64Const(g) % 2001L + 2001L) % 2001L
        - 1000L).toDouble / 1000.0
    val lin = Seq("a", "b", "c", "a b", "b c").map(w).sum / 5.0
    val want = BigDecimal(1.0 / (1.0 + math.exp(-lin * 8.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0)._3 - want) < 1e-9, s"${out(0)._3} vs $want")
  }
}
