package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level text-pipeline operators beyond per-row scoring:
  * benchmark decontamination and repetition analysis — two standard
  * gates between raw crawl and training data.
  */
object TextPipeline {

  /** Benchmark contamination check: which training documents share word
    * k-shingles with an evaluation/benchmark set. The scalable shape is a
    * SHINGLE JOIN, not a doc×doc comparison: explode both sides to
    * (doc, shingle), join on the shingle, count distinct matches per
    * training doc. The benchmark side is distinct-shingled and
    * BROADCAST — eval sets are thousands of docs against a 100 TB train
    * corpus, so the join is map-side with zero shuffle of train data;
    * the only aggregation shuffles carry (doc_id, shingle) pairs already
    * collapsed map-side.
    *
    * Returns one row per CONTAMINATED training doc:
    * (id, n_shingles, n_shared, ratio). Clean docs are absent (at scale
    * the interesting set is the hits — the complement is the corpus).
    */
  def contamination(train: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, k: Int): DataFrame = {
    def distinctShingles(df: DataFrame): DataFrame =
      df.select(col(idCol),
        explode(array_distinct(TextFunctions.shingles(col(textCol), k)))
          .as("shingle"))
    val trainSh = distinctShingles(train)
    val benchSh = broadcast(
      distinctShingles(benchmark).select("shingle").distinct())
    val totals = trainSh.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    trainSh.join(benchSh, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared")) // distinct by construction
      .join(totals, idCol)
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        round(col("n_shared") / col("n_shingles"), 6).as("ratio"))
  }

  /** Repetition statistics per document: over the k-shingle multiset,
    * the dominance of the most repeated shingle and the distinct ratio —
    * the cheap detector for boilerplate/spam/degenerate text. Two
    * partial-aggregated groupBys; the heavy first one collapses
    * (doc, shingle) map-side so the shuffle is bounded by distinct
    * shingles, not text size. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame =
    docs
      .select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), k)).as("shingle"))
      .groupBy(col(idCol), col("shingle"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n")).as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("max_rep"))
      .select(col(idCol), col("n_shingles"), col("n_distinct"), col("max_rep"),
        round(col("max_rep") / col("n_shingles"), 6).as("rep_ratio"),
        round(col("n_distinct") / col("n_shingles"), 6).as("distinct_ratio"))

  /** Sequence packing for training: concatenate documents in a
    * deterministic pseudo-random order and cut the token stream every
    * `capacity` tokens (the pack-then-chunk scheme used to fill fixed
    * context windows). A single global running sum would serialize the
    * corpus through one partition, so packing is SHARDED: each doc hashes
    * to one of `shards` independent streams, and the running token count
    * lives per shard — `shards` ≈ cluster parallelism makes every shard's
    * window sort and cumsum an independent task at 100 TB. Within a
    * shard, order is (portable hash, id): stable, shuffle-proof, and
    * decorrelated from crawl order.
    *
    * Output per doc: its shard, token count, running total `cum` (tokens
    * through this doc within the shard), the sequence index its FIRST
    * token lands in, and whether it straddles a sequence boundary. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    capacity: Int, shards: Int): DataFrame = {
    val h = graft.functions.Hashing.hash64(col(idCol).cast("string"))
    val d = docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      pmod(h, lit(shards.toLong)).as("shard"), h.as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"), col("cum"),
        floor((col("cum") - col("n_tokens")) / capacity.toDouble)
          .cast("long").as("seq"),
        (floor((col("cum") - col("n_tokens")) / capacity.toDouble) =!=
          floor((col("cum") - 1) / capacity.toDouble)).as("straddles"))
  }

  /** Corpus-wide chunk-level dedup (the paragraph/line dedup of CCNet/
    * Gopher pipelines, over fixed `chunkWords`-word chunks since this
    * corpus has no line structure): every doc is cut into consecutive
    * chunks, identical chunks are deduplicated globally keeping the
    * FIRST occurrence (lowest (doc, position)), and each doc is
    * reassembled from its surviving chunks. The unit of shuffle is the
    * (chunk → min occurrence) aggregation — bounded by distinct chunk
    * text, never doc×doc pairs.
    *
    * Output per doc: chunk counts and the deduplicated text
    * (character-exact, so the oracle pins reassembly order too). */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val nChunks = ceil(size(toks) / chunkWords.toDouble).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * chunkWords + 1, lit(chunkWords))))
    val exploded = docs
      .select(col(idCol), posexplode(chunks).as(Seq("pos", "chunk")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("chunk"))
    exploded
      .withColumn("keeper",
        min(struct(col(idCol).as("id"), col("pos").as("pos"))).over(w))
      .withColumn("kept",
        col("keeper.id") === col(idCol) && col("keeper.pos") === col("pos"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("pos").as("pos"), col("chunk").as("chunk"))))),
          x => x.getField("chunk"))).as("dedup_text"))
  }

  /** Deterministic domain-mix resampling — rebalance a corpus so each
    * group's share of the OUTPUT matches `weights` (the training-data
    * "data mixing" pass). The achievable total is fixed by the binding
    * group (min over nᵍ/wᵍ); every other group downsamples to
    * wᵍ·T docs via the portable per-doc hash band, so membership is
    * stable across runs, engines, and corpus growth. Groups without a
    * target weight are dropped.
    *
    * Scale shape: ONE partial-aggregated count per group (the group
    * universe is small by construction — it's a mixing config), rates
    * resolved driver-side into a literal CASE, then a map-side filter.
    * No shuffle of the corpus, no join. */
  def resampleToMix(docs: DataFrame, idCol: String, groupCol: String,
                    weights: Map[String, Double]): DataFrame = {
    val counts = docs
      .where(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratios = weights.collect {
      case (g, w) if counts.contains(g) && w > 0 => counts(g) / w
    }
    // a mixing config whose groups are all absent from the corpus is a
    // config error — fail with the mismatch, not an opaque empty.min
    require(ratios.nonEmpty,
      s"resampleToMix: none of the weighted groups " +
        s"${weights.keys.mkString(", ")} is present in $groupCol")
    val t = ratios.min
    val rate = weights.map { case (g, w) =>
      g -> math.min(1.0, w * t / counts.getOrElse(g, 1L).toDouble)
    }
    val rateCol = weights.keys.foldLeft(lit(Double.NaN)) { (acc, g) =>
      when(col(groupCol) === g, lit(rate(g))).otherwise(acc)
    }
    docs
      .where(col(groupCol).isin(weights.keys.toSeq: _*))
      .where(pmod(graft.functions.Hashing.hash64(col(idCol).cast("string")),
        lit(1000000L)).cast("double") / 1000000.0 < rateCol)
  }

  /** Unigram log-probability fluency score — the language-model-proxy
    * quality filter of the CCNet/Gopher lineage, with the corpus itself
    * as the LM: score(doc) = mean over its tokens of ln(count(token)/N).
    * Gibberish/rare-token documents score far below fluent ones.
    *
    * Two passes, both shuffle-bounded by TOKENS not documents: (1) the
    * unigram table (token → count) via one partial-aggregated groupBy;
    * (2) doc tokens joined to it (at 100 TB the zipfian head covers
    * almost all mass — broadcast the top-k vocabulary and join only the
    * tail, same math). The per-doc mean folds SEQUENTIALLY over the
    * position-sorted token log-probs (`aggregate` over the sorted
    * array), so the result is bit-deterministic and the oracle replays
    * the identical fold (summation-order-dependent float totals would
    * otherwise diverge across engines).
    */
  /** Model-based QUALITY-CLASSIFIER scoring — the FineWeb / DCLM-style
    * curation step: a linear classifier over HASHED n-gram features
    * (the fastText "hashing trick"), sigmoid'd into a [0,1] quality
    * score, thresholded into a keep gate. The Spark shape is the whole
    * point: features never materialize as a vocabulary — each gram
    * hashes straight to its weight (portable md5-derived), the score
    * is one sequential fold per doc, and the entire pass is map-side
    * codegen'd expressions (zero shuffles, zero UDFs, linear at
    * 100 TB). Weights here derive deterministically from the portable
    * hash (the same stand-in policy as the multimodal stub: the real
    * artifact — a trained weight table — is not in this container, but
    * every piece of the plumbing is real: tokenization, uni+bigram
    * hashing, weight lookup, mean-pooled linear score, sigmoid,
    * threshold) and the oracle replays the arithmetic bit-for-bit.
    *
    * Output: (id, n_feats, round(score, 6), keep). */
  def classifierScore(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.5): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // uni + bigram feature grams, in document order
    val bigrams = zip_with(slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val grams = concat(toks, bigrams)
    // hashing trick: gram → md5-derived weight in [-1, 1] (no vocab)
    def w(g: Column): Column =
      (pmod(graft.functions.Hashing.hash64(g), lit(2001L)) - lit(1000L))
        .cast("double") / lit(1000.0)
    val lin = aggregate(grams, lit(0.0), (acc, g) => acc + w(g)) /
      greatest(size(grams), lit(1)).cast("double")
    val score = lit(1.0) / (lit(1.0) + exp(-lin * lit(8.0))) // sigmoid, gain 8
    docs.select(col(idCol),
        size(grams).cast("long").as("n_feats"),
        round(score, 6).as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Cross-document DUPLICATE-SPAN detection — the substring-level
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (the suffix-array pass that removes verbatim spans
    * repeated across documents), re-expressed as shingle coverage: a
    * token position is DUPLICATED when its `k`-token shingle appears in
    * ≥ 2 distinct documents; overlapping duplicated windows merge into
    * maximal spans, and spans shorter than `minSpanTokens` drop. One
    * row per (doc, span): `(idCol, span_start, span_end, span_tokens)`
    * on 0-based token positions, `span_end` exclusive (the last
    * duplicated window's start + k).
    *
    * Scale shape: the shingle frame is corpus-token-sized by necessity
    * (so is a suffix array); everything else is bounded — the
    * distinct-doc count aggregates partial on 8-byte hash keys, the
    * mark-back is a hash equi-join on the same keys, and the span merge
    * is ONE per-document window (both window functions share the
    * exchange). No self-joins, no driver collects. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minSpanTokens: Int = 16): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      posexplode(TextFunctions.shingles(col(textCol), k))
        .as(Seq("pos", "s")))
      .select(col("id"), col("pos"),
        graft.functions.Hashing.hash64(col("s")).as("h"))
    val dup = sh.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") >= 2)
      .select(col("h"))
    val marked = sh.join(dup, Seq("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // gaps-and-islands: a window starts a NEW span when it begins past
    // the running farthest end of everything before it
    val prevMax = max(col("pos") + lit(k)).over(w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    marked
      .withColumn("ns",
        when(prevMax.isNull || col("pos") > prevMax, 1).otherwise(0))
      .withColumn("span", sum(col("ns")).over(w))
      .groupBy(col("id"), col("span"))
      .agg(min(col("pos")).as("s0"), (max(col("pos")) + lit(k)).as("e0"))
      .where(col("e0") - col("s0") >= minSpanTokens)
      .select(col("id").as(idCol),
        col("s0").cast("long").as("span_start"),
        col("e0").cast("long").as("span_end"),
        (col("e0") - col("s0")).cast("long").as("span_tokens"))
  }

  /** The ACTIONABLE half of [[duplicateSpans]]: cut the duplicated
    * spans out and return the scrubbed text — one row per input doc:
    * `(idCol, clean_text, removed_tokens)`. Docs without spans keep
    * their text byte-identical; scrubbed docs re-join surviving tokens
    * with single spaces (the corpus is already whitespace-normalized by
    * the time span dedup runs — see [[TextFunctions.normalize]]).
    * Span removal is a LEFT join of docs to their collected span lists
    * (span count per doc is text-bounded) + a map-side indexed filter —
    * no extra shuffle beyond [[duplicateSpans]]' own. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, minSpanTokens: Int = 16): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, k, minSpanTokens)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    val toks = TextFunctions.tokens(col(textCol))
    val indexed = zip_with(toks,
      sequence(lit(0L), size(toks).cast("long") - 1L),
      (t, i) => struct(t.as("t"), i.as("i")))
    val kept = filter(indexed, x => !exists(col("spans"), s =>
      x.getField("i") >= s.getField("span_start") &&
        x.getField("i") < s.getField("span_end")))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("spans").isNull, col(textCol))
          .otherwise(array_join(transform(kept, _.getField("t")), " "))
          .as("clean_text"),
        coalesce(aggregate(col("spans"), lit(0L), (acc, s) =>
          acc + s.getField("span_end") - s.getField("span_start")), lit(0L))
          .as("removed_tokens"))
  }

  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // one scalar to the driver (corpus token total) — bounded by construction
    val total = freq.agg(sum(col("cnt"))).head().getLong(0)
    toks.join(freq, "tok")
      .select(col(idCol), col("pos"),
        log(col("cnt").cast("double") / lit(total.toDouble)).as("lp"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("lp")))).as("lps"))
      .select(col(idCol),
        size(col("lps")).cast("long").as("n_tokens"),
        round(aggregate(col("lps"), lit(0.0),
          (acc, x) => acc + x.getField("lp")) / size(col("lps")), 6)
          .as("avg_logprob"))
  }
}
