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
}
