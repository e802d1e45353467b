package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Train/eval decontamination: flag training documents that share word
  * n-grams with an evaluation set — the standard pre-training hygiene step
  * (an eval question leaking into the training corpus inflates benchmark
  * scores). The reference repo has no analogue; this extends its
  * normalize→aggregate pipeline shape (calcular_kpi.py:86-118) to the
  * corpus-hygiene stage a training-data pipeline needs.
  *
  * Shape: both sides are exploded to DISTINCT (doc, gram) pairs, joined on
  * the gram, and re-aggregated per training document. The eval side is the
  * small side by construction (benchmarks are MBs; training corpora are
  * TBs), so its distinct gram set is broadcast — the training side never
  * shuffles: explode → broadcast-hash-join → partial/final agg, one
  * shuffle total (the final agg on doc id).
  */
object Decontaminate {

  /** Distinct word `n`-grams per document: (id, gram), via
    * [[Dedup.shingles]] (one tokenization contract for both operators).
    * Documents shorter than `n` tokens contribute their whole text as one
    * gram (a 3-token doc can still be an exact eval leak); BLANK documents
    * contribute nothing — without the filter, a blank train doc and a
    * blank eval doc would "share" the phantom empty-string gram and
    * report false contamination. */
  /** @param dedup distinct (id, gram) pairs when true; raw occurrences
    *        when false (for consumers that dedup later, cheaper) */
  def docGrams(df: DataFrame, idCol: String, textCol: String, n: Int,
      dedup: Boolean = true): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    val nonBlank = df.filter(
      length(TextFunctions.normalizeText(col(textCol))) > 0)
    Dedup.shingles(nonBlank, idCol, textCol, n, dedup = dedup)
      .withColumnRenamed("shingle", "gram")
  }

  /** Contamination report over the FULL training set: one row per training
    * document with the number of distinct `n`-grams it shares with any
    * eval document (`n_overlap`, 0 for clean docs) and a boolean flag.
    *
    * `broadcastEval=true` (default) hints the eval gram set as the
    * broadcast side — right whenever the eval corpus is orders of
    * magnitude smaller than training data, which is the decontamination
    * regime; set false to let AQE decide (e.g. two same-sized corpora).
    *
    * At 100 TB the gram join key can dominate shuffle width; grams here
    * ride a broadcast (no shuffle), so the string key is free. If both
    * sides are huge (corpus-vs-corpus overlap, not decontamination), hash
    * grams to longs first and accept the 2^-64 collision tier. */
  def overlapReport(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    // train side stays RAW (duplicate grams and all): probing the
    // broadcast eval set first means only HITS reach the distinct-count
    // shuffle — a per-doc distinct() before the join would hash-shuffle
    // every gram of the full training corpus just to dedup rows the
    // probe is about to discard (the .explain that motivated this showed
    // that shuffle dominating the plan)
    val trainGrams = docGrams(train, idCol, textCol, n, dedup = false)
    val evalGrams0 = docGrams(eval_, idCol, textCol, n)
      .select(col("gram")).distinct()
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    val hits = trainGrams
      .join(evalGrams, Seq("gram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_overlap"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }
}
