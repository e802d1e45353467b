package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style repetition quality filters (Rae et al. 2021, "Scaling
  * Language Models" §A1.1; the same family C4/RefinedWeb apply):
  * documents dominated by repeated fragments are low-quality training
  * data, and the cheap structural signals that catch them are
  *
  *  - the REPEATED-WORD fraction (this corpus has no line structure, so
  *    the duplicate-line rule lands at word granularity),
  *  - the fraction of characters covered by the single most frequent
  *    word 2-gram,
  *  - the fraction of characters covered by duplicated word 5-grams.
  *
  * All three are emitted as PER-MILLE INTEGERS (1000·num div den) —
  * exact integer arithmetic end to end, so DuckDB replays every row
  * hash-identically; the final boolean applies Gopher-shaped
  * thresholds. Character coverage counts occurrence·length without
  * overlap-merging (sliding occurrences can overlap) — the standard
  * pipeline approximation, capped at 1000, deviation documented here
  * and mirrored by the oracle.
  *
  * Scale shape: word stats are pure array expressions (map-only, no
  * shuffle); each n-gram stat is one (doc, gram) partial-agg shuffle
  * re-keyed to doc — everything is doc-keyed, nothing is corpus-global,
  * so the plan partitions freely at any corpus size. Ties for the top
  * bigram break to the lexicographically SMALLEST gram (min over
  * (-count, gram) structs), deterministic in both engines.
  */
object Repetition {

  private val DupWordPmlMax = 300 // > 30% repeated words
  private val TopBigramPmlMax = 180 // top 2-gram covers > 18% of chars
  private val Dup5gramPmlMax = 150 // duplicated 5-grams cover > 15%

  /** Per-document repetition metrics + flag:
    * (idCol, n_words, n_chars, dup_word_pml, top_bigram,
    * top_bigram_count, top_bigram_pml, dup5_pml, repetitive).
    * Documents whose normalized text is empty are dropped (no signal).
    *
    * PRODUCTION tier = one MAP-ONLY pass: every metric here is a
    * function of a single document's tokens — no cross-document state
    * exists — so routing per-doc gram counts through explode + two
    * (doc, gram) shuffles (the relational tiers below) pays the engine's
    * shuffle machinery for state that never leaves the row. The
    * [[graft.functions.RepetitionStatsExpression]] scalar computes all
    * five statistics inside one codegen'd projection: the whole plan is
    * scan→project, zero exchanges, embarrassingly parallel at any corpus
    * size (measured: the exploded plan's two gram stages cost ~2.8 s
    * each at sf0.1; TextOpsSpec pins all three tiers row-for-row equal
    * on the real corpus). */
  def metrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val normed = df
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.normalizeText(col(textCol)).as("norm"))
      .filter(length(col("norm")) > 0)
    finish(normed
      .select(col("doc_id"),
        length(col("norm")).cast("long").as("n_chars"),
        graft.functions.RepetitionStatsExpression
          .stats(split(col("norm"), " ")).as("st"))
      .select(col("doc_id"),
        col("st.n_words").as("n_words"),
        col("n_chars"),
        col("st.n_distinct").as("n_distinct"),
        col("st.top_bigram").as("top_bigram"),
        col("st.top_bigram_count").as("top_bigram_count"),
        col("st.dup5_chars").as("dup5_chars")))
  }

  /** The relational formulations, kept as the spec REFERENCE tiers (the
    * oracle SQL mirrors them shape-for-shape, and TextOpsSpec pins the
    * map-only production tier against both):
    *
    * `hashGrams=true` rides every gram shuffle on FIXED-WIDTH
    * `(xxhash64(gram), length(gram))` instead of the gram string —
    * 5-gram strings average ~6x a word and dominated q140's shuffle
    * bytes (VERDICT r9). The dup5 metric needs only count·length, so
    * hashing is free there; the top-bigram STRING is recovered by a
    * bounded join-back: collect the (few, usually 1) max-count hashes
    * per doc and re-derive the lexicographically smallest matching gram
    * from base's own text map-side — identical tie-break semantics to
    * the string tier, modulo 64-bit collisions inside one document's
    * gram set (~1e-13/doc). `hashGrams=false` is the all-strings plan. */
  def metricsRelational(df: DataFrame, idCol: String, textCol: String,
      hashGrams: Boolean = true): DataFrame = {
    // normalize ONCE per branch: every downstream expression (word
    // stats, both shingle widths) reads the projected `norm` column
    // instead of re-running the regex normalization inside its own
    // subtree — Catalyst does not share subexpressions across a Filter
    // and the Projects below it, so inlining normalizeText at each use
    // would pay the regex 2x per gram branch
    val normed = df
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.normalizeText(col(textCol)).as("norm"))
      .filter(length(col("norm")) > 0)
    val base = normed
      .select(col("doc_id"), col("norm"),
        split(col("norm"), " ").as("w"),
        length(col("norm")).cast("long").as("n_chars"))
      .select(col("doc_id"), col("norm"), col("n_chars"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"))

    // exploded grams for one shingle width (same tokenization as
    // Dedup.shingleArray: split(normalizeText, " "))
    def grams(n: Int) = normed
      .select(col("doc_id"),
        explode(graft.functions.ShingleArrayExpression.shingles(
          split(col("norm"), " "), n)).as("g"))
    // (doc, gram) counts — partial agg before the doc-keyed shuffle; in
    // the hashed tier the string is dropped BEFORE the exchange and only
    // (gh, glen) ride the wire
    def gramCounts(n: Int) = {
      val keyed =
        if (hashGrams)
          grams(n).select(col("doc_id"), xxhash64(col("g")).as("gh"),
            length(col("g")).cast("long").as("glen"))
        else
          grams(n).select(col("doc_id"), col("g").as("gh"),
            length(col("g")).cast("long").as("glen"))
      keyed.groupBy(col("doc_id"), col("gh"), col("glen"))
        .agg(count(lit(1)).as("c"))
    }

    // most frequent 2-gram, ties to the lexicographically smallest gram.
    // String tier: min over (-count, gram) directly. Hashed tier: find
    // the max count, collect the tied hashes (bounded: ties only — one
    // hash per doc in the common case), and resolve the winning STRING
    // later against base's own `norm` column (already present in the
    // final doc-keyed join) — the same tie-break without ever putting a
    // gram string on the wire. The hashed branch emits (doc_id, ghs,
    // top_bigram_count); the string branch emits the resolved string.
    val counts2 = gramCounts(2)
    val topBigram = if (!hashGrams) {
      counts2
        .groupBy(col("doc_id"))
        .agg(min(struct((-col("c")).as("negc"), col("gh").as("g"))).as("t"))
        .select(col("doc_id"), col("t.g").as("top_bigram"),
          (-col("t.negc")).as("top_bigram_count"))
    } else {
      val cmax = counts2.groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_bigram_count"))
      counts2.join(cmax, Seq("doc_id"))
        .filter(col("c") === col("top_bigram_count"))
        .groupBy(col("doc_id"))
        .agg(collect_list(col("gh")).as("ghs"),
          max(col("top_bigram_count")).as("top_bigram_count"))
    }

    // characters covered by duplicated 5-grams (count·length, no
    // overlap merge — documented approximation, capped later); needs
    // only count and length, so the hashed tier pays nothing here
    val dup5 = gramCounts(5)
      .filter(col("c") > 1)
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("glen")).as("dup5_chars"))

    val joined = base
      .join(topBigram, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
    val resolved =
      if (!hashGrams) joined
      else joined.withColumn("top_bigram",
        // map-side string recovery: smallest of the doc's own 2-grams
        // whose hash is in the candidate set (ghs is never null here —
        // every normed doc has >= 1 gram under the short-doc contract —
        // but a null lambda result just drops the element, so a miss
        // degrades to NULL -> '' like the string tier's left-join miss)
        array_min(filter(
          graft.functions.ShingleArrayExpression.shingles(
            split(col("norm"), " "), 2),
          x => array_contains(col("ghs"), xxhash64(x)))))
    finish(resolved)
  }

  /** Shared finishing projection: per-mille metrics + threshold flag
    * from (doc_id, n_words, n_chars, n_distinct, top_bigram,
    * top_bigram_count, dup5_chars) — identical across all three tiers
    * so the equivalence specs compare full output rows. */
  private def finish(stats: DataFrame): DataFrame =
    stats
      .select(
        col("doc_id"), col("n_words"), col("n_chars"),
        expr("1000 * (n_words - n_distinct) div n_words").as("dup_word_pml"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        // a count-1 "top" gram is no repetition at all — without the
        // guard every 2-word doc's only bigram covers ~all chars and
        // short docs get flagged for being short. Capped at 1000: the
        // count·length coverage over-counts when sliding occurrences
        // OVERLAP ("aa aa aa aa" → 3·5 chars claimed of 11), the same
        // approximation the dup-5-gram tier caps (found by the
        // PropertySpec invariant sweep).
        when(coalesce(col("top_bigram_count"), lit(0L)) >= 2,
          least(expr("1000 * (top_bigram_count * length(top_bigram)) div n_chars"),
            lit(1000L)))
          .otherwise(0L).as("top_bigram_pml"),
        least(coalesce(expr("1000 * dup5_chars div n_chars"), lit(0L)),
          lit(1000L)).as("dup5_pml"))
      .withColumn("repetitive",
        col("dup_word_pml") > DupWordPmlMax ||
          col("top_bigram_pml") > TopBigramPmlMax ||
          col("dup5_pml") > Dup5gramPmlMax)
}
