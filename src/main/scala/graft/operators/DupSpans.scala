package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Duplicated-SPAN detection — the sliding-window approximation of
  * suffix-array substring dedup (find every ≥W-token span that also
  * occurs elsewhere in the corpus, and each document's longest one).
  * Where [[Chunking.dupBlockRatio]] counts duplication at FIXED block
  * boundaries, the windows here slide by one token, so a repeated span
  * is caught at every alignment and consecutive duplicated windows chain
  * into the true span length: a maximal run of R duplicated W-windows ≡
  * a duplicated span of R+W−1 tokens.
  *
  * Pipeline shape (the honest substring-dedup cost — n·L windows):
  *  1. narrow map: tokenize once, emit (doc, window-index, digest) per
  *     sliding window — one codegen'd shingle pass per document, then
  *     xxhash64 per window in the scale tier; documents shorter than W
  *     contribute their whole text as one window so short exact dupes
  *     still register;
  *  2. corpus-wide window counts: one digest-keyed aggregate
  *     (map-side partial) + a co-partitioned digest join back — in the
  *     hashed scale tier the shuffle carries fixed-width 8-byte digests;
  *     the gate tier (hashed=false) keys the same shuffle on the raw
  *     window string so DuckDB can replay it collision-free;
  *  3. runs: per-document gaps-and-islands over the DUPLICATED windows
  *     only (widx − row_number is constant within a consecutive run) —
  *     the ranking shuffle is doc-keyed and carries 3 integers per
  *     duplicated window.
  * Everything is integer/string exact — DuckDB replays it hash-exactly.
  */
object DupSpans {

  /** Per-document duplicated-span report:
    * (idCol, n_tokens, n_windows, n_dup_windows, max_dup_span_tokens).
    * A window is duplicated when its W-token sequence occurs more than
    * once corpus-wide (any document, any alignment, self-overlaps
    * included — matching the substring-dedup convention that
    * within-document repetition counts).
    *
    * Window strings are built by ONE codegen'd pass per document
    * ([[graft.functions.ShingleArrayExpression]] with n = W — a sliding
    * W-window IS a W-shingle, whole-text fallback included; the
    * higher-order `transform`+`slice` formulation it replaced
    * re-evaluated the tokenization inside the lambda, 54 s of the sf1
    * cold run by itself). `hashed = true` (default, the scale tier)
    * keys window counts on xxhash64 of the window string — the explode
    * shuffles 8-byte longs (q77's hashed-blocks trade; equal reports
    * spec-asserted, a 2^-64 collision being the only difference).
    * `hashed = false` groups the RAW window text — byte-for-byte the
    * DuckDB oracle's own grouping key, so the gate tier is collision-free
    * by construction (windows join W tokens with single spaces and
    * tokens contain no spaces, so string equality ≡ token-slice
    * equality; a ≥W-token window has W−1 spaces and a short-doc window
    * fewer, so the two branches can never collide either). */
  def report(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8, hashed: Boolean = true): DataFrame = {
    require(windowTokens >= 1, s"windowTokens=$windowTokens must be >= 1")
    val w = windowTokens
    val toks = df
      .select(col(idCol).as("id"),
        split(TextFunctions.normalizeText(col(textCol)), " ").as("t"))
      .filter(size(col("t")) > 0 && col("t") =!= array(lit("")))
      .select(col("id"), col("t"), size(col("t")).as("n_tokens"))
    val windows = toks.select(col("id"), col("n_tokens"),
      posexplode(graft.functions.ShingleArrayExpression.shingles(col("t"), w))
        .as(Seq("widx", "wstr")))
      .select(col("id"), col("n_tokens"), col("widx"),
        (if (hashed) xxhash64(col("wstr")) else col("wstr")).as("digest"))
    // one digest-keyed shuffle: the corpus-wide count is an unordered
    // window aggregate over the SAME exchange the rows already ride —
    // a groupBy + join-back formulation shuffles the window table twice
    val wCnt = Window.partitionBy(col("digest"))
    // PERSIST: `flagged` feeds two aggregations (islands + per-doc
    // counts); uncached, the tokenize → window explode → digest-keyed
    // count-over-window pipeline — the expensive part of the query —
    // would execute twice. 4 small columns per window row.
    val flagged = windows
      .select(col("id"), col("n_tokens"), col("widx"),
        (count(lit(1)).over(wCnt) > 1).as("dup"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // islands: within a doc, consecutive dup windows share
    // widx - row_number (computed over dup windows only)
    val wRun = Window.partitionBy(col("id")).orderBy(col("widx"))
    val runs = flagged.filter(col("dup"))
      .select(col("id"),
        (col("widx") - row_number().over(wRun)).as("island"))
      .groupBy(col("id"), col("island")).agg(count(lit(1)).as("run"))
      .groupBy(col("id")).agg(max(col("run")).as("max_run"))
    val perDoc = flagged.groupBy(col("id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_windows"),
        count_if(col("dup")).as("n_dup_windows"))
    // pin the per-doc report, release the window-level anchor
    LoopCache.finish(
      perDoc.join(runs, Seq("id"), "left")
        .select(col("id").as(idCol), col("n_tokens").cast("long").as("n_tokens"),
          col("n_windows"), col("n_dup_windows"),
          // run of R windows ≡ span of R+W−1 tokens, capped by the doc
          // (the short-doc whole-text window would otherwise overstate)
          when(col("max_run").isNull, lit(0L))
            .otherwise(least(col("n_tokens").cast("long"),
              col("max_run") + (w - 1))).as("max_dup_span_tokens")),
      flagged)
  }
}
