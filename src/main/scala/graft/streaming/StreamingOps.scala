package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the training-data batch operators: continuous
  * dedup and gap sessionization over unbounded inputs.
  *
  * Both keep BOUNDED state via watermarks — the property that makes them
  * runnable forever at 100 TB/day: state for a key is dropped once the
  * watermark passes it, so memory is ∝ the in-flight window, not the
  * stream's history.
  */
object StreamingOps {

  /** Continuous exact dedup by content digest: emits the FIRST document
    * seen for each digest, suppresses duplicates arriving within the
    * watermark horizon. (Duplicates straddling more than `watermark` of
    * event time pass through — the documented trade for bounded state;
    * size the horizon to the pipeline's dedup window.) One shuffle on the
    * digest; state = one entry per distinct in-flight digest. */
  def dedupStream(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Stream-stream interval join: each left event matched to right events
    * of the same key within `[left.ts - before, left.ts + after]`. BOTH
    * sides carry watermarks and the join condition bounds event time in
    * both directions, so Spark can expire buffered rows: state is ∝ the
    * interval + watermark horizon, never the stream history — the form of
    * stream-stream join that runs forever. (An unbounded-time condition
    * would accumulate state without limit; the analyzer only knows state
    * is droppable because the range + watermarks make it provable.)
    *
    * Output columns: key, left `ts`/payload prefixed `l_`, right
    * `ts`/payload prefixed `r_`. */
  def intervalJoinStream(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      before: String = "10 minutes", after: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $before") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $after"))
  }

  /** Streaming near-duplicate screening against a STATIC historical
    * corpus: each arriving document is MinHash-signed in-stream (the
    * signature is a per-row codegen expression — map work, no state) and
    * its LSH band buckets are probed against the history's bucket table
    * via a stream-static join. Emits one row per arriving doc:
    * (idCol, tsCol, n_bucket_hits, near_dup).
    *
    * Scale shape: the static side is `historyBuckets` — build it ONCE
    * from the historical signature table with [[bandBuckets]] and it
    * behaves like any static dimension (broadcast if it fits, shuffled
    * hash join otherwise; either way the STREAM side state is zero — a
    * stream-static join keeps no watermark state at all). This is the
    * streaming half of [[graft.operators.Dedup.incrementalLshCandidatePairs]]:
    * the batch operator scores candidate pairs exactly; the stream gives
    * the cheap online verdict (any-bucket-collision) that routes suspect
    * docs to the batch scorer.
    *
    * The per-doc re-aggregation after the probe is a streaming agg; its
    * keys include the watermarked event-time column, so per-doc state is
    * dropped once the watermark passes — bounded like every operator in
    * this file.
    *
    * @param docs   streaming DataFrame with idCol, tsCol, textCol
    * @param historyBuckets static (band, bucket) table from [[bandBuckets]] */
  def nearDupStream(
      docs: DataFrame, idCol: String, tsCol: String, textCol: String,
      historyBuckets: DataFrame,
      numPerm: Int = 64, bands: Int = 16, shingleN: Int = 3,
      watermark: String = "1 hour"): DataFrame = {
    val tokens = split(graft.functions.TextFunctions.normalizeText(col(textCol)), " ")
    // banding MUST be bit-identical to the history side: one shared
    // helper (validates bands | numPerm), and shingleN is a parameter —
    // a stream signing with a different shingle space than the history
    // table would silently report every document clean
    val bandCols = graft.operators.Dedup.bandStructs(numPerm, bands)
    docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        graft.functions.MinHashSignatureExpression
          .minhashSig(tokens, numPerm, shingleN).as("sig"))
      .select(col(idCol), col(tsCol),
        explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col(tsCol), col("bb.band"), col("bb.bucket"))
      .join(historyBuckets.select(col("band"), col("bucket"),
        lit(1).as("hit")), Seq("band", "bucket"), "left")
      .groupBy(col(tsCol), col(idCol))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_bucket_hits"))
      .withColumn("near_dup", col("n_bucket_hits") > 0)
  }

  /** The static history side for [[nearDupStream]]: distinct (band,
    * bucket) keys of a signature table ([[graft.operators.Dedup.minHashSignatures]]
    * output). Rebuild on corpus append (or union incrementally). */
  def bandBuckets(signatures: DataFrame,
      numPerm: Int = 64, bands: Int = 16): DataFrame = {
    val bandCols = graft.operators.Dedup.bandStructs(numPerm, bands)
    signatures
      .select(explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band"), col("bb.bucket"))
      .distinct()
  }

  /** Continuous gap sessionization via the native `session_window`
    * aggregate: a session closes after `gap` of event-time silence, the
    * closed session's row is emitted once the watermark passes its end.
    * Same semantics as the batch `Sessionize` operator (lag + running
    * session ids), expressed with merging session state instead of a
    * whole-history window sort. */
  def sessionStream(
      events: DataFrame, userCol: String, tsCol: String,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
