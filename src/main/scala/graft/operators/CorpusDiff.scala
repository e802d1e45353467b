package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions — the audit step before
  * promoting a new corpus build: which documents were added, removed,
  * changed (same id, different content), or carried unchanged. The
  * reference's pipeline rebuilds outputs whole (calcular_kpi.py rewrites
  * the CSV every run); at 100 TB rebuilds must instead be validated and
  * shipped as diffs.
  *
  * One full-outer join on the id, comparing content DIGESTS (md5) rather
  * than the text itself — the shuffle carries (id, 16-byte digest), not
  * document bodies, so diffing two 100 TB snapshots moves ~tens of GB.
  * Digest comparison is exact equality (no false "unchanged" beyond md5
  * collision odds, which the oracle tier shares since both engines hash
  * the same bytes).
  */
object CorpusDiff {

  /** Per-id diff: (id, status ∈ added|removed|changed|unchanged).
    * `added` = in `next` only; `removed` = in `prev` only. Assumes ids
    * are unique per snapshot (corpus primary key). */
  def diff(prev: DataFrame, next: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence flags, not digest-IS-NULL: md5(NULL text) is NULL, so a row
    // present with null content would otherwise masquerade as absent
    val p = prev.select(col(idCol), md5(col(textCol).cast("binary")).as("d_prev"),
      lit(true).as("in_prev"))
    val n = next.select(col(idCol), md5(col(textCol).cast("binary")).as("d_next"),
      lit(true).as("in_next"))
    p.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("in_prev").isNull, "added")
          .when(col("in_next").isNull, "removed")
          // null-safe equality: null text on both sides is 'unchanged'
          .when(col("d_prev") <=> col("d_next"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Aggregate view: one row per status with count and id span. */
  def diffSummary(prev: DataFrame, next: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(prev, next, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
}
