package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash sketch MERGING — the property that makes MinHash a corpus-scale
  * similarity tool rather than a per-document one: the signature of a
  * UNION of sets is the elementwise minimum of the sets' signatures, so
  * group-level (per-source, per-snapshot, per-partition) signatures fall
  * out of one partial-aggregable min — no group ever materializes its
  * full shingle set in one place.
  *
  * The merged signatures then estimate pairwise group Jaccard as the
  * fraction of equal slots: |groups|² tiny rows against signatures of
  * fixed width, regardless of how many documents or shingles each group
  * holds. Estimator std is √(j(1−j)/numPerm) — callers pair it with an
  * exact tier (graft: q108's per-source shingle-set join) when the
  * estimate must be audited.
  */
object SketchMerge {

  /** Per-group merged signature: elementwise min of `sigCol` arrays.
    * The posexplode → (group, slot) min-aggregate collapses map-side to
    * groups·numPerm rows before its one shuffle. */
  def mergedSignatures(sigs: DataFrame, groupCol: String,
      sigCol: String): DataFrame =
    sigs.select(col(groupCol).as("grp"),
        posexplode(col(sigCol)).as(Seq("pos", "v")))
      .groupBy(col("grp"), col("pos")).agg(min(col("v")).as("mv"))
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
        s => s.getField("mv")).as("sig"))
      .select(col("grp").as(groupCol), col("sig"))

  /** All group pairs (a < b) with the slot-agreement Jaccard estimate —
    * an exact integer ratio of the deterministic signatures, emitted as
    * agree-count + width so callers control the division. */
  def pairwiseEstimates(merged: DataFrame, groupCol: String,
      sigCol: String): DataFrame = {
    val a = merged.select(col(groupCol).as("grp_a"), col(sigCol).as("sig_a"))
    val b = merged.select(col(groupCol).as("grp_b"), col(sigCol).as("sig_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), p => p)).cast("long").as("n_agree"),
        size(col("sig_a")).cast("long").as("n_slots"))
  }
}
