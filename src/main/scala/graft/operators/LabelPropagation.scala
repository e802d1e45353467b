package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic label propagation (community detection) — the cheap
  * communities pass between connected components (too coarse: every
  * reachable node merges) and modularity methods (not shuffle-friendly).
  *
  * Classic LPA is notoriously nondeterministic (random update order,
  * random tie-breaks). This variant is exact and reproducible: all nodes
  * update synchronously each round, the new label is the most frequent
  * neighbor label with ties to the SMALLEST label, and the round count is
  * fixed — the same rules an external engine can replay verbatim.
  *
  * Per round: one edge⋈label join (edges cached + pre-partitioned, the
  * label table is node-sized) and one (node, label) count aggregate whose
  * argmax runs as a `max(struct(count, −label))` partial aggregate — the
  * q63 shape — so there is NO per-node ranking window anywhere. */
object LabelPropagation {

  /** Run `rounds` synchronous LPA rounds over UNDIRECTED edges (pass
    * each edge once; both orientations are generated here). Labels start
    * as the node id. Returns (id, community). Isolated nodes never
    * appear (no neighbors → no label source); positive ids required (the
    * argmax negates labels for the tie-break). */
  def communities(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val ue = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long"), col(srcCol).cast("long")))
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = ue.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
    for (_ <- 1 to rounds) {
      labels = ue.join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("best"))
        .select(col("dst").as("id"), (-col("best.nl")).as("lab"))
    }
    // labels are single-referenced per round (no 2^rounds risk), so only
    // the final table is pinned; the edge anchor is released once it is
    LoopCache.finish(labels.select(col("id"), col("lab").as("community")), ue)
  }
}
