package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.SqlBridge

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
    // DEEP-ROUNDS SAFE (round 16): rounds is caller-supplied, so each
    // round is pinned AND re-rooted (the BFS/PageRank pattern) — the SQL
    // plan never nests across rounds, so a deep-budget call cannot hit
    // the measured superlinear Catalyst planning cliff (SCALE.md r14);
    // warm re-invocations return the memoized final. Staleness contract:
    // PageRank's object scaladoc.
    LoopCache.memo(Seq("lpa", LoopCache.planKey(edges), srcCol, dstCol,
        rounds)) {
      val ue = edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .union(edges.select(col(dstCol).cast("long"), col(srcCol).cast("long")))
        .distinct()
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = ue.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lab"))
      var pinnedPrev = labels // identity seed, never persisted: no-op release
      for (_ <- 1 to rounds) {
        val pinned = LoopCache.step(
          ue.join(labels, col("src") === col("id"))
            .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
            .groupBy(col("dst"))
            .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("best"))
            .select(col("dst").as("id"), (-col("best.nl")).as("lab")),
          pinnedPrev)
        labels = SqlBridge.reRoot(pinned)
        pinnedPrev = pinned
      }
      LoopCache.finish(labels.select(col("id"), col("lab").as("community")),
        ue, pinnedPrev)
    }
  }

  /** [[communities]] over a STAGED undirected adjacency layout (id,
    * sorted nbrs array): per round ONE exchange — labels join the
    * node-sized adjacency, a codegen'd explode delivers each label to
    * its neighbors, and the argmax collapses into a single aggregate via
    * a bounded mode-of-sorted-list expression (neighbor lists are top-k
    * sparsified, so the collected list is ≤ 2k labels). The edge-layout
    * loop paid two exchanges per round (count per (node,label), then
    * argmax per node); same labels, same min-label tie-break. */
  def communitiesAdj(adj: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    // DEEP-ROUNDS SAFE (round 16): memo + per-round pin/reRoot — see
    // [[communities]].
    LoopCache.memo(Seq("lpaAdj", LoopCache.planKey(adj), rounds)) {
    val a0 = adj.select(col("id").cast("long").as("nid"),
      col("nbrs").cast("array<long>").as("nbrs"))
    // loop-tuned width + static rounds over an id-partitioned stationary
    // operand (see LoopCache.loopSession)
    val w = LoopCache.loopWidth(adj.sparkSession, LoopCache.pinnedRow(
      a0.agg(coalesce(sum(size(col("nbrs")).cast("long")), lit(0L))))
      .getLong(0))
    val a = LoopCache.tunedInputs(w, a0).head
      .repartition(w, col("nid")).sortWithinPartitions("nid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // most frequent label, ties to the SMALLEST: one ascending scan of
    // the sorted label list — runs are contiguous, and strict > keeps
    // the first (= smallest) label among equal counts. Exactly the
    // row_number(c desc, lab) argmax of the edge-layout rounds.
    val mode = expr(
      """aggregate(labs,
        |  named_struct('bl', CAST(0 AS BIGINT), 'bc', CAST(0 AS BIGINT),
        |               'cl', CAST(-1 AS BIGINT), 'cc', CAST(0 AS BIGINT)),
        |  (s, x) -> IF(x = s.cl,
        |    named_struct('bl', IF(s.cc + 1 > s.bc, s.cl, s.bl),
        |                 'bc', IF(s.cc + 1 > s.bc, s.cc + 1, s.bc),
        |                 'cl', s.cl, 'cc', s.cc + 1),
        |    named_struct('bl', IF(s.bc = 0, x, s.bl),
        |                 'bc', IF(s.bc = 0, CAST(1 AS BIGINT), s.bc),
        |                 'cl', x, 'cc', CAST(1 AS BIGINT))),
        |  s -> s.bl)""".stripMargin)
    var labels = a.select(col("nid").as("id"), col("nid").as("lab"))
    var pinnedPrev = labels // identity seed over the pinned adjacency —
    // unpersisting ITS plan is a no-op (different plan from `a`)
    for (_ <- 1 to rounds) {
      val pinned = LoopCache.step(
        a.join(labels, col("nid") === col("id"))
          .select(col("lab"), explode(col("nbrs")).as("dst"))
          .groupBy(col("dst"))
          .agg(sort_array(collect_list(col("lab"))).as("labs"))
          .select(col("dst").as("id"), mode.as("lab")),
        pinnedPrev)
      labels = SqlBridge.reRoot(pinned)
      pinnedPrev = pinned
    }
    LoopCache.finish(labels.select(col("id"), col("lab").as("community")),
      a, pinnedPrev)
    }
  }
}
