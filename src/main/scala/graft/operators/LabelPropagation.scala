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
    val pairVolume = LoopCache.pinnedRow(
      a0.agg(coalesce(sum(size(col("nbrs")).cast("long")), lit(0L))))
      .getLong(0)
    val w = LoopCache.loopWidth(adj.sparkSession, pairVolume)
    // the PAIR exchange is sized from the pair volume itself, NOT capped
    // at the core count (q120's PairRowsPerTask discipline): each round
    // ships Σ deg raw (lab, dst) rows, and the reduce-side (dst, lab)
    // hash map must stay inside one task's fair execution grant even
    // with the pinned adjacency occupying the storage pool — at the sf10
    // replica the 32-wide reduce held ~1.5M-entry maps per task and
    // spilled ~8 GB per round; ~1M rows per task keeps the map tens of
    // MB and spill-free while extra partitions cost only scheduling.
    val pairW = LoopCache.pairWidth(adj.sparkSession, pairVolume, floor = w)
    val a = LoopCache.tunedInputs(w, a0).head
      .repartition(w, col("nid")).sortWithinPartitions("nid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // most frequent label, ties to the SMALLEST — as the two-level
    // CODEGEN argmax (count per (dst, lab), then max(struct(c, −lab))
    // per dst: the q63 shape the edge-layout rounds use), with the
    // q120 exchange discipline: the explode ships RAW (lab, dst) pairs
    // through one explicit dst-keyed repartition, and BOTH aggregates
    // run post-exchange (hash(dst) satisfies each one's clustering, so
    // neither plans its own shuffle). The r17 form collected each
    // node's neighbor labels into a sorted list and scanned it —
    // partial_collect_list is an OBJECT-mode aggregate whose map-side
    // buffers hold the whole edge volume as deserialized arrays:
    // measured at the sf10 replica, every round's map stage spilled
    // ~2.6 GB against a 330 MB shuffle write (guide §5: heavy spill ⇒
    // different operator). A map-side partial count is no better there
    // (nearly every (dst, lab) pair is distinct before convergence —
    // the hash map outgrows its grant; measured 8 GB spill). Raw pairs
    // compress to a comparable shuffle payload, the reduce-side maps
    // are sized by the loop width, and every operator stays in
    // whole-stage codegen. Same labels, same min-label tie-break.
    var labels = a.select(col("nid").as("id"), col("nid").as("lab"))
    var pinnedPrev = labels // identity seed over the pinned adjacency —
    // unpersisting ITS plan is a no-op (different plan from `a`)
    for (_ <- 1 to rounds) {
      val pinned = LoopCache.step(
        a.join(labels, col("nid") === col("id"))
          .select(col("lab"), explode(col("nbrs")).as("dst"))
          .repartition(pairW, col("dst"))
          .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
          .groupBy(col("dst"))
          .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("best"))
          .select(col("dst").as("id"), (-col("best.nl")).as("lab"))
          // land the round's labels back at loop width w: left at pairW,
          // the next round's rank join would see mismatched partition
          // counts and re-exchange the CACHED ADJACENCY (edge-sized,
          // measured 179 MB/round at the sf10 replica) instead of this
          // node-sized table
          .repartition(w, col("id")),
        pinnedPrev)
      labels = SqlBridge.reRoot(pinned)
      pinnedPrev = pinned
    }
    LoopCache.finish(labels.select(col("id"), col("lab").as("community")),
      a, pinnedPrev)
    }
  }
}
