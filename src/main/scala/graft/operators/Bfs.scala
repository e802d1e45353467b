package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round distributed BFS — hop distances from a seed set, the
  * reachability/distance member of the iterative-graph family
  * ([[PageRank]]: mass, [[LabelPropagation]]: communities, this:
  * distance). Integer levels with a min-aggregate per round: exact,
  * order-invariant, replayable by unrolled CTEs.
  *
  * Per round: one edge⋈frontier join against the cached pre-partitioned
  * edge table and one (id, min level) aggregate — the level table holds
  * REACHED nodes only, so early rounds shuffle frontier-sized data, and
  * an unreached node simply never appears (no dense node table). Rounds
  * are fixed (k-hop neighborhood semantics), not run-to-convergence:
  * the caller picks the radius, the cost model stays predictable. */
object Bfs {

  /** Hop levels from `seeds` within `rounds` hops over DIRECTED edges
    * (pass both orientations for undirected semantics). Returns
    * (id, level) for reached nodes; seeds are level 0 even when also
    * reachable by a longer path (min wins). */
  def levels(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
    def loop(step: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      var lv = seeds.select(col(seedCol).cast("long").as("id")).distinct()
        .select(col("id"), lit(0L).as("level"))
      for (_ <- 1 to rounds) {
        val next = e.join(lv, col("src") === col("id"))
          .select(col("dst").as("id"), (col("level") + 1L).as("level"))
        lv = step(
          lv.unionByName(next)
            .groupBy(col("id")).agg(min(col("level")).as("level")),
          lv)
      }
      lv
    }
    // cache probe: a prior invocation pinned this exact final plan —
    // reuse it instead of re-driving the rounds (the plan-only loop is
    // cheap to build; nothing executes on a probe hit)
    val probe = loop((next, _) => next)
    if (LoopCache.cached(probe)) return probe
    // PIN each round, RELEASE the previous (LoopCache.step): the level
    // table is referenced twice per round (kept side of the union + the
    // next frontier join), so an uncached formulation doubles the plan
    // tree every round — 2^rounds re-executions (measured: 48 s for 3
    // rounds at sf0.1, 2 s cached) — while keeping every superseded
    // round pinned leaks N tables per invocation. One (id, level) row
    // per REACHED node.
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = loop(LoopCache.step)
    e.unpersist(blocking = false) // final lv is materialized; edges done
    out
  }

  /** [[levels]] over a STAGED adjacency layout (id, sorted nbrs array):
    * per round the frontier joins the node-sized adjacency and the edge
    * fanout happens inside a codegen'd explode — no edge-row cache scan
    * per round (see PageRank.fixedPointAdj for the cost argument). */
  def levelsAdj(adj: DataFrame, seeds: DataFrame, seedCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val a0 = adj.select(col("id").cast("long").as("src"),
      col("nbrs").cast("array<long>").as("nbrs"))
    // loop-tuned width + static rounds over a src-partitioned stationary
    // operand (see LoopCache.loopSession)
    val w = LoopCache.loopWidth(adj.sparkSession, LoopCache.pinnedRow(
      a0.agg(coalesce(sum(size(col("nbrs")).cast("long")), lit(0L))))
      .getLong(0))
    val Seq(aT, seedsT) = LoopCache.tunedInputs(w, a0, seeds)
    val a = aT.repartition(w, col("src")).sortWithinPartitions("src")
    def loop(step: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      var lv = seedsT.select(col(seedCol).cast("long").as("id")).distinct()
        .select(col("id"), lit(0L).as("level"))
      for (_ <- 1 to rounds) {
        val next = a.join(lv, col("src") === col("id"))
          .select((col("level") + 1L).as("level"),
            explode(col("nbrs")).as("id"))
          .select(col("id"), col("level"))
        lv = step(
          lv.unionByName(next)
            .groupBy(col("id")).agg(min(col("level")).as("level")),
          lv)
      }
      lv
    }
    val probe = loop((next, _) => next)
    if (LoopCache.cached(probe)) return LoopCache.untuned(probe)
    a.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = loop(LoopCache.step)
    a.unpersist(blocking = false)
    // hand back a parent-session frame: the tuned width/AQE-off conf is
    // for the rounds only, not the caller's downstream plan
    LoopCache.untuned(out)
  }
}
