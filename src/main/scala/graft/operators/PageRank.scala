package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point (integer) PageRank — link-graph centrality with BIGINT
  * "rank tokens" instead of float probabilities.
  *
  * Why integers: classic PageRank accumulates `sum(rank/deg)` in doubles,
  * and float addition is not associative — on a cluster the reduction
  * order changes run to run (partial aggregation, AQE re-splits), so two
  * runs of the same job can disagree in the last ulp and a rank-ordered
  * top-k can flip. Scaling ranks to integer tokens makes every iteration
  * exact: BIGINT sums are order-invariant, so the result is
  * bit-reproducible on 1 core or 1000 executors — and replayable by any
  * other engine (graft's DuckDB oracle unrolls the same iterations).
  *
  * Semantics: every node starts with `initTokens`. Per iteration a node
  * keeps the teleport share `initTokens·(1−d)` and each out-edge carries
  * `(r·dampNum) div (dampDen·outdeg)` tokens to its target. Flooring
  * drops a few tokens per edge (deterministically — both engines
  * truncate toward zero) and dangling-node mass is dropped rather than
  * redistributed: redistribution needs a global mass sum every
  * iteration, which reintroduces the float-order problem for no ranking
  * benefit.
  *
  * Overflow bound: a node's rank is bounded by the TOTAL token mass (a
  * perfect hub can receive nearly all of it), so `r·dampNum` must fit a
  * BIGINT in the worst case — `nodes·initTokens·dampNum < 2^63`. The
  * constructor counts nodes (one pass over the cached edge table) and
  * rejects configurations that could wrap; large graphs pick a smaller
  * `initTokens` (ranks only need relative resolution).
  *
  * Scale shape: the edge table is joined on `src` every iteration, so it
  * is hash-partitioned once and cached — per iteration only the rank
  * table (one row per NODE, not per edge) re-shuffles, and the per-target
  * token sum combines map-side. Five iterations = five node-sized
  * shuffles over a stationary edge layout; that is the standard Pregel
  * cost model, with none of its float nondeterminism.
  */
object PageRank {

  /** Shared prep: validated parameters + the cached, src-partitioned
    * (src, dst, outdeg) table and the exact teleport share. */
  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, initTokens: Long, dampNum: Long,
      dampDen: Long): (DataFrame, Long) = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    require(initTokens % dampDen == 0,
      s"initTokens=$initTokens must divide by dampDen=$dampDen so the " +
        "teleport share is an exact integer (pick e.g. 10^12)")
    val e = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // stationary per-iteration operand: edges + out-degree, partitioned
    // by src ONCE and cached — iterations re-shuffle only the rank table
    val withDeg = e.join(deg, "src")
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (withDeg, (initTokens / dampDen) * (dampDen - dampNum))
  }

  /** Reject token scales a perfect hub could overflow: worst-case rank ≈
    * `massNodes·initTokens`, multiplied by dampNum inside the iteration.
    * Costs one count over the (cached) edge table — it doubles as the
    * cache materialization the first round would pay anyway. */
  private def requireNoOverflow(withDeg: DataFrame, initTokens: Long,
      dampNum: Long, massNodes: => Long): Unit = {
    val n = math.max(massNodes, 1L)
    require(n <= Long.MaxValue / math.max(dampNum, 1L) / initTokens,
      s"$n mass-holding nodes x initTokens=$initTokens x dampNum=$dampNum " +
        "could overflow BIGINT at a perfect hub - use a smaller initTokens " +
        "(ranks only need relative resolution)")
  }

  private def contribution(withRank: DataFrame, dampNum: Long,
      dampDen: Long): DataFrame =
    withRank
      .select(col("dst"),
        expr(s"(r * ${dampNum}L) div (${dampDen}L * outdeg)").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))

  /** Run `iterations` exact PageRank steps over `edges(srcCol, dstCol)`
    * (duplicate edges are NOT deduplicated here — pre-`distinct` if the
    * graph is simple). Returns (id, rank_tokens) for every node that
    * appears as a source or a target. */
  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, initTokens: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val (withDeg, teleport) =
      prepare(edges, srcCol, dstCol, iterations, initTokens, dampNum, dampDen)
    requireNoOverflow(withDeg, initTokens, dampNum,
      withDeg.select(col("src")).union(withDeg.select(col("dst")))
        .distinct().count())
    // The rank table stays SPARSE: it only carries nodes with in-edges.
    // A node absent from it has a known rank — `initTokens` before the
    // first round, exactly `teleport` afterwards (no in-edges ⟹ nothing
    // but the teleport share) — so a coalesce default replaces the dense
    // per-iteration node join, halving the stages per round: one edge⋈rank
    // join + one token sum, nothing else.
    var ranks: Option[DataFrame] = None
    var default = initTokens
    for (_ <- 1 to iterations) {
      val withRank = ranks match {
        case None => withDeg.withColumn("r", lit(initTokens)) // round 1: uniform
        case Some(rk) => withDeg.join(rk, col("src") === col("id"), "left")
          .withColumn("r", coalesce(col("r"), lit(default)))
      }
      val contrib = contribution(withRank, dampNum, dampDen)
      ranks = Some(contrib.select(col("dst").as("id"),
        (lit(teleport) + col("contrib")).as("r")))
      default = teleport
    }
    // densify once at the end: sources ∪ targets, teleport-only fill
    val nodes = withDeg.select(col("src").as("id"))
      .union(withDeg.select(col("dst").as("id"))).distinct()
    nodes.join(ranks.get, Seq("id"), "left")
      .select(col("id"), coalesce(col("r"), lit(teleport)).as("rank_tokens"))
  }

  /** PERSONALIZED fixed-point PageRank: teleport mass flows only to the
    * `seeds` node set, so ranks measure proximity to the seeds — the
    * random-walk-with-restart recommender. Same exact-token semantics as
    * [[fixedPoint]] (BIGINT sums, truncating division, dropped sink
    * mass); non-seed nodes start at 0 and hold only propagated mass, so
    * the result is exactly replayable by an external engine. Total mass
    * is seeds·initTokens, so the overflow guard counts seeds, not nodes.
    *
    * Everything keeps [[fixedPoint]]'s shape: stationary cached edges,
    * node-sized shuffles; the seed teleport re-enters through a
    * co-partitioned union+sum. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iterations: Int = 5, initTokens: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val (withDeg, teleport) =
      prepare(edges, srcCol, dstCol, iterations, initTokens, dampNum, dampDen)
    val seedIds = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    requireNoOverflow(withDeg, initTokens, dampNum, seedIds.count())

    // ranks stay sparse: nodes holding mass only. Round 1: seeds at
    // initTokens. Each round: propagate, then re-add the seed teleport.
    var ranks = seedIds.select(col("id"), lit(initTokens).as("r"))
    for (_ <- 1 to iterations) {
      val withRank = withDeg.join(ranks, col("src") === col("id"))
      val contrib = contribution(withRank, dampNum, dampDen)
      // propagated mass ∪ seed teleport rows, re-summed on the id key the
      // contrib aggregate already established (co-partitioned, tiny)
      ranks = contrib.select(col("dst").as("id"), col("contrib").as("r"))
        .unionByName(seedIds.select(col("id"), lit(teleport).as("r")))
        .groupBy(col("id")).agg(sum(col("r")).as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_tokens"))
  }
}
