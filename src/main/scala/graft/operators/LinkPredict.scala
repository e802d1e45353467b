package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Common-neighbor link prediction — "which non-adjacent node pairs are
  * most likely to connect next" — over an ordered (u < v, unique) edge
  * set, typically the deterministically sparsified graph from
  * [[TriangleCensus.topKNeighborEdges]].
  *
  * Score: the shared-neighbor count (exact integer) plus the neighborhood
  * Jaccard |N(a)∩N(b)| / (|N(a)| + |N(b)| − |N(a)∩N(b)|) — a SINGLE IEEE
  * division of two exact integers, so the score is bit-reproducible
  * across engines (the cross-engine rule every float output here
  * follows). Ranking ties break on the integer pair (common desc, a, b),
  * never on the float.
  *
  * Scale shape: candidate generation is one wedge self-join on the
  * adjacency list — Σ deg² pairs, which the top-k sparsification has
  * already capped at n·k² — followed by an anti join against the edge
  * set (distance-2 pairs only) and two broadcast-sized degree joins. The
  * adjacency anchor is cached for its three uses and released once the
  * top-N result (bounded: N rows) is pinned.
  */
object LinkPredict {

  /** Top-`topN` non-adjacent pairs by common-neighbor count over
    * `orderedEdges(u, v)` (u < v, unique). Returns (a, b,
    * common_neighbors, jaccard), ordered by (common desc, a, b). */
  def topCommonNeighborPairs(orderedEdges: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1, s"topN=$topN must be >= 1")
    val e = orderedEdges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val adjacency = e.select(col("u").as("n"), col("v").as("nb"))
      .union(e.select(col("v").as("n"), col("u").as("nb")))
    val deg = adjacency.groupBy(col("n")).agg(count(lit(1)).as("dg"))
    // wedges through a shared middle vertex; a < b counts each unordered
    // candidate pair exactly once
    val cn = adjacency.as("x").join(adjacency.as("y"),
        col("x.n") === col("y.n") && col("x.nb") < col("y.nb"))
      .groupBy(col("x.nb").as("a"), col("y.nb").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
    // distance-2 only: drop pairs that are already edges
    val cand = cn.join(e, cn("a") === e("u") && cn("b") === e("v"), "left_anti")
    val scored = cand
      .join(deg.select(col("n").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("dg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common_neighbors"),
        (col("common_neighbors").cast("double") /
          (col("da") + col("db") - col("common_neighbors")).cast("double"))
          .as("jaccard"))
    val top = scored
      .orderBy(col("common_neighbors").desc, col("a"), col("b"))
      .limit(topN)
    // cache probe: reuse a prior invocation's pinned top-N
    if (LoopCache.cached(top)) return top
    // the edge set backs the adjacency (twice), the anti join and the
    // degrees — pin both anchors for the single drive, keep only the
    // N-row final
    e.persist(StorageLevel.MEMORY_AND_DISK)
    adjacency.persist(StorageLevel.MEMORY_AND_DISK)
    LoopCache.finish(top, e, adjacency)
  }

  /** [[topCommonNeighborPairs]] served from a STAGED adjacency layout
    * (id, sorted nbrs array) + the ordered edge set: candidate pairs come
    * from a codegen'd per-row C(deg,2) expansion
    * (functions/Combinations2) instead of the wedge self-join — the same
    * Σ C(deg,2) candidates, but the adjacency streams once with no join
    * build side, and degrees are `size(nbrs)` (no aggregate). Identical
    * scores/order. */
  def topCommonNeighborPairsAdj(adj: DataFrame, orderedEdges: DataFrame,
      topN: Int): DataFrame = {
    require(topN >= 1, s"topN=$topN must be >= 1")
    val a = adj.select(col("id").cast("long").as("n"),
      col("nbrs").cast("array<long>").as("nbrs"))
    val e = orderedEdges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val deg = a.select(col("n"), size(col("nbrs")).cast("long").as("dg"))
    val cn = a.select(explode(
        graft.functions.Combinations2Expression.combinations2(col("nbrs"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
    val cand = cn.join(e, cn("a") === e("u") && cn("b") === e("v"), "left_anti")
    val scored = cand
      .join(deg.select(col("n").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("dg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common_neighbors"),
        (col("common_neighbors").cast("double") /
          (col("da") + col("db") - col("common_neighbors")).cast("double"))
          .as("jaccard"))
    val top = scored
      .orderBy(col("common_neighbors").desc, col("a"), col("b"))
      .limit(topN)
    if (LoopCache.cached(top)) return top
    LoopCache.finish(top)
  }
}
