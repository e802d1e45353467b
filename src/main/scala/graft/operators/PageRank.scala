package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.SqlBridge

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
  * BIGINT in the worst case — `nodes·initTokens·dampNum < 2^63`. By
  * default ([[AutoTokens]]) the token scale is DERIVED from the
  * mass-holding node count via [[autoInitTokens]]: full 10^12 resolution
  * up to ~108k nodes, scaled down beyond that so the bound always holds
  * (ranks only need relative resolution). The same pure-integer
  * derivation is replayed inside the oracle SQL, so auto-scaling stays
  * cross-engine exact at any data size. Explicit `initTokens` requests
  * are still validated and rejected loudly if they could wrap.
  *
  * Scale shape: the edge table is joined on `src` every iteration, so it
  * is hash-partitioned once and cached — per iteration only the rank
  * table (one row per NODE, not per edge) re-shuffles, and the per-target
  * token sum combines map-side. Five iterations = five node-sized
  * shuffles over a stationary edge layout; that is the standard Pregel
  * cost model, with none of its float nondeterminism.
  *
  * Staleness contract (all variants, round 16): results are memoized for
  * the session by canonicalized input plan + parameters
  * ([[LoopCache.memo]]), so a second call on an IDENTICAL-LOOKING source
  * plan returns the first call's result even if the files behind it
  * changed mid-session. That is the engine-wide memo design (caches are
  * cost model, never correctness-of-freshness); harnesses that mutate
  * inputs between calls must run [[LoopCache.clearMemo]] — Verify, Bench
  * and TimeQueries all do.
  */
object PageRank {

  /** Sentinel default for `initTokens`: derive the token scale from the
    * graph size via [[autoInitTokens]] instead of a fixed constant. */
  val AutoTokens: Long = -1L

  /** Default resolution cap: 10^12 tokens per node. Graphs under ~108k
    * mass-holding nodes (at damping 85/100) run at full cap; larger
    * graphs scale the tokens down so the overflow bound always holds. */
  val TokenCap: Long = 1000000000000L

  /** The largest per-node token grant that (a) is an exact multiple of
    * `dampDen` (so the teleport share is an exact integer) and (b) cannot
    * overflow BIGINT even if a perfect hub collected the entire mass:
    * `massNodes · init · dampNum ≤ 2^63−1`. Capped at [[TokenCap]] so
    * small graphs keep full resolution — and so the auto default changes
    * nothing for graphs that fit the cap. Pure integer arithmetic: any
    * other engine replays it exactly (`//` division in the DuckDB
    * oracle, QueriesGraph.copurchasePagerankSql). */
  def autoInitTokens(massNodes: Long, dampNum: Long = 85L,
      dampDen: Long = 100L, cap: Long = TokenCap): Long = {
    val n = math.max(massNodes, 1L)
    val maxInit = Long.MaxValue / math.max(dampNum, 1L) / n
    val scaled = (maxInit / dampDen) * dampDen
    require(scaled > 0,
      s"graph too large for exact token PageRank: $n mass-holding nodes " +
        s"leaves no BIGINT headroom at damping $dampNum/$dampDen")
    math.min(cap, scaled)
  }

  /** Shared prep: validated parameters + the cached, src-partitioned
    * (src, dst, outdeg) table. */
  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampNum: Long, dampDen: Long): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    // a precomputed `outdeg` column (the staged degree artifact —
    // Tables.copurchaseEdgesWithDeg) skips the per-query degree
    // aggregate+join: at the 100 TB design point degrees are derived
    // once WITH the edge list, not re-shuffled per query (VERDICT r11 #1)
    val withDeg =
      if (edges.columns.contains("outdeg"))
        edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"),
          col("outdeg").cast("long").as("outdeg"))
      else {
        val e = edges.select(
          col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
        e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      }
    // stationary per-iteration operand: edges + out-degree, partitioned
    // by src ONCE and cached — iterations re-shuffle only the rank table
    withDeg
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Resolve the token scale: auto-derive from the mass-holding node
    * count ([[AutoTokens]]), or validate an explicit request — worst-case
    * rank ≈ `massNodes·initTokens`, multiplied by dampNum inside the
    * iteration, must fit BIGINT. The count costs one pass over the cached
    * edge table, which doubles as the cache materialization the first
    * round would pay anyway. Returns (initTokens, teleport share). */
  private def resolveTokens(initTokens: Long, dampNum: Long, dampDen: Long,
      massNodes: => Long): (Long, Long) = {
    val n = math.max(massNodes, 1L)
    val tokens =
      if (initTokens == AutoTokens) autoInitTokens(n, dampNum, dampDen)
      else {
        require(initTokens > 0 && initTokens % dampDen == 0,
          s"initTokens=$initTokens must be a positive multiple of " +
            s"dampDen=$dampDen so the teleport share is an exact integer " +
            "(pick e.g. 10^12, or leave the AutoTokens default)")
        require(n <= Long.MaxValue / math.max(dampNum, 1L) / initTokens,
          s"$n mass-holding nodes x initTokens=$initTokens x dampNum=$dampNum " +
            "could overflow BIGINT at a perfect hub - use a smaller initTokens " +
            "(ranks only need relative resolution) or the AutoTokens default")
        initTokens
      }
    (tokens, (tokens / dampDen) * (dampDen - dampNum))
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
      iterations: Int = 5, initTokens: Long = AutoTokens,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    // DEEP-ROUNDS SAFE (round 15): iterations is caller-supplied, so like
    // BFS/k-core each round is pinned AND re-rooted — the SQL plan never
    // nests across rounds, killing the superlinear Catalyst planning cost
    // the KCoreDepthProbe measured past ~10 rounds in this plan shape.
    // Warm re-invocations return the memoized final (zero jobs); all
    // persists live INSIDE the memo build so a hit re-pins nothing.
    LoopCache.memo(Seq("pagerank", LoopCache.planKey(edges), srcCol, dstCol,
        iterations, initTokens, dampNum, dampDen)) {
      val withDeg = prepare(edges, srcCol, dstCol, iterations, dampNum, dampDen)
      // the node count feeds the token scale, i.e. PLAN construction — a
      // pinned 1-row aggregate (LoopCache.pinnedRow) so only the first
      // invocation pays the pass (which doubles as the edge-cache
      // materialization)
      val (initTok, teleport) = resolveTokens(initTokens, dampNum, dampDen,
        LoopCache.pinnedRow(
          withDeg.select(col("src")).union(withDeg.select(col("dst")))
            .distinct().agg(count(lit(1)))).getLong(0))
      // The rank table stays SPARSE: it only carries nodes with in-edges.
      // A node absent from it has a known rank — `initTokens` before the
      // first round, exactly `teleport` afterwards (no in-edges ⟹ nothing
      // but the teleport share) — so a coalesce default replaces the dense
      // per-iteration node join, halving the stages per round: one edge⋈rank
      // join + one token sum, nothing else.
      var ranks: Option[DataFrame] = None
      var pinnedPrev = edges.sparkSession.emptyDataFrame // round 0: no-op release
      var default = initTok
      for (_ <- 1 to iterations) {
        val withRank = ranks match {
          case None => withDeg.withColumn("r", lit(initTok)) // round 1: uniform
          case Some(rk) => withDeg.join(rk, col("src") === col("id"), "left")
            .withColumn("r", coalesce(col("r"), lit(default)))
        }
        val contrib = contribution(withRank, dampNum, dampDen)
        val pinned = LoopCache.step(
          contrib.select(col("dst").as("id"),
            (lit(teleport) + col("contrib")).as("r")),
          pinnedPrev)
        ranks = Some(SqlBridge.reRoot(pinned))
        pinnedPrev = pinned
        default = teleport
      }
      // densify once at the end: sources ∪ targets, teleport-only fill —
      // then pin the result and release the edge + last-round anchors
      val nodes = withDeg.select(col("src").as("id"))
        .union(withDeg.select(col("dst").as("id"))).distinct()
      LoopCache.finish(
        nodes.join(ranks.get, Seq("id"), "left")
          .select(col("id"), coalesce(col("r"), lit(teleport)).as("rank_tokens")),
        withDeg, pinnedPrev)
    }
  }

  /** [[fixedPoint]] over a staged ADJACENCY layout (src, outdeg, dsts) +
    * node table: identical token arithmetic — each edge still carries
    * `(r·dampNum) div (dampDen·outdeg)` — but the per-round operand is
    * node-sized (one row per source, destinations packed in an array),
    * so the join probes |nodes| rows and the edge volume only appears
    * inside a codegen'd explode feeding the partial aggregate. Per-row
    * engine overhead (cache scan, UnsafeRow hashing) was the dominant
    * per-round cost of the edge-layout loop; this is the GraphX-style
    * edge-partition answer, expressed declaratively. */
  def fixedPointAdj(adj: DataFrame, nodes: DataFrame, iterations: Int = 5,
      initTokens: Long = AutoTokens,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    // DEEP-ROUNDS SAFE (round 16): caller-supplied round count, so each
    // round is pinned AND re-rooted like fixedPoint — the SQL plan never
    // nests across rounds (the KCoreDepthProbe planning cliff); warm
    // re-invocations return the memoized final. Same staleness contract
    // as every memoized operator: see the object scaladoc.
    LoopCache.memo(Seq("pagerankAdj", LoopCache.planKey(adj),
        LoopCache.planKey(nodes), iterations, initTokens, dampNum, dampDen)) {
      val a0 = adj.select(col("src").cast("long").as("src"),
        col("outdeg").cast("long").as("outdeg"),
        col("dsts").cast("array<long>").as("dsts"))
      // loop exchange width from the EDGE volume (one pinned node-sized
      // pass); rounds execute at that width with static plans — see
      // LoopCache.loopSession for why adaptive re-planning is the wrong
      // default inside a fixed-shape loop
      val w = LoopCache.loopWidth(adj.sparkSession, LoopCache.pinnedRow(
        a0.agg(coalesce(sum(col("outdeg")), lit(0L)))).getLong(0))
      val Seq(aT, nodesT) = LoopCache.tunedInputs(w, a0,
        nodes.select(col("id").cast("long").as("id")))
      // stationary operand: hash-partitioned by the per-round join key and
      // sorted, so every round's rank join needs NO exchange and NO sort on
      // the adjacency side — only the node-sized rank table moves
      val a = aT.repartition(w, col("src")).sortWithinPartitions("src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodeIds = nodesT
      val (initTok, teleport) = resolveTokens(initTokens, dampNum, dampDen,
        LoopCache.pinnedRow(nodeIds.agg(count(lit(1)))).getLong(0))
      var ranks: Option[DataFrame] = None
      var pinnedPrev = adj.sparkSession.emptyDataFrame // round 0: no-op release
      var default = initTok
      for (_ <- 1 to iterations) {
        val withRank = ranks match {
          case None => a.withColumn("r", lit(initTok))
          case Some(rk) => a.join(rk, col("src") === col("id"), "left")
            .withColumn("r", coalesce(col("r"), lit(default)))
        }
        // the per-edge token value is constant across a source's fanout,
        // so it is computed ONCE per source row, before the explode
        val contrib = withRank
          .select(expr(s"(r * ${dampNum}L) div (${dampDen}L * outdeg)").as("c"),
            explode(col("dsts")).as("dst"))
          .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
        val pinned = LoopCache.step(
          contrib.select(col("dst").as("id"),
            (lit(teleport) + col("contrib")).as("r")),
          pinnedPrev)
        ranks = Some(SqlBridge.reRoot(pinned))
        pinnedPrev = pinned
        default = teleport
      }
      LoopCache.finish(
        nodeIds.join(ranks.get, Seq("id"), "left")
          .select(col("id"), coalesce(col("r"), lit(teleport)).as("rank_tokens")),
        a, pinnedPrev)
    }
  }

  /** [[personalized]] over the staged adjacency layout — same arithmetic,
    * node-sized rounds (see [[fixedPointAdj]]). */
  def personalizedAdj(adj: DataFrame, seeds: DataFrame, seedCol: String,
      iterations: Int = 5, initTokens: Long = AutoTokens,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    // DEEP-ROUNDS SAFE (round 16): memo + per-round pin/reRoot, exactly
    // the fixedPointAdj shape above.
    LoopCache.memo(Seq("pprAdj", LoopCache.planKey(adj),
        LoopCache.planKey(seeds), seedCol, iterations, initTokens,
        dampNum, dampDen)) {
      val a0 = adj.select(col("src").cast("long").as("src"),
        col("outdeg").cast("long").as("outdeg"),
        col("dsts").cast("array<long>").as("dsts"))
      // same loop tuning as fixedPointAdj: edge-volume-derived width,
      // static plans, src-partitioned stationary operand
      val w = LoopCache.loopWidth(adj.sparkSession, LoopCache.pinnedRow(
        a0.agg(coalesce(sum(col("outdeg")), lit(0L)))).getLong(0))
      val Seq(aT, seedsT) = LoopCache.tunedInputs(w, a0,
        seeds.select(col(seedCol).cast("long").as("id")))
      val a = aT.repartition(w, col("src")).sortWithinPartitions("src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // seeds are STATIONARY like the adjacency: partitioned on the id key
      // once, so the per-round teleport re-entry join needs no exchange
      val seedIds = seedsT.distinct()
        .repartition(w, col("id")).sortWithinPartitions("id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (initTok, teleport) = resolveTokens(initTokens, dampNum, dampDen,
        LoopCache.pinnedRow(seedIds.agg(count(lit(1)))).getLong(0))
      var ranks = seedIds.select(col("id"), lit(initTok).as("r"))
      var pinnedPrev = ranks // seed projection, never persisted: no-op release
      for (_ <- 1 to iterations) {
        val contrib = a.join(ranks, col("src") === col("id"))
          .select(expr(s"(r * ${dampNum}L) div (${dampDen}L * outdeg)").as("c"),
            explode(col("dsts")).as("dst"))
          .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
        // teleport re-entry: propagated mass ⟗ seed rows. The old
        // union+re-sum re-exchanged the node-sized rank table every round;
        // the full-outer join runs exchange-free — contrib leaves its
        // aggregate hash-partitioned on the id and the seed side is the
        // pinned stationary layout above. Same sums, exactly.
        val pinned = LoopCache.step(
          contrib.select(col("dst").as("id"), col("contrib").as("r"))
            .join(seedIds.withColumn("t", lit(true)), Seq("id"), "full_outer")
            .select(col("id"), (coalesce(col("r"), lit(0L)) +
              when(col("t").isNotNull, lit(teleport)).otherwise(lit(0L))).as("r")),
          pinnedPrev)
        ranks = SqlBridge.reRoot(pinned)
        pinnedPrev = pinned
      }
      LoopCache.finish(
        ranks.select(col("id"), col("r").as("rank_tokens")), a, seedIds,
        pinnedPrev)
    }
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
      iterations: Int = 5, initTokens: Long = AutoTokens,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    // DEEP-ROUNDS SAFE (round 16): memo + per-round pin/reRoot, the
    // fixedPoint shape (caller-supplied round count → plans never nest).
    LoopCache.memo(Seq("ppr", LoopCache.planKey(edges), srcCol, dstCol,
        LoopCache.planKey(seeds), seedCol, iterations, initTokens,
        dampNum, dampDen)) {
      val withDeg = prepare(edges, srcCol, dstCol, iterations, dampNum, dampDen)
      val seedIds = seeds.select(col(seedCol).cast("long").as("id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // total mass is seeds·initTokens, so the token scale derives from the
      // SEED count, not the node count (mirrored by the q110 oracle SQL);
      // pinned 1-row aggregate — same warm-path rationale as fixedPoint
      val (initTok, teleport) = resolveTokens(initTokens, dampNum, dampDen,
        LoopCache.pinnedRow(seedIds.agg(count(lit(1)))).getLong(0))

      // ranks stay sparse: nodes holding mass only. Round 1: seeds at
      // initTokens. Each round: propagate, then re-add the seed teleport.
      var ranks = seedIds.select(col("id"), lit(initTok).as("r"))
      var pinnedPrev = ranks // seed projection, never persisted: no-op release
      for (_ <- 1 to iterations) {
        val withRank = withDeg.join(ranks, col("src") === col("id"))
        val contrib = contribution(withRank, dampNum, dampDen)
        // propagated mass ∪ seed teleport rows, re-summed on the id key the
        // contrib aggregate already established (co-partitioned, tiny)
        val pinned = LoopCache.step(
          contrib.select(col("dst").as("id"), col("contrib").as("r"))
            .unionByName(seedIds.select(col("id"), lit(teleport).as("r")))
            .groupBy(col("id")).agg(sum(col("r")).as("r")),
          pinnedPrev)
        ranks = SqlBridge.reRoot(pinned)
        pinnedPrev = pinned
      }
      LoopCache.finish(
        ranks.select(col("id"), col("r").as("rank_tokens")), withDeg, seedIds,
        pinnedPrev)
    }
  }
}
