package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DistinctSketch, KCore}

/** Wave-6 operators: k-core peeling and the engine-exact distinct-count
  * registers. The k-core fixture is built so the CASCADE fires — a node
  * that survives round 1 must die in round 2 — because that is what
  * distinguishes k-core from a one-shot degree filter. */
class Wave6Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Symmetric edge table from undirected pairs. */
  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("k-core peeling cascades: pendant chain dies round by round") {
    // 4-clique {1,2,3,4} + chain 4–5–6. At k=2: node 6 (degree 1) peels
    // in round 1; node 5 keeps degree 2 in round 1 but drops to 1 once 6
    // is gone, so it peels in round 2 — the cascade. The clique (degree
    // 3 inside itself) is the stable 2-core.
    val edges = sym((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = KCore.survivors(edges, "src", "dst", k = 2L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one round is NOT enough: node 5 is still present after round 1
    val oneRound = KCore.survivors(edges, "src", "dst", k = 2L, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("k-core keeps O(1) cache entries and reuses the pinned final") {
    val sc = spark.sparkContext
    val edges = sym((for (a <- 1L to 20L; b <- a + 1 to 20L
      if a % 5 == b % 5 || b == a + 1) yield (a, b)): _*)
    val before = sc.getPersistentRDDs.size
    KCore.survivors(edges, "src", "dst", k = 3L, rounds = 4).count()
    // TWO deliberate entries: the pinned final + the 1-row edge-count
    // aggregate (LoopCache.pinnedRow feeding loopWidth — cached so warm
    // re-invocations skip the volume pass)
    assert(sc.getPersistentRDDs.size - before <= 2,
      "KCore leaked per-round tables or its edge anchor")
    // second invocation probes the pinned final: no new cache entries
    val after = sc.getPersistentRDDs.size
    KCore.survivors(edges, "src", "dst", k = 3L, rounds = 4).count()
    assert(sc.getPersistentRDDs.size == after, "probe missed the cache")
  }

  test("distinct registers: bounded state, accurate estimate, dup-proof") {
    val keys = (1L to 5000L).map(i => ("g", i * 977L)).toDF("g", "k")
    val regs = DistinctSketch.registers(keys, Seq("g"), "k")
    val rows = regs.collect()
    assert(rows.length <= DistinctSketch.M) // ≤ 256 rows whatever the keys
    assert(rows.forall { r =>
      val reg = r.getInt(1); val rho = r.getInt(2)
      reg >= 0 && reg < 256 && rho >= 1 && rho <= 53
    })
    val Array(s) = DistinctSketch.summary(regs, Seq("g")).collect()
    val est = DistinctSketch.estimate(s.getLong(1), s.getLong(2))
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"estimate $est")
    // idempotent: tripling every key changes nothing (max is dup-proof)
    val tripled = keys.union(keys).union(keys)
    val s2 = DistinctSketch.summary(
      DistinctSketch.registers(tripled, Seq("g"), "k"), Seq("g")).collect()
    assert(s2.head.getLong(1) == s.getLong(1) &&
      s2.head.getLong(2) == s.getLong(2))
  }

  test("link prediction: hand-scored square + pendant, edges excluded") {
    // square 1-2-3-4-1 with pendant 4-5. Non-adjacent distance-2 pairs:
    // (1,3) via {2,4}: jaccard 2/(2+2-2) = 1.0; (2,4) via {1,3}: deg(4)=3
    // (pendant), so 2/(2+3-2) = 2/3; (1,5) and (3,5) via {4}: deg(5)=1,
    // so 1/(2+1-1) = 0.5. Adjacent pairs must not appear.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = operators.LinkPredict.topCommonNeighborPairs(edges, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      (1L, 3L) -> (2L, 1.0), (2L, 4L) -> (2L, 2.0 / 3.0),
      (1L, 5L) -> (1L, 0.5), (3L, 5L) -> (1L, 0.5)))
  }

  test("link prediction: ids past 2^31 take the struct path, same scores") {
    // the same square+pendant graph shifted by 2^33 — max id exceeds the
    // packed-pair bound, so the operator must route through the struct
    // fallback and still produce the identical (shifted) scores
    val off = 1L << 33
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L))
      .map { case (u, v) => (u + off, v + off) }.toDF("u", "v")
    val got = operators.LinkPredict.topCommonNeighborPairs(edges, topN = 10)
      .collect().map(r => (r.getLong(0) - off, r.getLong(1) - off) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      (1L, 3L) -> (2L, 1.0), (2L, 4L) -> (2L, 2.0 / 3.0),
      (1L, 5L) -> (1L, 0.5), (3L, 5L) -> (1L, 0.5)))
  }

  test("fuzzy match: typo pairs verified, block-key edits missed by design") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"), // 3 edits vs 1
      (3L, "teh quick brown fox jumps over the lazy dog tonight"), // typo IN block key
      (4L, "completely different text with nothing in common here"),
      (5L, "the quick brOWN   fox jumps over the lazy dog tonight") // normalizes to 1
    ).toDF("doc_id", "text")
    val got = operators.FuzzyMatch
      .blockedPairs(docs, "doc_id", "text", blockLen = 12, prefixLen = 64,
        maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // 1↔2: dog→cat = 3 substitutions; 1↔5 normalize identical = 0; 2↔5 =
    // 3. Doc 3 shares no block with anyone (its typo sits inside the
    // block key — the documented blocking recall trade); 4 matches
    // nothing.
    assert(got == Map((1L, 2L) -> 3, (1L, 5L) -> 0, (2L, 5L) -> 3))

    // the shifted-key second pass recovers exactly the key-region-typo
    // pairs the single pass documents as missed: doc 3's "teh" sits in
    // the chars-1..12 key, but chars 13..24 ("own fox jump") still
    // agree, so the shift=12 pass blocks it with docs 1/2/5 and the
    // full-window verify reports the true distances (teh→the = 2; +3
    // for the dog→cat doc). All single-pass pairs survive unchanged.
    val multi = operators.FuzzyMatch
      .multiPassPairs(docs, "doc_id", "text", blockLen = 12,
        prefixLen = 64, maxDist = 5, shiftsOpt = Seq(0, 12))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(multi == got ++ Map(
      (1L, 3L) -> 2, (2L, 3L) -> 5, (3L, 5L) -> 2), multi.toString)
  }

  test("fuzzy match: triangle-salted join emits each pair exactly once " +
      "(= unsalted), on a corpus with a planted hot block") {
    // one hot block: 40 docs share the 12-char block key (small edits
    // beyond it), plus distinct-block bystanders. The salted join must
    // produce the identical pair MULTISET as saltGroups=1 (the plain
    // self-join): same keys, same distances, no duplicates, no drops —
    // over buckets where same-salt and cross-salt pairs coexist.
    val hot = (0 until 40).map(i =>
      (100L + i, s"shared block prefix variant number $i padding words"))
    val cold = (0 until 10).map(i =>
      (200L + i, s"unique$i opener text that blocks alone entirely"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    def pairs(g: Int) = operators.FuzzyMatch
      .blockedPairs(docs, "doc_id", "text", blockLen = 12, prefixLen = 64,
        maxDist = 20, saltGroups = g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(p => (p._1, p._2))
    val salted = pairs(8)
    val plain = pairs(1)
    assert(salted.length == plain.length,
      s"salted ${salted.length} pairs vs unsalted ${plain.length}")
    assert(salted.toSeq == plain.toSeq)
    // the hot block really is hot: 40 docs → C(40,2) candidate pairs all
    // within maxDist here, so a dedup/drop bug cannot hide in zero rows
    assert(plain.count(p => p._1 >= 100L && p._2 < 200L) == 40 * 39 / 2)
  }

  test("integer HITS: mutual reinforcement separates roles, replayable") {
    // bipartite: customer 1 buys the 3 popular parts, 4 only part 13.
    // Expected values hand-simulated (3 rounds, divide-first L∞ norm):
    // authority of 13 decays each round because its only buyer is the
    // weakest hub — the mutual reinforcement a degree count can't see.
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 10L), (4L, 13L)).toDF("cust", "part")
    val got = operators.Hits.scores(edges, "cust", "part", rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("auth", 10L) -> 1458332L, ("auth", 11L) -> 1166665L,
      ("auth", 12L) -> 645832L, ("auth", 13L) -> 20833L,
      ("hub", 1L) -> 1090276L, ("hub", 2L) -> 874999L,
      ("hub", 3L) -> 486110L, ("hub", 4L) -> 6944L))
  }

  test("HITS keeps 2 live cache entries; warm re-invocation memo-hits") {
    val sc = spark.sparkContext
    // rounds=6 would OOM the driver under the pre-re-root plan nesting
    // (exponential plan-string rendering) — the depth is the regression
    // being pinned here, on top of the O(1)-entries contract
    val edges = (for (c <- 1L to 12L; p <- 100L to 100L + c % 5)
      yield (c, p)).toDF("cust", "part")
    val before = sc.getPersistentRDDs.size
    operators.Hits.scores(edges, "cust", "part", rounds = 6).count()
    val afterFirst = sc.getPersistentRDDs.size
    // 2 score finals (hub + auth) survive; every superseded round and
    // the raw/edge anchors are released
    assert(afterFirst - before == 2,
      s"expected 2 live entries, got ${afterFirst - before}")
    // warm re-invocation: data-derived divisors make the final plan
    // unbuildable without re-running the loop, so the warm path is the
    // operator memo — same frame back, no new entries
    val again = operators.Hits.scores(edges, "cust", "part", rounds = 6)
    again.count()
    assert(sc.getPersistentRDDs.size == afterFirst)
  }

  test("weighted shortest path: relaxation beats greedy hop, bounded hops") {
    // 1→2 direct costs 10; 1→3→2 costs 2+3=5. Node 4 is 3 hops out
    // (1→3→2→4), so it appears at rounds=3 but not rounds=2 — both the
    // min-plus relaxation and the hop bound are observable.
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L),
      (2L, 4L, 1L)).toDF("s", "d", "w")
    val seeds = Seq(Tuple1(1L)).toDF("n")
    def run(rounds: Int): Map[Long, Long] =
      operators.ShortestPath.distances(edges, "s", "d", "w", seeds, "n",
        rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) == Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 11L))
    assert(run(3) == Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 6L))
  }

  test("shortest path keeps 1 live cache entry; warm memo-hits") {
    val sc = spark.sparkContext
    val edges = (1L to 30L).map(i => (i, i + 1L, i % 7L))
      .toDF("s", "d", "w")
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val before = sc.getPersistentRDDs.size
    // depth 8: far past where un-re-rooted nested round plans blow up
    operators.ShortestPath.distances(edges, "s", "d", "w", seeds, "n",
      rounds = 8).count()
    val afterFirst = sc.getPersistentRDDs.size
    assert(afterFirst - before == 1,
      s"expected 1 live entry, got ${afterFirst - before}")
    operators.ShortestPath.distances(edges, "s", "d", "w", seeds, "n",
      rounds = 8).count()
    assert(sc.getPersistentRDDs.size == afterFirst)
  }

  test("prefix-filter set join: exact pairs, screen is lossless") {
    // docs 1,2: 4/5 shared tokens → J=4/6=66% ≥ 60 (kept, pct 66).
    // docs 1,3: 2 shared of 5+3 → J=2/6=33% (dropped by verify).
    // docs 4,5: identical sets → J=100.
    // doc 6 shares ONLY frequent tokens with 1 → must be screened or
    // verified away without a false positive.
    val docs = Seq(
      (1L, Seq("x", "q", "r", "s", "t")),
      (2L, Seq("x", "q", "r", "s", "u")),
      (3L, Seq("q", "r", "zz", "yy", "ww")),
      (4L, Seq("aa", "bb", "cc")),
      (5L, Seq("cc", "aa", "bb", "aa")), // dup token: distinct first
      (6L, Seq("q", "r"))
    ).toDF("id", "toks")
    val got = operators.PrefixJoin.selfJoin(docs, "id", "toks", 60, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map((1L, 2L) -> ((4L, 6L, 66L)),
      (4L, 5L) -> ((3L, 3L, 100L))))
  }

  test("containment join: directed, asymmetric, boundary-exact") {
    // A ⊂ B: containment(A→B) = 3/3 = 100% kept; the REVERSE direction
    // (B→A) is 3/10 = 30% and must be absent — the asymmetry symmetric
    // Jaccard can't express (J(A,B) = 0.3 here, below any useful bar).
    // C,D identical sets → both directions. E→F sits EXACTLY on the 90%
    // threshold (9 of 10) → kept at cont_pct 90; F→E is 9/12 → dropped;
    // G shares only 8/10 with E and F → dropped every direction.
    val docs = Seq(
      (1L, Seq("a1", "a2", "a3")),
      (2L, Seq("a1", "a2", "a3", "b1", "b2", "b3", "b4", "b5", "b6", "b7")),
      (3L, Seq("c1", "c2", "c3", "c4")),
      (4L, Seq("c4", "c3", "c2", "c1")),
      (5L, Seq("e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8", "e9", "x1")),
      (6L, Seq("e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8", "e9",
        "f1", "f2", "f3")),
      (7L, Seq("e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8", "y1", "y2"))
    ).toDF("id", "toks")
    val got = operators.PrefixJoin.containmentJoin(docs, "id", "toks", 90, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      (1L, 2L) -> ((3L, 3L, 100L)),
      (3L, 4L) -> ((4L, 4L, 100L)),
      (4L, 3L) -> ((4L, 4L, 100L)),
      (5L, 6L) -> ((9L, 10L, 90L))))
  }

  test("sequential patterns: greedy subsequence support, hand-enumerated") {
    // u3 is the greedy-critical witness for (a,b,c): the b@2 occurrence
    // must be chosen over b@5 (after which no c remains) — earliest
    // intermediate always maximizes the remaining window.
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "b", 1L), (2L, "a", 2L), (2L, "b", 3L), (2L, "c", 4L),
      (3L, "a", 1L), (3L, "b", 2L), (3L, "c", 3L), (3L, "b", 5L)
    ).toDF("u", "ty", "ts")
    val got = operators.EventSeq.sequentialSupport(ev, "u", "ts", "ty")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got == Map(
      ("a", "b", "c") -> 3L, ("a", "b", "b") -> 1L, ("a", "c", "b") -> 1L,
      ("b", "c", "b") -> 1L, ("b", "a", "b") -> 1L, ("b", "a", "c") -> 1L,
      ("b", "b", "c") -> 1L))
  }

  test("wave-6 operators tolerate empty/degenerate inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(operators.Hits.scores(noEdges, "s", "d", rounds = 2)
      .count() == 0) // empty graph: null max guarded, divide by 1
    val wEdges = Seq((1L, 2L, 5L)).toDF("s", "d", "w")
    val noSeeds = Seq.empty[Tuple1[Long]].toDF("n")
    assert(operators.ShortestPath
      .distances(wEdges, "s", "d", "w", noSeeds, "n", rounds = 2)
      .count() == 0) // no seeds: nothing reached
    val oneDoc = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    assert(operators.PrefixJoin.selfJoin(oneDoc, "id", "toks", 60, 100)
      .count() == 0) // no pair to form
  }

  test("rolling sketch-merge distinct tracks the exact rolling count") {
    // 30 days; day i has customers 40i .. 40i+600 (heavy window overlap)
    val rows = for (day <- 0 until 30; c <- 0 until 600)
      yield (day.toLong, day.toLong * 40 + c)
    val dc = rows.toDF("day", "cust")
    val dayRegs = operators.DistinctSketch
      .registers(dc, Seq("day"), "cust")
    // window-merge: expand register rows to the ≤7 report days, re-max
    val rolled = dayRegs.withColumn("k", explode(expr("sequence(0, 6)")))
      .select((col("day") + col("k")).as("d"), col("reg"), col("max_rho"))
      .filter(col("d") < 30)
      .groupBy(col("d"), col("reg")).agg(max(col("max_rho")).as("max_rho"))
    val est = operators.DistinctSketch.summary(rolled, Seq("d"))
      .collect().map(r => r.getLong(0) ->
        operators.DistinctSketch.estimate(r.getLong(1), r.getLong(2))).toMap
    // exact trailing-7-day distinct per day, computed directly. At
    // σ ≈ 1.04/√256 ≈ 6.5%, a 30-day series will show ~2σ excursions
    // (measured: one day at 15.7%) — gate each day at 3σ and the mean
    // at ~1.2σ, which a biased or mis-merged sketch cannot meet.
    val byDay = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val errs = (0L until 30L).map { d =>
      val exact = (math.max(0L, d - 6) to d)
        .flatMap(byDay(_)).toSet.size.toDouble
      val err = math.abs(est(d) - exact) / exact
      assert(err <= 0.20,
        s"day $d: estimate ${est(d)} vs exact $exact drifts past 20%")
      err
    }
    assert(errs.sum / errs.size <= 0.08,
      s"mean rolling-sketch error ${errs.sum / errs.size} exceeds 8%")
  }

  test("FW-BW SCC kernel: cycle kept, one-way branches excluded") {
    // 1→2→3→1 is the cycle; 4 is forward-only from 1, 5 backward-only.
    // The q128 kernel: forward ∩ backward reach from the pivot.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 1L))
      .toDF("s", "d")
    val seed = Seq(1L).toDF("id")
    val fwd = operators.Bfs.levels(e, "s", "d", seed, "id", rounds = 3)
    val bwd = operators.Bfs.levels(
      e.select(col("d").as("s"), col("s").as("d")), "s", "d", seed, "id",
      rounds = 3)
    val scc = fwd.as("f").join(bwd.as("b"), col("f.id") === col("b.id"))
      .select(col("f.id"), col("f.level").as("fl"), col("b.level").as("bl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(scc == Map(1L -> ((0L, 0L)), 2L -> ((1L, 2L)), 3L -> ((2L, 1L))))
  }

  test("distinct registers merge across shards exactly") {
    val all = (1L to 3000L).map(i => ("g", i)).toDF("g", "k")
    val shard1 = all.filter(col("k") % 3 =!= 0)
    val shard2 = all.filter(col("k") % 3 === 0 || col("k") < 100)
    val merged = DistinctSketch.merge(Seq("g"),
      DistinctSketch.registers(shard1, Seq("g"), "k"),
      DistinctSketch.registers(shard2, Seq("g"), "k"))
    val whole = DistinctSketch.registers(all, Seq("g"), "k")
    // overlapping shards (keys < 100 in both) still merge to the whole-
    // corpus sketch: union + re-max is idempotent on the overlap.
    // BOTH directions: equal row counts rules out merged ⊂ whole (a
    // register-dropping merge would pass the subset check alone), and
    // union-distinct == whole rules out any differing register value
    assert(merged.count() == whole.count())
    assert(merged.unionByName(whole).distinct().count() == whole.count())
  }
}
