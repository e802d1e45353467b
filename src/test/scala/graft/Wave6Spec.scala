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
    assert(sc.getPersistentRDDs.size - before <= 1,
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
    // corpus sketch: union + re-max is idempotent on the overlap
    assert(merged.unionByName(whole).distinct().count() == whole.count())
  }
}
