package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the final step of
  * near-duplicate dedup: LSH/jaccard emit PAIRS, but a duplicate "cluster"
  * is the transitive closure (a~b, b~c ⇒ {a,b,c} keep one representative).
  *
  * Algorithm: iterated min-label propagation — each node adopts the
  * smallest component label in its neighborhood (including itself) until a
  * fixed point. Each iteration is two hash-shuffles (join on node, min-agg
  * on label); iterations needed = graph diameter in label-hops, which for
  * dedup graphs (dense near-clique clusters) is small. Convergence is
  * checked with an aggregate, and each round's SQL plan is re-rooted on
  * its pinned RDD (SqlBridge.reRoot — RDD lineage KEPT, so evicted
  * blocks recompute instead of failing) so 100-iteration worst cases
  * don't build mile-long plans. (The alternating large-star/small-star refinement halves rounds
  * on pathological chains; dedup clusters don't need it.)
  */
object ConnectedComponents {

  /** @param pairs     two LongType columns `srcCol`/`dstCol`, undirected
    * @param distinctPairs  set true when `pairs` is already duplicate-free
    *                  (e.g. [[Dedup.lshCandidatePairs]] output): min-label
    *                  propagation is duplicate-insensitive, so the edge
    *                  `distinct()` shuffle only trims join width — skip it
    *                  when the producer already paid for it
    * @param smallGraphEdges  size-adaptive cutover, same logic as a
    *                  broadcast-join threshold: at or below this many
    *                  directed edges the whole graph is collected and
    *                  solved with driver-side union-find (exact same
    *                  labels, milliseconds instead of one Spark job per
    *                  label-hop); above it, distributed min-label
    *                  iteration. The default (256k directed edges ≈ 4 MB
    *                  collected + boxed-map overhead) is sized like a
    *                  broadcast threshold — safe on any driver heap;
    *                  raise it deliberately if your driver is sized for
    *                  more. The edge count is read from the already-
    *                  materialized edge cache, so the probe adds no
    *                  extra pass.
    * @return (node: long, component: long) — component = min node id in
    *         the node's connected component; isolated nodes absent from
    *         `pairs` are (by definition) their own component and are not
    *         emitted. */
  def components(
      pairs: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20, distinctPairs: Boolean = false,
      smallGraphEdges: Long = 1L << 18): DataFrame = {
    val undirected0 = pairs
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(pairs.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
    // loop-tuned rounds above the union-find threshold (the cluster
    // path): width from the UNDIRECTED union's volume — 2x the directed
    // pair count, intentionally, because both orientations are what
    // every round actually joins and aggregates (one pinned pass over
    // the pair table — dedup-pipeline pair tables are candidate-sized,
    // not corpus-sized), static plans — the same LoopCache.loopSession
    // rationale as the other iterative operators. The edge repartition
    // below inherits the tuned width from the session conf.
    val undirected = LoopCache.tunedInputs(
      LoopCache.loopWidth(pairs.sparkSession,
        LoopCache.pinnedRow(undirected0.agg(count(lit(1)))).getLong(0)),
      undirected0).head
    // pre-partition on the iteration join key: the per-iteration
    // labels-join probes edges on `b`, so the cached side keeps
    // hashpartitioning(b) and only the (smaller) label side shuffles
    val edges = (if (distinctPairs) undirected else undirected.distinct())
      .repartition(col("b"))
      .cache()
    if (edges.count() <= smallGraphEdges) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      edges.unpersist(false)
      return LoopCache.untuned(
        spark.createDataset(unionFindMinLabels(es).toSeq)
          .toDF("node", "comp"))
    }
    // convergence probe: per-node labels only ever DECREASE under min-label
    // propagation, so the label vector changed iff its exact sum changed —
    // one decimal-exact agg over already-pinned data replaces a
    // join+filter+count job per iteration (decimal(38,0): no int64 overflow
    // even at 10^12 nodes x 10^18 max id, no float rounding)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0)
    // Pin (lazily) + re-root each round: the labelSum probe right after
    // the persist mark is the action that materializes it — one job per
    // iteration — and SqlBridge.reRoot truncates the SQL-plan nesting
    // exactly like the localCheckpoint this replaced, WITHOUT cutting
    // RDD lineage. localCheckpoint trades lineage for speed: an executor
    // losing its blocks makes every later read FAIL (round 13,
    // ResilienceSpec) — the one operator in the iterative family whose
    // caches were correctness, not cost model. reRoot'd rounds recompute
    // evicted blocks through the original plan like every other loop.
    // The superseded round is released once its successor is forced
    // (the LoopCache.step discipline, inlined to keep the probe as the
    // single forcing job).
    def pinRooted(df: DataFrame, prev: DataFrame): (DataFrame, java.math.BigDecimal) = {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s = labelSum(df) // forces + materializes the pin
      prev.unpersist(blocking = false)
      (org.apache.spark.sql.graftbridge.SqlBridge.reRoot(df), s)
    }
    var pinnedPrev = edges.limit(0) // never persisted: round-0 no-op release
    var (labels, prevSum) = {
      val init = edges.groupBy(col("a").as("node"))
        .agg(min(col("b")).as("nmin"))
        .select(col("node"), least(col("node"), col("nmin")).as("comp"))
      pinnedPrev = init
      pinRooted(init, edges.limit(0))
    }
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // propagate: node's new label = min over neighbors' labels and its own
      val neighborLabels = edges
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("comp"))
      val next = labels.union(neighborLabels)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
      val (rooted, newSum) = pinRooted(next, pinnedPrev)
      pinnedPrev = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      labels = rooted
      iter += 1
    }
    edges.unpersist(false)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations iterations " +
          "(graph label-hop diameter exceeds the budget); raise maxIterations — " +
          "returning partial labels would silently under-merge clusters")
    LoopCache.untuned(labels)
  }

  /** Driver-side union-find with path compression over a collected edge
    * list; labels = min node id per component (identical to the
    * distributed fixed point). O(E α(E)) — microseconds at the
    * small-graph threshold. */
  private def unionFindMinLabels(
      edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root)
        root = parent.getOrElse(root, root)
      var cur = x // path compression
      while (parent.getOrElse(cur, cur) != root) {
        val next = parent.getOrElse(cur, cur); parent(cur) = root; cur = next
      }
      root
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // second pass: every touched node labeled with its root (= min id,
    // because unions always point the larger root at the smaller)
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  /** Dedup decision table from near-dup pairs: every node mapped to the
    * cluster representative (min id); `keep = node == representative`.
    * LSH candidate pairs are already distinct → edge dedup skipped. */
  def dedupClusters(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    components(pairs, srcCol, dstCol, distinctPairs = true)
      .select(col("node").as("id"), col("comp").as("representative"),
        (col("node") === col("comp")).as("keep"))
}
