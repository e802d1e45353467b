package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-space clustering over int8-quantized embedding codes
  * ([[Quantize]]) — Lloyd's k-means and per-group centroid outlier
  * scoring with EXACT arithmetic end to end.
  *
  * Why integer space: float k-means accumulates per-cluster mean vectors,
  * and (like float PageRank — see [[PageRank]]) the summation order
  * varies across cluster runs, so centroids and therefore assignments are
  * not reproducible run to run. Over int8 codes every piece is exact and
  * order-invariant: squared distances are bounded integer sums
  * (d·254² ≪ 2^63), centroid updates are elementwise BIGINT sums with
  * truncating division (both Spark's `div` and DuckDB's `//` truncate
  * toward zero, negative sums included), and ties break to the smallest
  * cluster id. Same assignment on 1 core or 1000 executors, and an
  * external engine can replay it bit-for-bit.
  *
  * Scale shape per Lloyd iteration (the MLlib cost model, expressed
  * declaratively):
  *  - assignment: corpus ⨯ broadcast(k centroids) — map-only, no shuffle
  *    of the vector side; argmin is a `min(struct(dist, k))` partial agg
  *    keyed on the vector id (co-keyed with the input, no extra wide
  *    exchange of vector payloads);
  *  - update: one elementwise vector-sum aggregate (functions/VectorSum)
  *    — map-side partials collapse each task to ≤ k arrays before the
  *    shuffle, so shuffle volume is k·d·partitions regardless of corpus
  *    size (and no rows × dims posexplode ever materializes).
  */
object IntCluster {

  /** Exact squared L2 distance between two equal-length int arrays. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y).cast("long") *
      (x - y).cast("long")), lit(0L), (acc, v) => acc + v)

  /** Centroid table (cluster, codes) from member codes: elementwise
    * BIGINT sum ÷ count, truncating — exact and order-free. Clusters
    * absent from `members` keep their `prev` centroid (deterministic
    * empty-cluster rule). */
  private def updateCentroids(members: DataFrame, prev: DataFrame): DataFrame = {
    // elementwise vector-sum aggregate (functions/VectorSum): one array
    // per (partition, cluster) rides the exchange — the posexplode →
    // groupBy (cluster, dim) shape it replaces shuffled rows × dims
    // exploded rows per round. Exact 64-bit addition either way; `div`
    // truncates toward zero — the cross-engine contract for the
    // (possibly negative) code sums.
    val sums = members
      .groupBy(col("cluster"))
      .agg(graft.functions.VectorSumLongs.vectorSum(
          col("codes").cast("array<long>")).as("vsum"),
        // count the rows vector_sum actually folded: count(codes) skips
        // null arrays exactly like the sum does (and like the posexplode
        // shape this replaced — explode of null emits no rows), so a
        // group with null code arrays can't deflate the centroid mean
        count(col("codes")).as("n"))
      .select(col("cluster"),
        expr("transform(vsum, s -> CAST(s div n AS INT))").as("codes_new"))
    prev.join(sums, Seq("cluster"), "left")
      .select(col("cluster"),
        coalesce(col("codes_new"), col("codes")).as("codes"))
  }

  /** Assign each vector to its nearest centroid (ties → smallest cluster
    * id) with ZERO shuffle: the k centroids are collapsed to a single
    * array-of-structs row, broadcast, and the argmin is a fold over that
    * array inside one projection. A crossJoin-k-rows + groupBy(id)
    * formulation would re-shuffle the full vector payload by id every
    * round — at corpus scale that exchange dwarfs the actual distance
    * math. The fold compares (dist2, cluster) pairs lexicographically, so
    * the result is independent of the centroid array's order. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cenArr = centroids.agg(
      collect_list(struct(col("cluster"), col("codes"))).as("cen"))
    val best = aggregate(col("cen"),
      struct(lit(Long.MaxValue).as("dist2"), lit(Int.MaxValue).as("cluster")),
      (acc, c) => {
        val cand = struct(
          sqDist(col("codes"), c.getField("codes")).as("dist2"),
          c.getField("cluster").as("cluster"))
        when(cand < acc, cand).otherwise(acc)
      })
    vecs.crossJoin(broadcast(cenArr))
      .select(col("id"), col("codes"), best.as("best"))
      .select(col("id"), col("codes"),
        col("best.cluster").as("cluster"), col("best.dist2").as("dist2"))
  }

  /** `iterations` Lloyd rounds over `df(idCol, codesCol)`: centroids are
    * initialized from the `k` smallest ids' codes, each round assigns
    * then updates, and the final assignment (against the last updated
    * centroids) is returned as (id, cluster, dist2). */
  def kmeans(df: DataFrame, idCol: String, codesCol: String,
      k: Int, iterations: Int = 3): DataFrame = {
    require(k >= 1 && iterations >= 1,
      s"k=$k and iterations=$iterations must be >= 1")
    // null-id guard (same contract as SortedNeighborhood): a non-numeric
    // idCol value casts to null, and a null id would both seed a bogus
    // centroid and split the seed window's pmod partition key into a
    // separate null partition — row_number restarts there and two seed
    // rows could share a cluster id.
    val vecs0 = df.select(col(idCol).cast("long").as("id"),
        col(codesCol).as("codes"))
      .filter(col("id").isNotNull)
    // loop-tuned rounds (LoopCache.loopSession): the centroid exchanges
    // are k-row, so they run at the derived width with static plans. The
    // corpus itself is NEVER repartitioned — assignment stays map-only
    // over the scan layout at any scale.
    val vecs = LoopCache.tunedInputs(
      LoopCache.loopWidth(df.sparkSession,
        LoopCache.pinnedRow(vecs0.agg(count(lit(1)))).getLong(0)),
      vecs0).head
    // constant partition key: the frame only ever numbers the limit(k)
    // seed rows, but an empty partitionBy fires Spark's "No Partition
    // Defined for Window" warning on every run — alarm fatigue for a
    // window that is bounded by construction. A bare literal gets folded
    // back to an empty spec by the optimizer, so the constant must be
    // non-foldable: pmod(id, 1) is 0 for every (non-null, post-cast) id.
    val w = Window.partitionBy(pmod(col("id"), lit(1))).orderBy(col("id"))
    var lastCentroids: DataFrame = null
    def loop(step: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      // deterministic seed: the k smallest ids, cluster = seed order. The
      // global row_number window only ever sees k+ε rows (limit pushes
      // the top-k selection map-side), so the single-partition sort is
      // bounded.
      var centroids = vecs.orderBy(col("id")).limit(k)
        .select((row_number().over(w) - 1).as("cluster"), col("codes"))
      for (_ <- 1 until iterations) {
        centroids = step(
          updateCentroids(assign(vecs, centroids), centroids), centroids)
      }
      lastCentroids = centroids
      assign(vecs, centroids).select(col("id"), col("cluster"), col("dist2"))
    }
    // cache probe: a prior invocation pinned this exact final assignment
    // — reuse instead of re-running Lloyd rounds. (The plan-only probe
    // loop doubles the centroid plan tree per round — 2^iterations plan
    // NODES, nothing executed — fine at the ≤5 iterations in use.)
    val probe = loop((next, _) => next)
    if (LoopCache.cached(probe)) return probe
    // PIN per round, RELEASE the previous (LoopCache.step): the centroid
    // table is referenced twice per round (the assignment and the
    // empty-cluster carry-over join), so an uncached stepped loop
    // re-runs a corpus-wide aggregation per duplicated subtree (2^rounds
    // blowup — the Bfs.levels bug class). k rows per round table.
    vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pin the final assignment, release the corpus anchor + last centroids
    LoopCache.finish(loop(LoopCache.step), vecs, lastCentroids)
  }

  /** Per-group centroid outliers: each group's exact integer centroid
    * (sum div count per dim), every member's exact squared distance to
    * its OWN group's centroid, and a top-decile flag (by distance desc,
    * id tiebreak; the decile size is `count div 10` — exact).
    * Returns (id, group, dist2, is_outlier).
    *
    * The centroid aggregate collapses map-side to groups·d rows and the
    * distance pass re-joins it broadcast — the member table is never
    * shuffled wide; only the final per-group ranking window shuffles by
    * group (bounded by the largest group, as any per-group top-k). */
  def centroidOutliers(df: DataFrame, idCol: String, groupCol: String,
      codesCol: String): DataFrame = {
    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"), col(codesCol).as("codes"))
    // same vector-sum shape as [[updateCentroids]]: groups × dims values
    // on the exchange instead of a rows × dims posexplode
    val centroids = vecs
      .groupBy(col("grp"))
      .agg(graft.functions.VectorSumLongs.vectorSum(
          col("codes").cast("array<long>")).as("vsum"),
        // null-skipping divisor — must match the rows vector_sum folded
        // (see updateCentroids)
        count(col("codes")).as("n"))
      .select(col("grp"),
        expr("transform(vsum, s -> CAST(s div n AS INT))").as("ccodes"))
    val wRank = Window.partitionBy(col("grp"))
      .orderBy(col("dist2").desc, col("id"))
    val wCnt = Window.partitionBy(col("grp"))
    vecs.join(broadcast(centroids), Seq("grp"))
      .select(col("id"), col("grp"),
        sqDist(col("codes"), col("ccodes")).as("dist2"))
      // decile size = count div 10; floor(n/10.0) is exact for any
      // group size < 2^52 (the quotient can't round across an integer)
      .withColumn("is_outlier",
        row_number().over(wRank) <=
          floor(count(lit(1)).over(wCnt) / lit(10.0)).cast("long"))
      .select(col("id"), col("grp"), col("dist2"), col("is_outlier"))
  }
}
