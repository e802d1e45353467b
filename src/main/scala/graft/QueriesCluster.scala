package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IntCluster, Projection, Quantize, Sampling}

/** Clustering + corpus-mixing (wave 4): integer k-means and centroid
  * outlier scoring over int8-quantized embeddings, and √-temperature
  * corpus mixing with exact integer targets. Everything here follows the
  * wave's reproducibility rule — no cross-row float accumulation
  * anywhere, so results are bit-stable across cluster runs and DuckDB
  * replays them hash-exactly (see operators/IntCluster.scala).
  */
object QueriesCluster {

  /** DuckDB CTEs producing (vec_id, label, codes) — the q69 int8
    * quantization contract (trunc toward zero of v·127/max|v|), plus a
    * `dims` index table for per-dimension grouping. */
  private val codesCte: String =
    """WITH m AS (
      |  SELECT vec_id, label, embedding,
      |         list_max(list_transform(embedding,
      |                  v -> abs(CAST(v AS DOUBLE)))) AS ma
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, label,
      |         CASE WHEN ma > 0
      |              THEN list_transform(embedding,
      |                     v -> CAST(trunc(CAST(v AS DOUBLE) * (127.0 / ma)) AS INT))
      |              ELSE list_transform(embedding, v -> 0) END AS codes
      |  FROM m),
      |dims AS (
      |  SELECT unnest(range(1, (SELECT max(len(codes)) FROM q) + 1)) AS i)""".stripMargin

  /** Exact squared-L2 between a vector and a centroid, as DuckDB SQL. */
  private def sqDistSql(vec: String, cen: String): String =
    s"CAST(list_sum(list_transform(range(1, len($vec) + 1), " +
      s"i -> CAST($vec[i] - $cen[i] AS BIGINT) * ($vec[i] - $cen[i]))) AS BIGINT)"

  // -------------------------------------------------------------------
  // q95 — integer Lloyd's k-means (k=8, 3 rounds) over int8 codes:
  // deterministic seeds (the 8 smallest vec_ids), exact distances, exact
  // truncating-division centroid updates — the assignment is
  // bit-reproducible and fully replayed by the oracle's unrolled CTEs.
  // -------------------------------------------------------------------
  def kmeansInt8(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = Quantize.withCodes(
      Tables.rebalance(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding")),
      "embedding")
    IntCluster.kmeans(codes, "vec_id", "codes", k = 8, iterations = 3)
      .select(col("id").as("vec_id"), col("cluster").cast("long").as("cluster"),
        col("dist2"))
      .orderBy(col("vec_id"))
  }

  val kmeansInt8Sql: String = {
    val init =
      """c0 AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, codes
        |  FROM (SELECT vec_id, codes FROM q ORDER BY vec_id LIMIT 8))""".stripMargin
    // each round: assignment rank vs c{t-1}, then exact centroid update
    // (per-dim BIGINT sums, `//` truncation, empty clusters carry over)
    def assignCte(t: Int, cen: String): String =
      s"""a$t AS (
         |  SELECT vec_id, k, dist2,
         |         row_number() OVER (PARTITION BY vec_id
         |                            ORDER BY dist2, k) AS rn
         |  FROM (SELECT q.vec_id, c.k,
         |               ${sqDistSql("q.codes", "c.codes")} AS dist2
         |        FROM q CROSS JOIN $cen c))""".stripMargin
    val rounds = (1 to 2).map { t =>
      s"""${assignCte(t, s"c${t - 1}")},
         |s$t AS (
         |  SELECT a.k, d.i, CAST(sum(q.codes[d.i]) AS BIGINT) AS s,
         |         count(*) AS n
         |  FROM (SELECT vec_id, k FROM a$t WHERE rn = 1) a
         |       JOIN q ON q.vec_id = a.vec_id CROSS JOIN dims d
         |  GROUP BY a.k, d.i),
         |l$t AS (
         |  SELECT k, list(CAST(s // n AS INT) ORDER BY i) AS codes
         |  FROM s$t GROUP BY k),
         |c$t AS (
         |  SELECT c.k, coalesce(l.codes, c.codes) AS codes
         |  FROM c${t - 1} c LEFT JOIN l$t l USING (k))""".stripMargin
    }
    (Seq(codesCte, init) ++ rounds :+ assignCte(3, "c2")).mkString(",\n") +
      "\nSELECT vec_id, CAST(k AS BIGINT) AS cluster, dist2 FROM a3 " +
      "WHERE rn = 1 ORDER BY vec_id"
  }

  // -------------------------------------------------------------------
  // q98 — per-label centroid outliers: exact integer centroid per label,
  // exact squared distance of every vector to its OWN label's centroid,
  // top-decile flag (distance desc, id tiebreak, decile = count div 10).
  // The embedding-space "mislabeled / off-distribution" screen.
  // -------------------------------------------------------------------
  def embeddingOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = Quantize.withCodes(
      Tables.rebalance(
        Tables.embeddings(spark, sfDir)
          .select("vec_id", "label", "embedding")),
      "embedding")
    IntCluster.centroidOutliers(codes, "vec_id", "label", "codes")
      .select(col("id").as("vec_id"), col("grp").as("label"),
        col("dist2"), col("is_outlier"))
      .orderBy(col("vec_id"))
  }

  val embeddingOutliersSql: String =
    s"""$codesCte,
      |cen AS (
      |  SELECT label, d.i,
      |         CAST(CAST(sum(q.codes[d.i]) AS BIGINT) // count(*) AS INT) AS cv
      |  FROM q CROSS JOIN dims d GROUP BY label, d.i),
      |cl AS (SELECT label, list(cv ORDER BY i) AS ccodes FROM cen GROUP BY label),
      |d2 AS (
      |  SELECT q.vec_id, q.label, ${sqDistSql("q.codes", "c.ccodes")} AS dist2
      |  FROM q JOIN cl c USING (label)),
      |r AS (
      |  SELECT vec_id, label, dist2,
      |         row_number() OVER (PARTITION BY label
      |                            ORDER BY dist2 DESC, vec_id) AS rn,
      |         count(*) OVER (PARTITION BY label) AS n
      |  FROM d2)
      |SELECT vec_id, label, dist2, rn <= n // 10 AS is_outlier
      |FROM r ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------------
  // q99 — √-temperature corpus mixing: flatten the source distribution
  // toward uniform with per-stratum targets `T·√n_s / Σ√n` — every
  // target an exact BIGINT, the draw an all-integer Lehmer acceptance
  // (no float rate anywhere; see Sampling.sqrtTemperatureTargets).
  // -------------------------------------------------------------------
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select("doc_id", "source")
    val targets = Sampling.sqrtTemperatureTargets(d, "source")
    val after = Sampling.temperatureMixSample(d, "source", "doc_id", targets)
      .groupBy(col("source")).agg(count(lit(1)).as("n_after"))
    targets.join(after, Seq("source"), "left")
      .select(col("source"), col("n_before"), col("weight"), col("target_n"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .orderBy(col("source"))
  }

  val temperatureMixSql: String =
    """WITH c AS (
      |  SELECT source, count(*) AS n_before FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_before,
      |         CAST(floor(sqrt(CAST(n_before AS DOUBLE))) AS BIGINT) AS weight
      |  FROM c),
      |t AS (
      |  SELECT source, n_before, weight,
      |         least(n_before,
      |           (((SELECT CAST(sum(n_before) AS BIGINT) FROM c) // 2) * weight)
      |             // greatest((SELECT CAST(sum(weight) AS BIGINT) FROM w), 1)) AS target_n
      |  FROM w),
      |s AS (
      |  SELECT d.source, count(*) AS n_after
      |  FROM documents d JOIN t USING (source)
      |  WHERE (((d.doc_id * 48271) % 2147483647) * 48271 % 2147483647)
      |          * t.n_before < t.target_n * 2147483647
      |  GROUP BY d.source)
      |SELECT t.source, t.n_before, t.weight, t.target_n,
      |       coalesce(s.n_after, 0) AS n_after
      |FROM t LEFT JOIN s USING (source)
      |ORDER BY t.source""".stripMargin

  // ------------------------------------------------------------------
  // q153 — EXACT-quota √-temperature mix: the same targets as q99, hit
  // EXACTLY instead of in expectation (per-stratum rank over the Lehmer
  // draw, keep the target_n smallest — Sampling.exactQuotaSample). The
  // output carries min/max KEPT doc ids per source, so the oracle
  // verifies the selection IDENTITY (which rows the ranking keeps), not
  // just the counts.
  // ------------------------------------------------------------------
  def exactQuotaMix(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select("doc_id", "source")
    val targets = Sampling.sqrtTemperatureTargets(d, "source")
    val kept = Sampling.exactQuotaSample(d, "source", "doc_id", targets)
    val agg = kept.groupBy(col("source")).agg(
      count(lit(1)).as("n_after"),
      min(col("doc_id")).as("min_kept_id"),
      max(col("doc_id")).as("max_kept_id"))
    targets.select(col("source"), col("n_before"), col("target_n"))
      .join(agg, Seq("source"), "left")
      .select(col("source"), col("n_before"), col("target_n"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        col("min_kept_id"), col("max_kept_id"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // q155 — JL sign-projection neighbor audit: compress the int8 codes
  // 64→16 dims with the fixed ±1 md5-parity matrix (operators/
  // Projection) and measure what the compression does to retrieval —
  // for 20 deterministic probe vectors (smallest Lehmer draws), the
  // exact top-1 neighbor in ORIGINAL space vs PROJECTED space, both as
  // exact integer L2 argmins with id tiebreaks. Linear scan shape: the
  // probe set broadcasts, the corpus is read once, the argmin is a
  // 20-group partial-min aggregate — the recall-audit pass an ANN
  // deployment runs before trusting a compressed index.
  // ------------------------------------------------------------------
  def jlNeighborAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = Quantize.withCodes(
      Tables.rebalance(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding")),
      "embedding").select(col("vec_id"), col("codes"))
    val proj = Projection.signProject(codes, "codes", dIn = 64, dOut = 16)
    val probes = proj
      .orderBy(Sampling.lehmerInt(col("vec_id")), col("vec_id")).limit(20)
      .select(col("vec_id").as("probe_id"), col("codes").as("pcodes"),
        col("proj").as("pproj"))
    proj.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        Projection.sqDist(col("codes"), col("pcodes")).as("d_orig"),
        Projection.sqDist(col("proj"), col("pproj")).as("d_proj"))
      .groupBy(col("probe_id"))
      .agg(min(struct(col("d_orig"), col("cand_id"))).as("o"),
        min(struct(col("d_proj"), col("cand_id"))).as("p"))
      .select(col("probe_id"),
        col("o.cand_id").as("nn_orig"), col("o.d_orig").as("d_orig"),
        col("p.cand_id").as("nn_proj"), col("p.d_proj").as("d_proj"),
        (col("o.cand_id") === col("p.cand_id")).as("agree"))
      .orderBy(col("probe_id"))
  }

  val jlNeighborAuditSql: String =
    s"""$codesCte,
      |signs AS (
      |  SELECT ii.i, jj.j,
      |         CASE WHEN ('0x' || substr(md5(ii.i || ':' || jj.j), 1, 8))::BIGINT
      |                   % 2 = 0
      |              THEN 1 ELSE -1 END AS s
      |  FROM (SELECT unnest(range(0, 64)) AS i) ii,
      |       (SELECT unnest(range(0, 16)) AS j) jj),
      |pr AS (
      |  SELECT q.vec_id, s.j,
      |         CAST(sum(CAST(q.codes[s.i + 1] AS BIGINT) * s.s) AS BIGINT) AS pv
      |  FROM q CROSS JOIN signs s
      |  GROUP BY q.vec_id, s.j),
      |pl AS (SELECT vec_id, list(pv ORDER BY j) AS proj FROM pr GROUP BY vec_id),
      |probes AS (
      |  SELECT q.vec_id AS probe_id, q.codes AS pcodes, pl.proj AS pproj
      |  FROM q JOIN pl USING (vec_id)
      |  ORDER BY ((q.vec_id * 48271) % 2147483647) * 48271 % 2147483647,
      |           q.vec_id
      |  LIMIT 20),
      |cand AS (
      |  SELECT p.probe_id, q.vec_id AS cand_id,
      |         ${sqDistSql("q.codes", "p.pcodes")} AS d_orig,
      |         ${sqDistSql("pl.proj", "p.pproj")} AS d_proj
      |  FROM q JOIN pl USING (vec_id) CROSS JOIN probes p
      |  WHERE q.vec_id <> p.probe_id),
      |r AS (
      |  SELECT probe_id, cand_id, d_orig, d_proj,
      |         row_number() OVER (PARTITION BY probe_id
      |                            ORDER BY d_orig, cand_id) AS ro,
      |         row_number() OVER (PARTITION BY probe_id
      |                            ORDER BY d_proj, cand_id) AS rp
      |  FROM cand)
      |SELECT probe_id,
      |       max(CASE WHEN ro = 1 THEN cand_id END) AS nn_orig,
      |       max(CASE WHEN ro = 1 THEN d_orig END) AS d_orig,
      |       max(CASE WHEN rp = 1 THEN cand_id END) AS nn_proj,
      |       max(CASE WHEN rp = 1 THEN d_proj END) AS d_proj,
      |       max(CASE WHEN ro = 1 THEN cand_id END)
      |         = max(CASE WHEN rp = 1 THEN cand_id END) AS agree
      |FROM r GROUP BY probe_id ORDER BY probe_id""".stripMargin

  val exactQuotaMixSql: String =
    """WITH c AS (
      |  SELECT source, count(*) AS n_before FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_before,
      |         CAST(floor(sqrt(CAST(n_before AS DOUBLE))) AS BIGINT) AS weight
      |  FROM c),
      |t AS (
      |  SELECT source, n_before, weight,
      |         least(n_before,
      |           (((SELECT CAST(sum(n_before) AS BIGINT) FROM c) // 2) * weight)
      |             // greatest((SELECT CAST(sum(weight) AS BIGINT) FROM w), 1)) AS target_n
      |  FROM w),
      |r AS (
      |  SELECT d.source, d.doc_id,
      |         row_number() OVER (PARTITION BY d.source
      |           ORDER BY ((d.doc_id * 48271) % 2147483647) * 48271
      |                      % 2147483647, d.doc_id) AS rn,
      |         t.target_n
      |  FROM documents d JOIN t USING (source)),
      |k AS (SELECT source, doc_id FROM r WHERE rn <= target_n)
      |SELECT t.source, t.n_before, t.target_n,
      |       CAST(count(k.doc_id) AS BIGINT) AS n_after,
      |       min(k.doc_id) AS min_kept_id, max(k.doc_id) AS max_kept_id
      |FROM t LEFT JOIN k USING (source)
      |GROUP BY t.source, t.n_before, t.target_n
      |ORDER BY t.source""".stripMargin
}
