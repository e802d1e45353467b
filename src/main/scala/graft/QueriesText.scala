package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{RollingHashExpression, TextFunctions}
import graft.operators.{Dedup, Multimodal, Quantize, Sessionize, Similarity}

/** Training-data pipeline queries over `documents` / `embeddings` / `events`:
  * dedup (exact, near-exact, MinHash-LSH, SimHash, n-gram jaccard),
  * similarity search, text analysis (language-ID, quality, token counting,
  * fingerprinting), sessionization, multimodal plumbing.
  *
  * Oracle policy: integer/string-derived metrics and ratio-of-integers
  * doubles are SQL-expressible and oracle-checked; hash-family operators
  * (xxhash64-based MinHash/SimHash, rolling-hash fingerprints, LSH buckets)
  * have no DuckDB equivalent → rows-only checks.
  */
object QueriesText {

  /** DuckDB fragment: normalized text (mirrors TextFunctions.normalizeText). */
  private def normSql(c: String): String =
    s"lower(trim(regexp_replace($c, '\\s+', ' ', 'g')))"

  /** DuckDB fragment: TextFunctions.tokenCountWs on a normalized expr. */
  private def tokCountSql(norm: String): String =
    s"CASE WHEN length($norm) = 0 THEN 0 ELSE CAST(len(string_split($norm, ' ')) AS INT) END"

  /** DuckDB fragment: TextFunctions.stopwordHits on a normalized expr. */
  private def stopHitsSql(norm: String, words: Seq[String]): String = {
    val set = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(string_split($norm, ' '), t -> t IN ($set))) AS INT)"
  }

  // ------------------------------------------------------------------
  // q30 — exact dedup groups (hash-groupBy on md5 digest).
  // ------------------------------------------------------------------
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(spark, sfDir), "doc_id", "text")
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS dup_count
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // ------------------------------------------------------------------
  // q31 — near-exact dedup stats per source (normalized text).
  // ------------------------------------------------------------------
  def dedupNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("source", "text"))
    // distinct-count DIGESTS, not texts: countDistinct's expand/partial-
    // distinct shuffle then carries 32-byte hex instead of document-sized
    // normalized strings — same count (md5 collisions aside, which both
    // engines share since they hash identical bytes)
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(TextFunctions.normalizeText(col("text")).cast("binary")))
          .as("n_distinct_norm"))
      .orderBy(col("source"))
  }

  val dedupNormalizedSql: String =
    s"""SELECT source, count(*) AS n_docs,
      |       count(DISTINCT md5(${normSql("text")})) AS n_distinct_norm
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // q32 — MinHash LSH candidate pairs (rows-only: xxhash64 family).
  // ------------------------------------------------------------------
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // rebalance before the signature projection: shingle+64-perm hashing
    // is the CPU hot loop, and a single-row-group scan would pin it to
    // one task (Tables.rebalance is a no-op on real multi-file inputs)
    val sigs = Dedup.minHashSignatures(
      Tables.rebalance(Tables.documents(spark, sfDir).select("doc_id", "text")),
      "doc_id", "text")
    Dedup.lshCandidatePairs(sigs, "doc_id")
      .orderBy(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------------
  // q33 — SimHash fingerprints + near-dup pairs (rows-only).
  // ------------------------------------------------------------------
  def simhashNearDups(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = Dedup.simHash(
      Tables.rebalance(Tables.documents(spark, sfDir).select("doc_id", "text")),
      "doc_id", "text")
    Dedup.simHashNearDups(fp, "doc_id", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------------
  // q34 — exact word-level jaccard pairs ≥ 0.8 (ratio of ints: oracle-safe).
  // ------------------------------------------------------------------
  def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, sfDir), "doc_id", "text", 0.8)
      .orderBy(col("id_a"), col("id_b"))

  val jaccardPairsSql: String =
    s"""WITH toks AS (
      |  SELECT DISTINCT doc_id AS id,
      |         unnest(string_split(${normSql("text")}, ' ')) AS tok
      |  FROM documents
      |), sizes AS (
      |  SELECT id, count(*) AS n_tok FROM toks GROUP BY id
      |), shared AS (
      |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
      |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b,
      |       CAST(shared AS DOUBLE) / CAST(na.n_tok + nb.n_tok - shared AS DOUBLE) AS jaccard
      |FROM shared
      |JOIN sizes na ON na.id = id_a
      |JOIN sizes nb ON nb.id = id_b
      |WHERE CAST(shared AS DOUBLE) / CAST(na.n_tok + nb.n_tok - shared AS DOUBLE) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------------------
  // q35 — brute-force cosine top-5 (ids+rank only: ranking is stable
  // cross-engine, raw cosines are not guaranteed bit-equal).
  // ------------------------------------------------------------------
  def knnBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("qid"), col("rank"), col("neighbor_id"))
      .orderBy(col("qid"), col("rank"))
  }

  val knnBruteSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10),
      |s AS (SELECT qid, e.vec_id AS neighbor_id,
      |             list_cosine_similarity(e.emb, q.qemb) AS cosine
      |      FROM e, q WHERE e.vec_id != q.qid),
      |r AS (SELECT qid, neighbor_id,
      |             row_number() OVER (PARTITION BY qid
      |                                ORDER BY cosine DESC, neighbor_id) AS rank
      |      FROM s)
      |SELECT qid, rank, neighbor_id FROM r WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // ------------------------------------------------------------------
  // q36 — heuristic language-ID (integer marker counts + argmax).
  // ------------------------------------------------------------------
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    val scores = TextFunctions.langMarkers.map { case (lang, words) =>
      TextFunctions.stopwordHits(col("text"), words).as(s"s_$lang")
    }
    d.select((col("doc_id") +: scores :+
        TextFunctions.langId(col("text")).as("lang_pred")): _*)
      .orderBy(col("doc_id"))
  }

  val langIdSql: String = {
    val scoreExprs = TextFunctions.langMarkers.map { case (lang, words) =>
      s"${stopHitsSql("p", words)} AS s_$lang"
    }.mkString(",\n       ")
    // fold-equivalent argmax: later languages win only on strictly greater
    // score than the running best (= greatest of the earlier scores)
    s"""WITH t AS (SELECT doc_id, ${normSql("text")} AS p FROM documents),
      |s AS (SELECT doc_id,
      |       $scoreExprs
      |FROM t)
      |SELECT doc_id, s_en, s_es, s_fr, s_de,
      |       CASE WHEN s_en + s_es + s_fr + s_de = 0 THEN 'und'
      |            WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
      |            WHEN s_fr > greatest(s_en, s_es) THEN 'fr'
      |            WHEN s_es > s_en THEN 'es'
      |            ELSE 'en' END AS lang_pred
      |FROM s ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // q37 — quality metrics (integer-derived, oracle-exact).
  // ------------------------------------------------------------------
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    d.select(col("doc_id"), TextFunctions.qualityMetrics(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_tokens"), col("q.avg_token_len"),
        col("q.punct_count"), col("q.stopword_ratio"), col("q.quality_ok"))
      .orderBy(col("doc_id"))
  }

  val textQualitySql: String = {
    val allWords = TextFunctions.langMarkers.flatMap(_._2)
    s"""WITH t AS (
      |  SELECT doc_id, ${normSql("text")} AS norm FROM documents
      |), m AS (
      |  SELECT doc_id, norm,
      |         ${tokCountSql("norm")} AS n_tokens,
      |         CAST(length(norm) - length(translate(norm, '.,!?', '')) AS INT) AS punct_count,
      |         ${stopHitsSql("norm", allWords)} AS stop_hits
      |  FROM t
      |)
      |SELECT doc_id, n_tokens,
      |       CASE WHEN n_tokens > 0
      |            THEN CAST(length(norm) - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |            ELSE 0.0 END AS avg_token_len,
      |       punct_count,
      |       CASE WHEN n_tokens > 0
      |            THEN CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |            ELSE 0.0 END AS stopword_ratio,
      |       n_tokens BETWEEN 5 AND 100000
      |         AND (CASE WHEN n_tokens > 0
      |                   THEN CAST(length(norm) - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |                   ELSE 0.0 END) BETWEEN 1.0 AND 20.0 AS quality_ok
      |FROM m ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // q38 — token counting: whitespace + BPE-ish regex pre-tokenizer.
  // ------------------------------------------------------------------
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    d.select(col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).as("n_ws_tokens"),
        TextFunctions.tokenCountBpe(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  val tokenCountsSql: String =
    s"""SELECT doc_id,
      |       ${tokCountSql(normSql("text"))} AS n_ws_tokens,
      |       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // q39 — rolling-hash document fingerprints (custom Catalyst Expression
  // with codegen). Oracle: DuckDB replays the mod-2^64 multiply-add loop
  // in HUGEINT via list_reduce over the codepoints (== UTF-8 bytes — the
  // corpus is ASCII), then converts the unsigned residue to the signed
  // Long the JVM's overflow arithmetic produces.
  // ------------------------------------------------------------------
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.select(col("doc_id"),
        RollingHashExpression.rollingHash(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  val fingerprintsSql: String =
    """WITH h0 AS (
      |  SELECT doc_id,
      |         list_reduce(
      |           list_prepend(1125899906842597::HUGEINT,
      |             list_transform(range(1, length(text) + 1),
      |                            i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
      |           (h, b) -> (h * 31 + b) % 18446744073709551616::HUGEINT) AS hu
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
      |                 THEN hu - 18446744073709551616::HUGEINT
      |                 ELSE hu END AS BIGINT) AS fingerprint
      |FROM h0 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // q40 — gap sessionization of the event stream (30-minute gap).
  // ------------------------------------------------------------------
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    Sessionize.userSessionStats(
        Tables.events(spark, sfDir), "user_id", "ts", "event_id", 1800L)
      .orderBy(col("user_id"))

  val sessionizeSql: String =
    """WITH l AS (
      |  SELECT user_id, ts, event_id,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events
      |), n AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN prev IS NULL
      |                OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1
      |              ELSE 0 END AS is_new
      |  FROM l
      |), s AS (
      |  SELECT user_id,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM n
      |), per AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM s GROUP BY user_id, session_id
      |)
      |SELECT user_id, count(*) AS n_sessions,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       max(n_events) AS max_session_events
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------
  // q41 — LSH-bucketed approximate knn (rows-only; the scale path of q35).
  // ------------------------------------------------------------------
  def knnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.lshKnn(emb, emb.filter(col("vec_id") < 10), k = 5, nPlanes = 8)
      .select(col("qid"), col("rank"), col("neighbor_id"))
      .orderBy(col("qid"), col("rank"))
  }

  // ------------------------------------------------------------------
  // q44 — full near-dup dedup pipeline: MinHash signatures → LSH candidate
  // pairs → transitive closure (connected components) → cluster table.
  // Rows-only (xxhash64-based pairs have no DuckDB equivalent).
  // ------------------------------------------------------------------
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = Dedup.minHashSignatures(
      Tables.rebalance(Tables.documents(spark, sfDir).select("doc_id", "text")),
      "doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id")
      .filter(col("est_jaccard") >= 0.7)
    graft.operators.ConnectedComponents.dedupClusters(pairs, "id_a", "id_b")
      .groupBy(col("representative"))
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy(col("representative"))
  }

  // ------------------------------------------------------------------
  // q43 — IVF approximate knn (rows-only: KMeans cells are probabilistic;
  // the brute-force q35 is the recall reference).
  // ------------------------------------------------------------------
  def knnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.ivfKnn(emb, emb.filter(col("vec_id") < 10), k = 5,
        nCentroids = 16, nProbe = 4)
      .select(col("qid"), col("rank"), col("neighbor_id"))
      .orderBy(col("qid"), col("rank"))
  }

  // ------------------------------------------------------------------
  // q42 — embedding-cosine near-duplicates via hyperplane LSH buckets
  // (the embedding tier of the dedup ladder). The corpus embeddings are
  // random noise (max pairwise cosine ≈ 0.51), so the query plants exact
  // copies of vec_id<20 at id+100000: the operator must recover exactly
  // those 20 pairs. Identical vectors always share an LSH bucket, so the
  // probabilistic recall does not blur the oracle; the brute-force
  // threshold join in DuckDB is the ground truth.
  // ------------------------------------------------------------------
  /** q42/q84 shared fixture: the embeddings corpus plus exact duplicates
    * of vec_id < 20 planted at +100000 — the ground truth both near-dup
    * oracles recover. ONE definition (and one SQL twin below): the
    * oracle arguments of both queries depend on the plant being
    * identical. */
  private[graft] def plantedEmbeddingCorpus(
      spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    emb.unionByName(emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
        col("label")))
  }

  /** DuckDB twin of [[plantedEmbeddingCorpus]] as a CTE body named `c`. */
  private[graft] val plantedEmbeddingCorpusCte: String =
    """c AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings
      |  WHERE vec_id < 20)""".stripMargin

  def embeddingNearDups(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.cosineNearDups(
        plantedEmbeddingCorpus(spark, sfDir), minCosine = 0.99)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))

  val embeddingNearDupsSql: String =
    s"""WITH $plantedEmbeddingCorpusCte
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM c a, c b
      |WHERE a.vec_id < b.vec_id
      |  AND list_cosine_similarity(a.emb, b.emb) >= 0.99
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q50 — multimodal plumbing: payload → (stub) decode → feature stats.
  // ------------------------------------------------------------------
  // ------------------------------------------------------------------
  // q69 — int8 embedding quantization (operators/Quantize): per-vector
  // symmetric codes, integer checksum, saturation count, and max
  // reconstruction error. Everything is elementwise IEEE double + an
  // order-free array max — no cross-row float accumulation — so the
  // oracle replays trunc(v * 127/max|v|) in DuckDB bit-exactly.
  // ------------------------------------------------------------------
  def quantizeEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    Quantize.quantized(
      Tables.rebalance(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding")),
      "embedding")
      .select(col("vec_id"), size(col("codes")).as("n_dims"),
        col("code_sum"),
        size(filter(col("codes"), c => abs(c) === 127)).as("n_saturated"),
        col("max_recon_err"))
      .orderBy(col("vec_id"))

  val quantizeEmbeddingsSql: String =
    """WITH m AS (
      |  SELECT vec_id, embedding,
      |         list_max(list_transform(embedding,
      |                  v -> abs(CAST(v AS DOUBLE)))) AS ma
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id, embedding, ma,
      |         CASE WHEN ma > 0
      |              THEN list_transform(embedding,
      |                     v -> CAST(trunc(CAST(v AS DOUBLE) * (127.0 / ma)) AS INT))
      |              ELSE list_transform(embedding, v -> 0) END AS codes
      |  FROM m
      |)
      |SELECT vec_id, CAST(len(codes) AS INT) AS n_dims,
      |       CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |       CAST(len(list_filter(codes, c -> abs(c) = 127)) AS INT) AS n_saturated,
      |       CASE WHEN ma > 0
      |            THEN list_max(list_transform(range(1, len(codes) + 1),
      |                   i -> abs(CAST(embedding[i] AS DOUBLE)
      |                            - CAST(codes[i] AS DOUBLE) * (ma / 127.0))))
      |            ELSE 0.0 END AS max_recon_err
      |FROM q ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------------
  // q74 — keep-BEST dedup (Dedup.keepBestGroups): one winner per
  // normalized-text cluster chosen by raw length (the variant with the
  // most original formatting), ties to the smallest id — max(struct)
  // argmax through a partial/final hash aggregate, no window sort
  // (q63's at-scale argument). Digest, ids, counts, and the char-length
  // quality are all integer/string-exact cross-engine.
  // ------------------------------------------------------------------
  def keepBestDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val norm = TextFunctions.normalizeText(col("text"))
    Dedup.keepBestGroups(d, "doc_id",
        md5(norm.cast("binary")), length(col("text")).cast("long"))
      .orderBy(col("digest"))
  }

  val keepBestDedupSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, md5(${normSql("text")}) AS digest,
      |         CAST(length(text) AS BIGINT) AS q
      |  FROM documents
      |), r AS (
      |  SELECT digest, doc_id, q,
      |         row_number() OVER (PARTITION BY digest
      |                            ORDER BY q DESC, doc_id) AS rn,
      |         count(*) OVER (PARTITION BY digest) AS dup_count
      |  FROM t
      |)
      |SELECT digest, doc_id AS keep_id, dup_count, q AS best_quality
      |FROM r WHERE rn = 1 ORDER BY digest""".stripMargin

  // ------------------------------------------------------------------
  // q73 — top-k search over the int8 codes (the search half of q69's
  // quantize→search path). Integer dot products (terms ≤ 127², 128-dim
  // sums ≪ 2^53) stay EXACT through the double cosine math, so unlike
  // float-embedding cosine this ANN tier is bit-reproducible and the
  // DuckDB oracle replays it hash-exactly.
  // ------------------------------------------------------------------
  def knnInt8(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.rebalance(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))
    Similarity.int8Knn(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("qid"), col("rank"), col("neighbor_id"), col("qcos"))
      .orderBy(col("qid"), col("rank"))
  }

  val knnInt8Sql: String =
    """WITH m AS (
      |  SELECT vec_id,
      |         list_max(list_transform(embedding,
      |                  v -> abs(CAST(v AS DOUBLE)))) AS ma,
      |         embedding
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id,
      |         CASE WHEN ma > 0
      |              THEN list_transform(embedding,
      |                     v -> CAST(trunc(CAST(v AS DOUBLE) * (127.0 / ma)) AS INT))
      |              ELSE list_transform(embedding, v -> 0) END AS codes
      |  FROM m
      |), scored AS (
      |  SELECT qv.vec_id AS qid, cv.vec_id AS neighbor_id,
      |         CASE WHEN list_sum(list_transform(cv.codes, c -> c * c)) > 0
      |               AND list_sum(list_transform(qv.codes, c -> c * c)) > 0
      |              THEN CAST(list_sum(list_transform(range(1, len(cv.codes) + 1),
      |                          i -> cv.codes[i] * qv.codes[i])) AS DOUBLE)
      |                   / sqrt(CAST(list_sum(list_transform(cv.codes, c -> c * c)) AS DOUBLE)
      |                          * CAST(list_sum(list_transform(qv.codes, c -> c * c)) AS DOUBLE))
      |              ELSE 0.0 END AS qcos
      |  FROM q cv CROSS JOIN (SELECT * FROM q WHERE vec_id < 10) qv
      |  WHERE cv.vec_id <> qv.vec_id
      |), ranked AS (
      |  SELECT qid, neighbor_id, qcos,
      |         row_number() OVER (PARTITION BY qid
      |                            ORDER BY qcos DESC, neighbor_id) AS rank
      |  FROM scored
      |)
      |SELECT qid, rank, neighbor_id, qcos FROM ranked WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  def multimodalStats(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = Multimodal.payloadFromText(
      Tables.rebalance(
        Tables.documents(spark, sfDir).select("doc_id", "source", "text")),
      "doc_id", "source", "text")
    Multimodal.featureStats(Multimodal.decodeFeatures(payloads))
  }
}
