package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - bruteForceKnn: exact cosine top-k. The query set is broadcast; the
  *    corpus streams through one codegen'd projection (dot products via
  *    zip_with/aggregate), then a per-query top-k window. Cost O(|corpus|
  *    × |queries|) — the correctness baseline, and the right tool whenever
  *    the query set is small (broadcast side), even at 100 TB corpus.
  *  - lshKnn: random-hyperplane bucketing (16-bit SimHash of the embedding)
  *    — corpus and queries are bucketed once and candidates only meet
  *    inside a bucket (plus optional multi-probe neighbors), turning the
  *    cross join into a bucket-equality join. Recall < 1, bounded by the
  *    plane count; the scale path.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (qid, rank, neighbor_id, cosine). */
  def bruteForceKnn(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).cast("array<double>").as("emb"))
    val q = queries.select(col(idCol).as("qid"),
      col(embCol).cast("array<double>").as("qemb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"),
        VectorFunctions.cosineSimilarity(col("emb"), col("qemb")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.select(col("qid"), col("neighbor_id"), col("cosine"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: same output shape as bruteForceKnn but
    * only pairs sharing a hyperplane bucket are scored. */
  def lshKnn(
      corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 16,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val bucket = VectorFunctions.hyperplaneBucket(col("emb"), nPlanes)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("bucket", bucket)
    val q = queries.select(col(idCol).as("qid"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("bucket", bucket)
      .withColumnRenamed("emb", "qemb")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"),
        VectorFunctions.cosineSimilarity(col("emb"), col("qemb")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.select(col("qid"), col("neighbor_id"), col("cosine"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  /** All-pairs within-threshold cosine over embedding-LSH buckets —
    * embedding-based near-duplicate detection (the "embedding cosine
    * near-dup" dedup tier). */
  def cosineNearDups(
      corpus: DataFrame, minCosine: Double, nPlanes: Int = 12,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val bucket = VectorFunctions.hyperplaneBucket(col("emb"), nPlanes)
    val b = corpus.select(col(idCol).as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("bucket", bucket)
    val l = b.select(col("bucket"), col("id").as("id_a"), col("emb").as("emb_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSimilarity(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .distinct()
  }
}
