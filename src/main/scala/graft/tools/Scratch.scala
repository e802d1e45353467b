package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-4 exploration: recall checks that decide whether q32/q43/q44 can
  * carry real DuckDB oracles (verified-candidate designs). Throwaway. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    // exact shingle-set jaccard over ALL pairs (n=3 word shingles, like minhash)
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 3, dedup = true)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val shared = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).as("shared"))
    val exact = shared
      .join(sizes.select($"doc_id".as("id_a"), $"n".as("na")), Seq("id_a"))
      .join(sizes.select($"doc_id".as("id_b"), $"n".as("nb")), Seq("id_b"))
      .select($"id_a", $"id_b",
        ($"shared".cast("double") / ($"na" + $"nb" - $"shared")).as("jac"))

    val exact08 = exact.filter($"jac" >= 0.8).cache()
    val n08 = exact08.count()
    println(s"SCRATCH exact shingle-jaccard>=0.8 pairs: $n08")
    val exact07 = exact.filter($"jac" >= 0.7).cache()
    println(s"SCRATCH exact shingle-jaccard>=0.7 pairs: ${exact07.count()}")

    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text")
    val cand = Dedup.lshCandidatePairs(sigs, "doc_id").cache()
    println(s"SCRATCH lsh candidates: ${cand.count()}")

    val missed08 = exact08.join(cand.select($"id_a", $"id_b"),
      Seq("id_a", "id_b"), "left_anti")
    println(s"SCRATCH exact>=0.8 pairs MISSED by lsh: ${missed08.count()}")
    val missed07 = exact07.join(cand.select($"id_a", $"id_b"),
      Seq("id_a", "id_b"), "left_anti")
    println(s"SCRATCH exact>=0.7 pairs MISSED by lsh: ${missed07.count()}")
    missed07.orderBy($"jac".desc).show(20, false)

    // jaccard distribution near the 0.8 boundary (both sides)
    exact.filter($"jac" >= 0.6 && $"jac" < 0.95).orderBy($"jac")
      .show(40, false)

    // --- q33: simhash hamming of the true (jaccard>=0.8) pairs ---
    val fp = Dedup.simHash(docs, "doc_id", "text")
      .select(col("doc_id").as("id"), col("simhash"))
    val withHam = exact08
      .join(fp.select($"id".as("id_a"), $"simhash".as("fa")), Seq("id_a"))
      .join(fp.select($"id".as("id_b"), $"simhash".as("fb")), Seq("id_b"))
      .select($"id_a", $"id_b", $"jac",
        bit_count($"fa".bitwiseXOR($"fb")).as("hamming"))
    println("SCRATCH hamming distribution of true pairs:")
    withHam.groupBy($"hamming").count().orderBy($"hamming").show(30, false)
    // background: how many sub-threshold pairs sit at low hamming?
    val allFp = fp.as("x").join(fp.as("y"), $"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"),
        bit_count($"x.simhash".bitwiseXOR($"y.simhash")).as("hamming"))
      .filter($"hamming" <= 16)
    println("SCRATCH all-pairs hamming<=16 histogram:")
    allFp.groupBy($"hamming").count().orderBy($"hamming").show(30, false)

    // --- q43: IVF vs brute force ---
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" < 10)
    val bf = Similarity.bruteForceKnn(emb, q, k = 5)
      .select($"qid", $"rank", $"neighbor_id")
    val ivf = Similarity.ivfKnn(emb, q, k = 5, nCentroids = 16, nProbe = 4)
      .select($"qid", $"rank", $"neighbor_id")
    val diff = bf.exceptAll(ivf).count() + ivf.exceptAll(bf).count()
    println(s"SCRATCH ivf-vs-brute symmetric diff rows: $diff")

    spark.stop()
  }
}
