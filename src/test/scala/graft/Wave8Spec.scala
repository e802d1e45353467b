package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dsir, Similarity, UniMax}

/** Wave-8 operators (DSIR importance resampling, UniMax water-filling,
  * BPE merge mining). UniMax fixtures are hand-computed through the
  * water-fill arithmetic; DSIR is checked behaviorally (target-like docs
  * outscore off-target docs) plus invariance, since md5 bucket ids are
  * not hand-computable. */
class Wave8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------- UniMax ----------------

  private def unimax(toks: Seq[(String, Long)], cap: Int = 2,
      num: Long = 3, den: Long = 5) =
    UniMax.epochAllocations(toks.toDF("source", "n_tok"), "source", "n_tok",
        cap, num, den)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("allocated"), r.getAs[Double]("epochs"),
          r.getAs[Long]("unallocated"))).toMap

  test("unimax: hand-computed fill — one capped source, rest split evenly") {
    // tokens A=10 B=20 C=100, cap=2 epochs → caps 20/40/200; budget
    // = 130*3 div 5 = 78. Ascending: A capped (20*3+0=60 ≤ 78); B not
    // (40*2+20=100 > 78). share = (78−20) div 2 = 29.
    val got = unimax(Seq(("A", 10L), ("B", 20L), ("C", 100L)))
    assert(got("A") == ((20L, 2.0, 0L)))
    assert(got("B")._1 == 29L && got("B")._2 == 1.45)
    assert(got("C")._1 == 29L && got("C")._2 == 0.29)
  }

  test("unimax: floor-division remainder is reported, not lost") {
    // tokens 10/20/102 → budget 132*3 div 5 = 79; A capped at 20,
    // share = (79−20) div 2 = 29 each → 78 allocated, 1 unallocated.
    val got = unimax(Seq(("A", 10L), ("B", 20L), ("C", 102L)))
    assert(got.values.map(_._1).sum == 78L)
    assert(got.values.forall(_._3 == 1L))
  }

  test("unimax: nothing capped — uniform split, epochs under the cap") {
    // equal sources, budget 30*3 div 5 = 18 → 6 each, 0.6 epochs
    val got = unimax(Seq(("A", 10L), ("B", 10L), ("C", 10L)))
    assert(got.values.forall(v => v._1 == 6L && v._2 == 0.6 && v._3 == 0L))
  }

  test("unimax: invariants on a skewed 12-source mix") {
    val toks = (1 to 12).map(i => (f"s$i%02d", (i * i * 7 + 3).toLong))
    val rows = UniMax.epochAllocations(toks.toDF("source", "n_tok"),
      "source", "n_tok", 2, 3, 5).collect()
    val total = toks.map(_._2).sum
    val b = total * 3 / 5
    assert(rows.map(_.getAs[Long]("allocated")).sum +
      rows.head.getAs[Long]("unallocated") == b)
    assert(rows.forall(r =>
      r.getAs[Long]("allocated") <= r.getAs[Long]("cap")))
    assert(rows.forall(r => r.getAs[Double]("epochs") <= 2.0))
    // every uncapped source gets the identical floor share
    val uncapped = rows.filter(r =>
      r.getAs[Long]("allocated") < r.getAs[Long]("cap"))
      .map(_.getAs[Long]("allocated")).distinct
    assert(uncapped.length == 1)
  }

  // ---------------- BPE ----------------

  test("bpe: pair counts weighted by word frequency, hand-computed") {
    // words: aaa×2 (pair aa twice per word → 4), ab×1 → (a,b)=1
    val docs = Seq("aaa aaa ab", "").toDF("text")
    val got = Bpe.mergeCandidates(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("pair_freq"), r.getAs[Long]("rank")))
    assert(got.toSeq == Seq(("a", "a", 4L, 1L), ("a", "b", 1L, 2L)))
  }

  test("bpe: normalization folds case/whitespace before counting") {
    val docs = Seq("AB   ab\t AB").toDF("text")
    val got = Bpe.mergeCandidates(docs, "text", k = 5).collect()
    assert(got.length == 1 &&
      got.head.getAs[Long]("pair_freq") == 3L)
  }

  test("bpe: ties rank lexicographically; k truncates") {
    val docs = Seq("xy xy cd ab").toDF("text")
    val got = Bpe.mergeCandidates(docs, "text", k = 2)
      .orderBy("rank").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "y"), ("a", "b"))) // xy freq 2 first, then ab < cd tie
  }

  // ---------------- DSIR ----------------

  private val corpus = Seq(
    // target slice: "wiki"-flavored tokens
    (1L, "src1", "solar physics concerns plasma dynamics"),
    (2L, "src1", "plasma dynamics in solar flares"),
    (3L, "src1", "magnetic reconnection drives solar flares"),
    // raw docs: one target-like, one off-target spam, one mixed
    (10L, "src2", "plasma dynamics of solar magnetic flares"),
    (11L, "src2", "buy cheap pills online casino bonus"),
    (12L, "src2", "solar casino plasma bonus"),
    (13L, "src3", "cheap bonus pills casino online deals")
  ).toDF("doc_id", "source", "text")

  test("dsir: feature stream is unigrams + bigrams, bucketed in range") {
    val f = Dsir.featureBuckets(
      Seq((1L, "s", "x y z")).toDF("doc_id", "source", "text"),
      "doc_id", "text", Seq("source"), 4096)
    assert(f.count() == 5) // 3 unigrams + 2 bigrams
    assert(f.agg(min("bucket"), max("bucket")).collect().forall(r =>
      r.getLong(0) >= 0 && r.getLong(1) < 4096))
    // single-token doc: no bigram, no null feature
    val one = Dsir.featureBuckets(
      Seq((2L, "s", "solo")).toDF("doc_id", "source", "text"),
      "doc_id", "text", Seq("source"), 4096)
    assert(one.count() == 1 && one.filter(col("bucket").isNull).count() == 0)
  }

  test("dsir: target-like docs outscore off-target docs per feature") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
        isTarget = col("source") === "src1", buckets = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_feats"),
          r.getAs[java.math.BigDecimal]("log_w_dec").doubleValue())).toMap
    def avg(id: Long) = w(id)._2 / w(id)._1
    assert(avg(10L) > avg(12L) && avg(12L) > avg(11L),
      s"expected target-like > mixed > spam, got $w")
    // off-target-only features are strictly down-weighted; the absolute
    // level of target-like docs depends on the Laplace mass (buckets >>
    // corpus here), so only the SIGN of the spam doc is asserted
    assert(avg(11L) < 0)
  }

  test("dsir: weights are repartition-invariant (decimal discipline)") {
    def run(parts: Int) = Dsir.importanceWeights(corpus.repartition(parts),
        "doc_id", "text", isTarget = col("source") === "src1", buckets = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[java.math.BigDecimal]("log_w_dec")))
      .toSeq
    assert(run(1) == run(7))
  }

  test("dsir: gumbel top-k is deterministic, ranked, and k-bounded") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      isTarget = col("source") === "src1", buckets = 4096)
    val a = Dsir.gumbelTopK(w, "doc_id", 3).collect()
    val b = Dsir.gumbelTopK(w, "doc_id", 3).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    // scores strictly descending in rank order
    val scores = a.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    // score = log_w + gumbel(lehmer(doc_id)) at 6-dp staging
    val r0 = a.head
    val m = 2147483647L
    val draw = ((r0.getAs[Long]("doc_id") * 48271) % m * 48271) % m
    val u = (draw.toDouble + 0.5) / m.toDouble
    val g = BigDecimal(-math.log(-math.log(u)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r0.getAs[Double]("score") -
      (r0.getAs[Double]("log_w") + g)) < 1e-9)
  }

  // ---------------- md5 register expression ----------------

  test("md5Register packs bit-identically to the hex SQL contract") {
    // the oracle-replayed formulation, evaluated by Spark itself, vs the
    // one-pass byte expression — over ids, strings, unicode, empty
    val keys = ((1 to 500).map(_.toString) ++
      Seq("", "a", "solar plasma", "ünïcødé-Ω", "x" * 1000)).toDF("k")
    val got = keys.select(
      graft.functions.Md5RegisterExpression.md5Register($"k").as("pk"),
      expr("CAST(conv(substring(md5(k),1,2),16,10) AS INT)").as("reg_sql"),
      expr("""CAST(IF(conv(substring(md5(k),3,13),16,10) = 0, 53,
               53 - length(bin(CAST(conv(substring(md5(k),3,13),16,10) AS BIGINT))))
             AS INT)""").as("rho_sql"))
    assert(got.filter(shiftright($"pk", 6) =!= $"reg_sql" ||
      $"pk".bitwiseAND(lit(63)) =!= $"rho_sql").count() == 0)
  }

  test("md5Word32 equals the hex-chain SQL contract") {
    val keys = ((1 to 500).map(i => s"doc $i text") ++
      Seq("", "a", "ünïcødé-Ω", "y" * 999)).toDF("k")
    val bad = keys.select(
        graft.functions.Md5Word32Expression.md5Word32($"k").as("w"),
        expr("CAST(conv(substring(md5(k),1,8),16,10) AS BIGINT)").as("w_sql"))
      .filter($"w" =!= $"w_sql").count()
    assert(bad == 0)
  }

  // ---------------- hard negatives ----------------

  test("hard negatives: same-label candidates never mined; rank follows cosine") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),   // anchor
      (2L, Array(1.0f, 0.01f), 0),  // near-identical but SAME label
      (3L, Array(0.9f, 0.1f), 1),   // hard negative (most similar)
      (4L, Array(0.0f, 1.0f), 1),   // orthogonal
      (5L, Array(-1.0f, 0.0f), 2)   // opposite
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 1), 5)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(3L, 4L, 5L))
    assert(!got.map(_.getAs[Long]("neighbor_id")).contains(2L))
    assert(got.map(_.getAs[Int]("neighbor_label")).toSeq == Seq(1, 1, 2))
  }

  // ---------------- dataset card ----------------

  test("dataset card: hand-computed per-source stats incl. exact dup rate") {
    import org.apache.spark.sql.SparkSession
    val s = spark
    val sfDir = java.nio.file.Files
      .createTempDirectory("card").toString
    Seq(
      ("a", "en", "Hello  World", 1L),  // normalizes equal to row 2
      ("a", "en", "hello world", 2L),
      ("a", "es", "hola", 3L),
      ("b", "zh", "", 4L)                // empty → 0 tokens
    ).toDF("source", "lang", "text", "doc_id")
      .write.mode("overwrite").parquet(s"$sfDir/documents.parquet")
    val got = QueriesCorpus.datasetCard(s, sfDir).collect()
    val a = got.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_tokens") == 5)
    assert(a.getAs[Long]("n_distinct_norm") == 2) // the two hellos collapse
    assert(a.getAs[Long]("dup_bps") == 3333)      // (3-2)*10000 div 3
    assert(a.getAs[Long]("n_en") == 2 && a.getAs[Long]("n_es") == 1)
    val b = got.find(_.getString(0) == "b").get
    assert(b.getAs[Long]("n_tokens") == 0 && b.getAs[Long]("min_tokens") == 0)
    assert(b.getAs[Long]("dup_bps") == 0)
  }
}
