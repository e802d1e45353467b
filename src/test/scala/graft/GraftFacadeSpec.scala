package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the [[Graft]] facade (VERDICT r16 #7): the facade
  * is pure delegation by design, but with zero tests its defaults could
  * silently drift from the oracle-gated operator paths. This spec
  * drives the scaladoc example chain end-to-end plus one delegate per
  * facade section, asserting each result is ROW-IDENTICAL to the
  * underlying operator call — never re-testing operator semantics
  * (their own specs do that), only the wiring.
  */
class GraftFacadeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def assertSame(got: DataFrame, want: DataFrame, what: String): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq,
      s"$what: facade columns ${got.columns.toSeq} != ${want.columns.toSeq}")
    assert(rows(got) == rows(want), s"$what: facade rows diverge")
  }

  private lazy val docs = Seq(
    (1L, "a", "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "a", "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "b", "the quick brown fox jumps over the lazy dog again and againn"),
    (4L, "b", "pack my box with five dozen liquor jugs right now please ok"),
    (5L, "a", "sphinx of black quartz judge my vow said the old wise judge"),
    (6L, "b", "completely different text about training data pipelines here")
  ).toDF("doc_id", "source", "text")

  test("facade: the scaladoc chain matches the underlying operators") {
    // stage [2]-[4]: synthetic bitacora -> kpi -> html report. The
    // generator anchors timestamps on wall-clock "now", so two calls
    // are not comparable — generate ONCE through the facade (its own
    // determinism spec lives in PipelineSpec) and pin the delegation
    // downstream of it.
    val bit = Graft.syntheticBitacora(spark, 300L, seed = 7L)
    assert(bit.count() == 300L, "syntheticBitacora row count")
    assert(bit.columns.toSeq == Seq("timestamp_utc", "endpoint",
      "status_code", "elapsed_ms", "parse_result"), "bitacora schema")
    val kpi = Graft.kpi(bit)
    assertSame(kpi, ops.Kpi.bitacoraKpi(bit), "kpi")
    val html = Graft.htmlReport(kpi, umbralP90 = 300.0)
    assert(html == report.Report.buildReport(kpi, 300.0), "htmlReport")
    assert(html.contains("<html") || html.contains("<!DOCTYPE"), "html shape")

    // dedup ladder: signatures -> lsh pairs -> clusters
    val sigs = Graft.minHashSignatures(docs, "doc_id", "text")
    assertSame(sigs, operators.Dedup.minHashSignatures(docs, "doc_id", "text"),
      "minHashSignatures")
    val pairs = Graft.lshCandidatePairs(sigs, "doc_id")
    assertSame(pairs, operators.Dedup.lshCandidatePairs(sigs, "doc_id"),
      "lshCandidatePairs")
    assert(pairs.count() >= 1, "near-identical docs 1/2/3 produced no pair")
    val clusters = Graft.dedupClusters(pairs, "id_a", "id_b")
    assertSame(clusters,
      operators.ConnectedComponents.dedupClusters(pairs, "id_a", "id_b"),
      "dedupClusters")

    // stratified sampling closes the chain
    val rates = Map("a" -> 1.0, "b" -> 0.5)
    assertSame(
      Graft.stratifiedSample(docs, "source", "doc_id", rates),
      operators.Sampling.stratifiedLehmerSample(docs, "source", "doc_id", rates),
      "stratifiedSample")
  }

  test("facade: one delegate per section stays pinned to its operator") {
    // text analysis (Column functions): same expression tree -> same values
    val t = docs.select(col("doc_id"), Graft.tokenCountWs(col("text")).as("n"),
      Graft.langId(col("text")).as("lang"))
    val tWant = docs.select(col("doc_id"),
      functions.TextFunctions.tokenCountWs(col("text")).as("n"),
      functions.TextFunctions.langId(col("text")).as("lang"))
    assertSame(t, tWant, "tokenCountWs/langId")

    // exact dedup
    assertSame(Graft.exactDedup(docs, "doc_id", "text"),
      operators.Dedup.exactDedup(docs, "doc_id", "text"), "exactDedup")

    // similarity: brute-force knn on a tiny embedding table
    val emb = Seq((1L, Array(10, 0, 0)), (2L, Array(9, 1, 0)),
      (3L, Array(0, 10, 0)), (4L, Array(0, 0, 10)))
      .toDF("vec_id", "embedding")
    val q = emb.limit(1)
    assertSame(Graft.knn(emb, q, 2),
      operators.Similarity.bruteForceKnn(emb, q, 2), "knn")

    // graph: pagerank on a 3-cycle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assertSame(Graft.pageRank(edges, "src", "dst", iterations = 2),
      operators.PageRank.fixedPoint(edges, "src", "dst", 2), "pageRank")

    // sequence prep: token windows
    assertSame(Graft.tokenWindows(docs, "doc_id", "text", 4, 2),
      operators.Chunking.tokenWindows(docs, "doc_id", "text", 4, 2),
      "tokenWindows")

    // r16 tier: k-anonymity + sweep line
    assertSame(Graft.kAnonymity(docs, Seq("source"), 3L),
      operators.Privacy.kAnonymity(docs, Seq("source"), 3L), "kAnonymity")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val iv = Seq((ts("2026-08-10 10:00:00"), ts("2026-08-10 11:00:00")),
      (ts("2026-08-10 10:30:00"), ts("2026-08-10 12:00:00"))).toDF("st", "et")
    assertSame(Graft.dailyPeakConcurrency(iv, "st", "et"),
      operators.SweepLine.dailyPeakConcurrency(iv, "st", "et"),
      "dailyPeakConcurrency")

    // r17 tier: weighted bottom-k + CDC chunking
    val wdf = docs.select(col("doc_id"), length(col("text")).as("w"))
    assertSame(Graft.weightedBottomK(wdf, "doc_id", "w", 3),
      operators.Sampling.weightedBottomK(wdf, "doc_id", "w", 3),
      "weightedBottomK")
    assertSame(Graft.cdcChunks(docs, "doc_id", "text"),
      operators.Chunking.cdcChunks(docs, "doc_id", "text"), "cdcChunks")
  }
}
