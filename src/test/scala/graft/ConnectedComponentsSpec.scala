package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Default path (small graphs take driver-side union-find). */
  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Forced distributed min-label iteration (threshold 0). */
  private def compsDist(pairs: Seq[(Long, Long)],
      maxIterations: Int = 20): Map[Long, Long] =
    ConnectedComponents.components(pairs.toDF("a", "b"), "a", "b",
        maxIterations = maxIterations, smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component, separate pair stays separate") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain converges (diameter > 2 hops)") {
    val chain = (0L until 12L).sliding(2).map(s => (s(1), s.head)).toSeq
    val got = compsDist(chain)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L until 12L).toSet)
  }

  test("driver union-find and distributed iteration agree") {
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 4L), (4L, 7L), (100L, 50L),
      (50L, 51L), (51L, 100L), (200L, 200L))
    assert(comps(edges) == compsDist(edges))
  }

  test("star + triangle + self-referencing edges") {
    val got = comps(Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (20L, 22L)))
    assert(got(11L) == 10L && got(12L) == 10L && got(13L) == 10L)
    assert(got(21L) == 20L && got(22L) == 20L)
  }

  test("non-convergence throws instead of returning split components") {
    val chain = (0L until 30L).sliding(2).map(s => (s(1), s.head)).toSeq
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(chain.toDF("a", "b"), "a", "b",
        maxIterations = 2, smallGraphEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupClusters marks exactly one keeper per cluster") {
    val clusters = ConnectedComponents.dedupClusters(
        Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b"), "a", "b")
      .collect()
    val keepers = clusters.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("id"))
    assert(keepers.sorted.toSeq == Seq(1L, 7L))
    assert(clusters.length == 5)
  }
}
