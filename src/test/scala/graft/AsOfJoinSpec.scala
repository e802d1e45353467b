package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val right = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)).toDF("k", "t", "v")

  test("non-strict: right row at exactly left time is visible") {
    val left = Seq(("a", 20L, "x"), ("a", 25L, "y"), ("a", 5L, "z"),
      ("b", 15L, "w"), ("c", 99L, "q")).toDF("k", "t", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v"))
      .select($"k", $"t", $"tag", $"v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet
    assert(got == Set(
      ("a", 20L, "x", Some(2.0)),   // exact match visible
      ("a", 25L, "y", Some(2.0)),
      ("a", 5L, "z", None),         // nothing at or before
      ("b", 15L, "w", Some(9.0)),
      ("c", 99L, "q", None)))       // key absent from right
  }

  test("strict: right row at exactly left time is NOT visible") {
    val left = Seq(("a", 20L, "x"), ("a", 21L, "y")).toDF("k", "t", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v"), strict = true)
      .select($"t", $"v").as[(Long, Option[Double])].collect().toSet
    assert(got == Set((20L, Some(1.0)), (21L, Some(2.0))))
  }

  test("asof_time column carries the matched right timestamp") {
    val left = Seq(("a", 25L, "y")).toDF("k", "t", "tag")
    val r = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v")).collect().head
    assert(r.getAs[Long]("asof_time") == 20L)
  }

  test("null-time left rows are kept with a null match (LEFT semantics)") {
    val left = Seq(("a", Some(25L), "y"), ("a", None, "n1"), ("c", None, "n2"))
      .toDF("k", "t", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toSet
    assert(got == Set(("y", Some(2.0)), ("n1", None), ("n2", None)))
  }

  test("null-time right rows never match") {
    val r2 = Seq(("a", Some(10L), 1.0), ("a", None, 99.0)).toDF("k", "t", "v")
    val left = Seq(("a", 25L, "y")).toDF("k", "t", "tag")
    val got = AsOfJoin.asOf(left, r2, "k", "t", "t", Seq("v"))
      .select($"v").as[Double].collect().toSeq
    assert(got == Seq(1.0))
  }
}
