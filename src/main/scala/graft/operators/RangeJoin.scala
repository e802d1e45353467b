package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: points joined to intervals (plus optional equality
  * keys) without the quadratic blow-up a raw range predicate produces —
  * Spark plans `a.t BETWEEN b.lo AND b.hi` with no equality key as a
  * BroadcastNestedLoopJoin (O(|L|·|R|)).
  *
  * Technique: quantize time into `binSeconds` bins; each interval row is
  * exploded to the bins it covers, points carry their single bin, and the
  * join runs on (keys..., bin) as an ordinary shuffled equi-join, with the
  * exact range predicate re-applied after. Choose `binSeconds` near the
  * typical interval length: intervals then explode to ~2 bins, and each
  * bucket holds only temporally-close rows — the standard bucketed
  * interval-partitioning technique of production range-join
  * implementations.
  */
object RangeJoin {

  /** @param points      rows with an epoch-seconds LongType column `pointTs`
    * @param intervals   rows with epoch-seconds `startTs`/`endTs` columns
    *                    (endTs inclusive; endTs >= startTs)
    * @param keys        equality key columns present on both sides
    * @param strictStart if true the match is startTs < t, else startTs <= t
    */
  def pointsInIntervals(
      points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      binSeconds: Long, strictStart: Boolean = false): DataFrame = {
    val p = points.withColumn("rj_bin", expr(s"$pointTs DIV ${binSeconds}L"))
    val iv = intervals.withColumn("rj_bin",
      explode(sequence(
        expr(s"$startTs DIV ${binSeconds}L"),
        expr(s"$endTs DIV ${binSeconds}L"))))
    val startCmp: Column =
      if (strictStart) col(startTs) < col(pointTs) else col(startTs) <= col(pointTs)
    p.join(iv, keys :+ "rj_bin")
      .filter(startCmp && col(pointTs) <= col(endTs))
      .drop("rj_bin")
  }
}
