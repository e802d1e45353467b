package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-k — "keep the k best documents per domain/source/language",
  * the selection step after quality scoring in a training-data pipeline.
  *
  * One shuffle on the group key + an in-partition sort; `row_number`
  * guarantees exactly k rows per group with a total order (caller supplies
  * a deterministic tie-break in `orderBy`). Project before calling: the
  * shuffle carries every selected column, so top-k over a 100 TB corpus
  * should shuffle (group, order, id) — a few dozen bytes per row — and
  * re-join payloads for the surviving k·|groups| rows afterwards. */
object TopK {

  def perGroup(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
