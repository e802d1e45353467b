package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the latest right row at or before (or
  * strictly before) its timestamp, per key" — an operator Spark has no
  * built-in for.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, and run one `last(..., ignoreNulls)`
  * window over (key, time, tag). That is a single shuffle + sort over
  * |L|+|R| rows — the same cost shape as a sort-merge join — with no
  * per-row range probing and no risk of the quadratic blow-up a
  * time-range join condition produces. At 100 TB both sides shuffle on
  * the key; skewed keys behave exactly like a skewed SMJ (AQE handles).
  *
  * Tie discipline: with `strict=true` a right row at exactly the left
  * row's time is NOT visible (tag sorts left before right at equal time);
  * with `strict=false` it is (right sorts first). Right rows must be
  * unique per (key, time) for the result to be well-defined — same
  * requirement DuckDB's ASOF JOIN has for determinism.
  */
object AsOfJoin {

  /** @param right       unique per (key, time)
    * @param valueCols   right columns to carry onto left rows (null when no
    *                    prior right row exists — LEFT-asof semantics). Left
    *                    rows with a null time are kept with a null match
    *                    (DuckDB ASOF LEFT JOIN keeps unmatched left rows);
    *                    right rows with a null time can never be "latest at
    *                    or before" anything and are ignored.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      valueCols: Seq[String], strict: Boolean = false): DataFrame = {
    val leftTagVal = if (strict) 0 else 1 // smaller tag sorts first at ties
    val rightTagVal = 1 - leftTagVal
    val payload = struct(
      (col(rightTime).as("asof_time") +: valueCols.map(col)): _*)
    val taggedRight = right.filter(col(rightTime).isNotNull).select(
      (col(key).as("asof_key") +:
        col(rightTime).as("asof_t") +:
        lit(rightTagVal).as("asof_tag") +:
        payload.as("asof_payload") +:
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.filter(col(leftTime).isNotNull).select(
      (col(key).as("asof_key") +:
        col(leftTime).as("asof_t") +:
        lit(leftTagVal).as("asof_tag") +:
        lit(null).cast(taggedRight.schema("asof_payload").dataType).as("asof_payload") +:
        left.columns.map(col)): _*)
    val w = Window.partitionBy(col("asof_key"))
      .orderBy(col("asof_t"), col("asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedLeft.unionByName(taggedRight)
      .withColumn("asof_match", last(col("asof_payload"), ignoreNulls = true).over(w))
      .filter(col("asof_tag") === leftTagVal)
      .select(
        left.columns.map(col) ++
          (col("asof_match.asof_time").as("asof_time") +:
            valueCols.map(c => col(s"asof_match.$c").as(c))): _*)
    // null-time left rows bypass the window entirely (they would otherwise
    // sort to the partition head and could absorb stray payloads) and come
    // back with a null match, preserving LEFT cardinality
    val nullTime = left.filter(col(leftTime).isNull)
      .select(
        left.columns.map(col) ++
          (lit(null).cast(matched.schema("asof_time").dataType).as("asof_time") +:
            valueCols.map(c =>
              lit(null).cast(matched.schema(c).dataType).as(c))): _*)
    matched.unionByName(nullTime)
  }
}
