package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-filter funnel — the C4/Gopher-style cascade report: documents
  * flow through an ordered list of predicates, and the output is one row
  * per stage with the in/out/attrition counts a pipeline owner watches.
  *
  * Single-pass shape: each row is mapped to the index of the FIRST stage
  * it fails (or #stages if it survives all of them) — one codegen'd CASE
  * — and one aggregation computes every stage's survivor count as
  * `count_if(fail_idx >= i)`. One scan, one tiny agg row, then a driver-
  * side explode to ≤ #stages output rows: no per-stage jobs, no second
  * pass over the data, no shuffle at all beyond the single-row aggregate.
  * That is the 100 TB shape — the funnel costs exactly one read of the
  * corpus regardless of how many stages it has.
  */
object Funnel {

  /** Run the cascade and report per-stage attrition:
    * (stage_idx, stage, docs_in, docs_out, pct_kept) — docs_in of stage i
    * is docs_out of stage i-1; pct_kept is per-stage survival. */
  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = df.sparkSession
    import spark.implicits._
    // first failing stage index; predicates are evaluated in order and a
    // null predicate result counts as a failure (filter semantics)
    val failIdx = stages.zipWithIndex.foldRight(lit(stages.length)) {
      case (((_, pred), i), rest) => when(!coalesce(pred, lit(false)), lit(i)).otherwise(rest)
    }
    val survivors = df.select(failIdx.as("fail_idx"))
      .agg(array((0 to stages.length).map(i =>
        count_if(col("fail_idx") >= i)): _*).as("surv"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("surv")
    stages.zipWithIndex.map { case ((name, _), i) =>
      val in = survivors(i)
      val out = survivors(i + 1)
      (i, name, in, out,
        if (in > 0) out.toDouble / in.toDouble else 0.0)
    }.toDF("stage_idx", "stage", "docs_in", "docs_out", "frac_kept")
  }
}
