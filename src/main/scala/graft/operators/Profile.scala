package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the stats-gathering pass a catalog
  * runs to feed cost-based optimization and data-quality monitors:
  * per-column null count, distinct cardinality, min/max, plus row count.
  *
  * Shape: ONE aggregate pass over the table (all statistics partial-agg
  * and merge), emitted long-form (one row per column) via an unpivot-style
  * stack of the per-column structs. Exact `count_distinct` goes through
  * Spark's Expand (one duplicated stream per distinct column) — right for
  * an offline stats job; monitors at 100 TB flip `approxDistinct = true`
  * for HLL partial aggregation with no Expand (the q46 trade, stated per
  * use, not globally).
  *
  * min/max are rendered as strings so heterogeneous column types share
  * one long-form schema — profiling output is a catalog artifact, not an
  * arithmetic input. */
object Profile {

  /** Long-form profile of `cols`: (column, n_nulls, n_distinct, min_str,
    * max_str) + a `n_rows` column repeated per row. */
  def columnProfile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    def oneCol(c: String): Column = struct(
      lit(c).as("column"),
      count_if(col(c).isNull).as("n_nulls"),
      (if (approxDistinct) approx_count_distinct(col(c))
       else count_distinct(col(c))).as("n_distinct"),
      min(col(c)).cast("string").as("min_str"),
      max(col(c)).cast("string").as("max_str"))
    df.agg(count(lit(1)).as("n_rows"),
        array(cols.map(oneCol): _*).as("profiles"))
      .select(col("n_rows"), explode(col("profiles")).as("p"))
      .select(col("p.column"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
  }
}
