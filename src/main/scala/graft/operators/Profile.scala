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

  /** Shuffle-key skew profile for one (table, key): row count, distinct
    * keys, the heaviest key's row count, and its share of the table —
    * the numbers that predict whether a join/aggregate on this key needs
    * salting (operators/SkewSalt) before it ships to a cluster. Two
    * aggregates (per-key counts with map-side partials, then one summary
    * row); `top_share` is one exact-int IEEE division. */
  def keySkew(df: DataFrame, label: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_per_key"))
      .select(lit(label).as("profiled_key"), col("n_rows"),
        col("n_distinct"), col("max_per_key"),
        (col("max_per_key").cast("double") / col("n_rows").cast("double"))
          .as("top_share"))
}
