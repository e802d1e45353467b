package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax sampling (Chung et al., ICLR 2023): allocate a total training
  * token budget across sources as UNIFORMLY as possible, subject to a
  * per-source repeat cap — the data-mixing policy that replaced
  * temperature sampling for large multilingual corpora (temperature
  * over-samples head domains and over-repeats tail ones; UniMax gives
  * every source the same share until a source would exceed `epochCap`
  * epochs of its own data, then redistributes the excess).
  *
  * This is exact water-filling: `alloc_s = min(cap_s, θ)` with θ chosen so
  * `Σ alloc_s = B`. With caps sorted ascending the θ search is a window
  * scan — source i is capped iff `cap_i·(n−i+1) + prefix_{i−1} ≤ B`
  * (monotone in i), and every uncapped source splits the post-cap
  * remainder evenly.
  *
  * Scale shape: the ONLY corpus-scale work is the per-source token-count
  * aggregate (one map-combined shuffle, ≤|sources| rows out). The
  * water-fill itself runs on that bounded table — the single-partition
  * windows below are over ≤|sources| rows BY CONSTRUCTION, never the
  * corpus. All arithmetic is integer-exact (budget = `budgetNum/budgetDen`
  * of total by integer division; allocations floor-divided, the ≤(n−1)-token
  * remainder reported in `unallocated`), so results are engine- and
  * partitioning-independent.
  */
object UniMax {

  /** Water-fill `perSource` (srcCol, tokCol) into per-source allocations.
    * Output: (source, n_tokens, cap, allocated, epochs, unallocated) —
    * `epochs = allocated / n_tokens` as double, `unallocated` the global
    * floor-division remainder (same value on every row). */
  def epochAllocations(perSource: DataFrame, srcCol: String, tokCol: String,
      epochCap: Int, budgetNum: Long, budgetDen: Long): DataFrame = {
    require(epochCap > 0 && budgetNum > 0 && budgetDen > 0)
    require(budgetNum.toDouble / budgetDen < epochCap,
      s"budget $budgetNum/$budgetDen of the corpus with cap $epochCap " +
        "epochs could cap every source; water-filling needs at least one " +
        "uncapped source (budget < cap x corpus)")
    // windows over the <=|sources|-row aggregate — bounded by design
    val byCap = Window.orderBy(col("cap"), col(srcCol))
    val all = Window.partitionBy(lit(1))
    val capped = perSource
      .withColumn("cap", col(tokCol) * epochCap)
      // integer floor division (`DIV`, not `/` which widens to double and
      // loses exactness past 2^53 — a 100 TB corpus is ~2^44 tokens)
      .withColumn("b",
        expr(s"(sum(cast($tokCol as bigint)) over () * ${budgetNum}L) " +
          s"DIV ${budgetDen}L"))
      .withColumn("i", row_number().over(byCap))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("prefix", sum(col("cap")).over(
        byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_capped",
        col("cap") * (col("n") - col("i") + 1) +
          (col("prefix") - col("cap")) <= col("b"))
    val filled = capped
      .withColumn("k", coalesce(
        max(when(col("is_capped"), col("i"))).over(all), lit(0L)))
      .withColumn("prefix_k", coalesce(
        max(when(col("is_capped"), col("prefix"))).over(all), lit(0L)))
      .withColumn("share",
        expr("(b - prefix_k) DIV greatest(n - k, 1)"))
      .withColumn("allocated",
        when(col("is_capped"), col("cap")).otherwise(col("share")))
    filled.select(
        col(srcCol),
        col(tokCol).as("n_tokens"),
        col("cap"),
        col("allocated"),
        (col("allocated").cast("double") / col(tokCol).cast("double"))
          .as("epochs"),
        (col("b") - (sum(col("allocated")).over(all))).as("unallocated"))
      .orderBy(col(srcCol))
  }
}
