package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ-style check
  * report): each check reduces a table to ONE violation count, the suite
  * unions the counts into a (check, violations, passed) report. The
  * contract "observed = number of violating rows, passed = observed 0"
  * keeps every check an exact integer — the report is engine-exact and
  * cheap to alert on.
  *
  * Scale shape: each check is a single aggregate over its table (or an
  * anti-join count for referential checks) — one pass per check, no
  * check ever collects rows. Checks against the same table can share a
  * scan via [[violations]] with several conditions at once. */
object Constraints {

  /** Violation-count rows, one per (name, condition) over `df` — a
    * single aggregate pass however many conditions are given. Built from
    * typed Columns end to end, so a check name is DATA, never SQL text —
    * names with quotes/spaces/hyphens can't break parsing or inject. */
  def violations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val pairs = checks.map { case (n, cond) =>
      struct(lit(n).as("check_name"), count_if(cond).as("violations"))
    }
    df.agg(array(pairs: _*).as("a"))
      .select(explode(col("a")).as("s"))
      .select(col("s.check_name"), col("s.violations"))
  }

  /** Uniqueness violations: rows beyond one per key. */
  def uniqueness(df: DataFrame, name: String, keyCol: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(keyCol))).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Referential violations: child rows whose key has no parent. */
  def referential(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")).distinct(),
        Seq("k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations"))

  /** Union the check rows into the final report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("check_name"))
}
