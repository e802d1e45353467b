package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation — the mitigation for power-law group keys
  * (the "one endpoint is 40% of traffic" shape every log corpus has).
  *
  * A plain `groupBy(key)` sends ALL rows of a hot key through one reducer:
  * at 100 TB a single skewed key can hold a stage hostage for hours. The
  * salted form splits each key into `numSalts` subkeys for the partial
  * phase (spreading the hot key over `numSalts` reducers), then merges the
  * tiny per-salt partials in a second, cheap shuffle. The result is
  * IDENTICAL for any algebraic aggregate (sum/count/min/max and anything
  * composed from them, e.g. avg = sum/count — asserted in the spec);
  * non-decomposable aggregates (exact percentile, countDistinct) must not
  * use this path.
  *
  * The salt is derived from `monotonically_increasing_id()` — which rows
  * land on which salt varies with partitioning, but salt-invariance of the
  * merge makes the RESULT deterministic regardless.
  *
  * (AQE's skew-join handling covers JOINS at runtime; aggregation skew
  * still wants the explicit two-phase form.) */
object SkewSalt {

  /** Aggregate spec: how to compute the partial and how to merge partials.
    * NB: floating-point `sum` is order-dependent, and salting reorders the
    * reduction — cast to DECIMAL first when a salted sum must be exact
    * (count/min/max are order-free). */
  final case class Agg(partial: Column => Column, merge: Column => Column)
  object Agg {
    def sum: Agg = Agg(c => functions.sum(c), c => functions.sum(c))
    def count: Agg = Agg(c => functions.count(c), c => functions.sum(c))
    def min: Agg = Agg(c => functions.min(c), c => functions.min(c))
    def max: Agg = Agg(c => functions.max(c), c => functions.max(c))
    private val functions = org.apache.spark.sql.functions
  }

  /** `groupBy(keyCols).agg(...)` with a salted partial phase.
    *
    * @param aggs  (outputName, inputCol, spec) triples */
  def saltedAgg(
      df: DataFrame, keyCols: Seq[String],
      aggs: Seq[(String, String, Agg)], numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("skew_salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
    val partialCols = aggs.map { case (name, in, a) => a.partial(col(in)).as(s"p_$name") }
    val partials = salted
      .groupBy((keyCols :+ "skew_salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.map { case (name, _, a) => a.merge(col(s"p_$name")).as(name) }
    partials
      .groupBy(keyCols.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Salted inner equi-join for a skewed FACT key against a medium build
    * side that is too large to broadcast: the fact side spreads each key
    * over `numSalts` subkeys, the build side is replicated once per salt,
    * and the join runs on (key, salt) — so a hot key's rows land on
    * `numSalts` reducers instead of one.
    *
    * The salt comes from `monotonically_increasing_id()` (nondeterministic
    * across repartitions), but every fact row still meets exactly the one
    * build replica carrying its salt, so the JOIN RESULT is identical to
    * the unsalted join regardless of salt assignment (asserted in the
    * spec and by q65's plain-join oracle).
    *
    * Cost model: replicates the build side `numSalts`× through the
    * shuffle — worth it only when build ≪ fact (else prefer AQE's
    * runtime skew-join splitting, which this operator makes explicit). */
  def saltedJoin(
      fact: DataFrame, build: DataFrame,
      factKey: String, buildKey: String, numSalts: Int = 8): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val saltedFact = fact.withColumn("skew_salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
    // shuffle_hash on the build side: the operator's contract is
    // build ≪ fact, so each task's hash table stays small and the join
    // skips BOTH sides' sorts — measured ~2× over sort-merge at sf0.1
    // (tools/SaltedJoinAb). Degenerate contract violations (huge build)
    // should use AQE skew-join instead of this operator anyway.
    val replicated = build.withColumn("skew_salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
      .hint("shuffle_hash")
    saltedFact
      .join(replicated,
        saltedFact(factKey) === replicated(buildKey) &&
          saltedFact("skew_salt") === replicated("skew_salt"))
      .drop("skew_salt")
  }
}
