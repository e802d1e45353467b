package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.RollingHashExpression

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to plain SQL. Install at build time
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`), or on a live session via
  * [[GraftExtensions.register]].
  *
  * Registered functions:
  *  - `rolling_hash(str[, prime])` → LONG polynomial fingerprint
  *    (graft.functions.RollingHashExpression, codegen'd).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def rollingHashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => RollingHashExpression(c, RollingHashExpression.DefaultPrime)
    case Seq(c, p) if p.foldable =>
      RollingHashExpression(c, p.eval().asInstanceOf[Number].longValue())
    case _ => throw new IllegalArgumentException(
      "rolling_hash(str[, prime]) takes 1 or 2 arguments (prime must be a literal)")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpression].getName, "rolling_hash"),
      rollingHashBuilder))

  /** Register on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
