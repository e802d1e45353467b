package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarityExpression, HyperplaneBucketExpression, L2SqExpression, Md5RegisterExpression, Md5Word32Expression, MinHashSignatureExpression, MortonCodeExpression, PyRoundExpression, RollingHashExpression, SimHashExpression}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to plain SQL. Install at build time
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`), or on a live session via
  * [[GraftExtensions.register]].
  *
  * Registered functions:
  *  - `rolling_hash(str[, prime])` → LONG polynomial fingerprint
  *    (graft.functions.RollingHashExpression, codegen'd).
  *  - `minhash_sig(tokens[, numPerm[, shingleN]])` → ARRAY<LONG> MinHash
  *    signature of a token array (graft.functions
  *    .MinHashSignatureExpression, codegen'd, zero-shuffle).
  *  - `simhash(tokens)` → LONG 64-bit SimHash fingerprint of a token
  *    array (graft.functions.SimHashExpression, codegen'd, zero-shuffle).
  *  - `cosine_sim(a, b)` / `l2_sq(a, b)` → DOUBLE vector kernels over
  *    ARRAY<DOUBLE> embeddings; `hyperplane_bucket(emb, nPlanes)` → LONG
  *    LSH bucket (graft.functions.VectorExpressions, codegen'd).
  *  - `md5_register(key)` → INT packed HLL register pair reg*64+rho
  *    (the q119 sketch state in one digest pass)
  *  - `md5_word32(str)` → LONG first 32 md5 bits, unsigned (the
  *    engine-portable content-bucket key)
  *  - `morton_code(a, b)` → LONG z-curve interleave of two 16-bit bucket
  *    ordinals (graft.functions.MortonCodeExpression; the kernel of
  *    operators.ZOrder's clustered layout).
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

  private def intLit(e: Expression, what: String, min: Int,
      max: Int = Int.MaxValue): Int = {
    require(e.foldable, s"$what must be a literal")
    val v = e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got: $other")
    }
    require(v >= min && v <= max, s"$what must be in [$min, $max], got $v")
    v
  }

  private def minhashSigBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => MinHashSignatureExpression(c, 64, 3)
    case Seq(c, p) => MinHashSignatureExpression(c, intLit(p, "numPerm", 1), 3)
    case Seq(c, p, n) =>
      MinHashSignatureExpression(c, intLit(p, "numPerm", 1), intLit(n, "shingleN", 1))
    case _ => throw new IllegalArgumentException(
      "minhash_sig(tokens[, numPerm[, shingleN]]) takes 1-3 arguments")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpression].getName, "rolling_hash"),
      rollingHashBuilder),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSignatureExpression].getName, "minhash_sig"),
      minhashSigBuilder),
    ("simhash",
      new ExpressionInfo(classOf[SimHashExpression].getName, "simhash"),
      { args: Seq[Expression] =>
        require(args.length == 1, "simhash(tokens) takes exactly 1 argument")
        SimHashExpression(args.head)
      }),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSimilarityExpression].getName, "cosine_sim"),
      { args: Seq[Expression] =>
        require(args.length == 2, "cosine_sim(a, b) takes exactly 2 arguments")
        CosineSimilarityExpression(args.head, args(1))
      }),
    ("l2_sq",
      new ExpressionInfo(classOf[L2SqExpression].getName, "l2_sq"),
      { args: Seq[Expression] =>
        require(args.length == 2, "l2_sq(a, b) takes exactly 2 arguments")
        L2SqExpression(args.head, args(1))
      }),
    ("hyperplane_bucket",
      new ExpressionInfo(classOf[HyperplaneBucketExpression].getName, "hyperplane_bucket"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "hyperplane_bucket(emb, nPlanes) takes exactly 2 arguments")
        // 63-plane ceiling: bucket bits live in one Long, so plane p > 63
        // would wrap `1L << p` mod 64 and silently collide buckets
        HyperplaneBucketExpression(args.head, intLit(args(1), "nPlanes", 1, 63))
      }),
    ("morton_code",
      new ExpressionInfo(classOf[MortonCodeExpression].getName, "morton_code"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "morton_code(a, b) takes exactly 2 arguments (16-bit ordinals)")
        MortonCodeExpression(args.head, args(1))
      }),
    ("py_round",
      new ExpressionInfo(classOf[PyRoundExpression].getName, "py_round"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "py_round(x, scale) takes exactly 2 arguments (scale literal)")
        PyRoundExpression(args.head, intLit(args(1), "scale", 0, 18))
      }),
    ("md5_register",
      new ExpressionInfo(classOf[Md5RegisterExpression].getName, "md5_register"),
      { args: Seq[Expression] =>
        require(args.length == 1, "md5_register(key) takes exactly 1 argument")
        Md5RegisterExpression(args.head)
      }),
    ("md5_word32",
      new ExpressionInfo(classOf[Md5Word32Expression].getName, "md5_word32"),
      { args: Seq[Expression] =>
        require(args.length == 1, "md5_word32(str) takes exactly 1 argument")
        Md5Word32Expression(args.head)
      }))

  /** Register on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
