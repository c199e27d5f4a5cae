package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductExpr, MinHashSignatureExpr, RabinFingerprintExpr, ShingleHashesExpr, SimHash64Expr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same compiled operators as the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT shingle_hashes(lower(text), 3) FROM docs")
  * spark.sql("SELECT minhash_signature(shingle_hashes(text, 3), 32) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{boolArg, intArg}

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashesExpr(args.head, intArg(args(1), "shingle size k"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        MinHashSignatureExpr(args.head, intArg(args(1), "signature length n"))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("rabin_fingerprint"),
      new ExpressionInfo(classOf[RabinFingerprintExpr].getName, "rabin_fingerprint"),
      (args: Seq[Expression]) =>
        RabinFingerprintExpr(args.head, boolArg(args(1), "wordLevel"))))
    // band-join → interval-bucket equi-join rewrite (two-large-sides
    // scale path; see graft.plans.RangeJoinToBucket)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinToBucket())
    // strip BROADCAST hints from relations estimated past the cap
    // (explicit hints bypass autoBroadcastJoinThreshold; see
    // graft.plans.BroadcastGuardrail)
    ext.injectOptimizerRule(_ => graft.plans.BroadcastGuardrail())
  }
}

/** Same registrations for an already-running session (tests, REPL). */
object GraftExtensions {
  private[graft] def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private[graft] def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got: $other")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("shingle_hashes",
      args => ShingleHashesExpr(args.head, intArg(args(1), "shingle size k")),
      "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      args => MinHashSignatureExpr(args.head, intArg(args(1), "signature length n")),
      "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      args => DotProductExpr(args.head, args(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64Expr(args.head), "built-in")
    reg.createOrReplaceTempFunction("rabin_fingerprint",
      args => RabinFingerprintExpr(args.head, boolArg(args(1), "wordLevel")),
      "built-in")
  }
}
