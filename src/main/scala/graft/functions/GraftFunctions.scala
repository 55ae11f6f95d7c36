package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/**
 * SQL registration of the native Graft kernels, so `spark.sql` users call
 * them like built-ins (the reference exposes its engine functions through
 * its SQL layer the same way; ref: hudi-spark-datasource
 * .../HoodieSpark3SessionExtension registering Hudi analysis rules):
 *
 *  - `graft_dot(a, b)`       float-vector dot product (double)
 *  - `graft_norm(a)`         float-vector L2 norm (double)
 *  - `graft_simhash64(s)`    64-bit SimHash of whitespace tokens
 *  - `graft_shingle_hashes(s, n)`  distinct hashed word n-gram shingles
 *  - `graft_fingerprint(s, w)`     rolling-hash document fingerprint
 *
 * Two entry points, same registry entries:
 *  - `spark.sql.extensions=graft.functions.GraftExtensions` (or
 *    `.withExtensions(new GraftExtensions)`) at session build;
 *  - `GraftFunctions.register(spark)` on a live session.
 */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$name requires $n argument(s), got ${args.length}")
      b(args)
    }

  /** (name, usage, builder) for every SQL-exposed kernel. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - dot product of two float arrays",
      arity("graft_dot", 2)(args => FloatDotExpr(args(0), args(1)))),
    ("graft_norm", "graft_norm(a) - L2 norm of a float array",
      arity("graft_norm", 1)(args => FloatNormExpr(args(0)))),
    ("graft_simhash64", "graft_simhash64(s) - 64-bit simhash of the text",
      arity("graft_simhash64", 1)(args => Simhash64Expr(args(0)))),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(s, n) - distinct hashed word n-gram shingles",
      arity("graft_shingle_hashes", 2)(args =>
        ShingleHashesExpr(args(0), litInt(args(1), "shingle size n")))),
    ("graft_fingerprint",
      "graft_fingerprint(s, w) - rolling-hash fingerprint with window w",
      arity("graft_fingerprint", 2)(args =>
        RollingFingerprintExpr(args(0), litInt(args(1), "window w")))),
    ("graft_char_entropy",
      "graft_char_entropy(s) - Shannon entropy of the text in bits/char",
      arity("graft_char_entropy", 1)(args => CharEntropyExpr(args(0)))))

  private def entry(name: String, usage: String,
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (n, u, b) =>
      val (id, inf, bld) = entry(n, u, b)
      spark.sessionState.functionRegistry.registerFunction(id, inf, bld)
    }
}

/** `spark.sql.extensions` entry point: the kernel functions plus the SQL
  * DML rule (MERGE INTO / UPDATE / DELETE / INSERT on catalog-identified
  * graft tables — see graft.catalog.GraftDmlRule). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (n, u, b) =>
      ext.injectFunction((FunctionIdentifier(n),
        new ExpressionInfo("graft", null, n, u, ""), b))
    }
    ext.injectPostHocResolutionRule(sp => new graft.catalog.GraftDmlRule(sp))
  }
}
