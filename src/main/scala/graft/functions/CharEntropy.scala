package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character-level Shannon entropy (bits/char) — the cheap "is this text or
 * noise" quality signal every web-corpus filter runs: natural language sits
 * around 3.5-4.5 bits/char, base64 blobs and minified JS near 6, repeated
 * boilerplate ("aaaa…", padded tables) near 0. Gopher-style pipelines gate
 * on it alongside word statistics (ref: the reference's quality-filter
 * family; Rae et al. 2021 App. A uses the same signal class).
 *
 * A native kernel, not an explode+groupBy: per-row counts over a codepoint
 * map, then one fold in ASCENDING CODEPOINT ORDER — the fixed summation
 * order makes the double bit-stable at any parallelism, so a driver-side
 * oracle can restate it exactly (the spec replays the identical fold).
 */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.eval($c.toString())")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CharEntropy {
  private final val LN2 = math.log(2.0)

  /** Entropy in bits per UTF-16 code unit; 0.0 for the empty string.
    * Counts fold in ascending char order so the summation order — and
    * therefore every double ULP — is a pure function of the multiset. */
  def eval(s: String): Double = {
    val n = s.length
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Char, Integer]()
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val prev = counts.get(c)
      counts.put(c, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * (math.log(p) / LN2)
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(c)))
}
