package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Karp–Rabin rolling-hash document fingerprint —
 * the minimum of a 64-bit polynomial hash over every `window`-char sliding
 * window (single-fingerprint winnowing). Stays inside whole-stage codegen
 * (doGenCode emits a static call, no UDF serialization / row boxing).
 * Used for cheap near-identical document detection at corpus scale.
 */
case class RollingFingerprintExpr(child: Expression, window: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(window >= 1, s"fingerprint window must be >= 1, got $window")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.eval(input.asInstanceOf[UTF8String].toString, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprint.eval($c.toString(), $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  private final val B = 1099511628211L // FNV prime as polynomial base

  /** Mix step (splitmix64 finalizer) so near-identical windows spread. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def eval(s: String, w: Int): Long = {
    val n = s.length
    if (n == 0) return 0L
    if (n < w) { // short doc: hash the whole string
      var h = 0L; var i = 0
      while (i < n) { h = h * B + s.charAt(i); i += 1 }
      return mix(h)
    }
    var powW = 1L
    var i = 0
    while (i < w) { powW *= B; i += 1 }
    var h = 0L
    var minH = Long.MaxValue
    var j = 0
    while (j < n) {
      h = h * B + s.charAt(j)
      if (j >= w) h -= powW * s.charAt(j - w)
      if (j >= w - 1) { val m = mix(h); if (m < minH) minH = m }
      j += 1
    }
    minH
  }

  /** Column API: `rolling_fingerprint($"text", 16)`. */
  def apply(c: Column, window: Int = 16): Column =
    ColumnBridge.column(RollingFingerprintExpr(ColumnBridge.expression(c), window))
}
