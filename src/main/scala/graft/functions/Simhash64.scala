package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 64-bit SimHash kernel: one pass over the text — hash each word
 * (FNV-1a), vote ±1 per bit, sign of the vote vector is the hash. Replaces
 * an explode + 64-aggregate-column composition with a per-row expression
 * that stays inside whole-stage codegen.
 */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash64.eval($c.toString())")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Simhash64 {
  private final val P = 0x100000001b3L

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def eval(s: String): Long = {
    val votes = new Array[Int](64)
    var h = 0xcbf29ce484222325L
    var inWord = false
    var i = 0
    def vote(): Unit = {
      val m = mix(h)
      var b = 0
      while (b < 64) {
        if (((m >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (inWord) { vote(); h = 0xcbf29ce484222325L; inWord = false }
      } else { h = (h ^ c) * P; inWord = true }
      i += 1
    }
    if (inWord) vote()
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  def apply(c: Column): Column =
    ColumnBridge.column(Simhash64Expr(ColumnBridge.expression(c)))
}
