package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst vector kernels over `array<float>` columns. The
 * higher-order-function composition (zip_with + aggregate) materializes an
 * intermediate array per pair — fatal in O(n²) similarity joins. These
 * expressions loop directly over ArrayData inside whole-stage codegen:
 * no allocation, no virtual calls in the hot loop. Accumulation is a
 * sequential double fold, bit-identical to the DuckDB oracle's list_sum.
 */
case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // declared input contract: getFloat() over e.g. array<double> bytes would
  // silently return garbage; the analyzer now casts or rejects instead
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class FloatNormExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExprs {
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def normF(a: Column): Column =
    ColumnBridge.column(FloatNormExpr(ColumnBridge.expression(a)))
}
