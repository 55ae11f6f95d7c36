package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/**
 * Native Catalyst kernels for the PQ/ADC chain (SURVEY.md §2.3 — the
 * IVF-PQ ANN family). The previous formulation composed higher-order
 * functions (`transform` / `zip_with` / `aggregate`) over codebooks inlined
 * as LITERAL array columns: every one of those lambdas evaluates
 * interpreted (no whole-stage codegen), allocates an intermediate array
 * per row, and the literal trees (m·ksub·dsub floats) bloated every plan.
 * These expressions carry the trained matrices as plan-time reference
 * objects (the [[NearestCentroidsExpr]] pattern — shipped to executors
 * once via task serialization) and run tight JVM loops.
 *
 * BIT-IDENTICAL arithmetic to the higher-order formulation they replace:
 * the same (double) cast points, the same left-to-right accumulation
 * order, the same strict-> tie-break as [[NearestCentroidsExpr.assign]] —
 * so persisted codes, ADC scores and recall pins do not move.
 */
object PqExprs {

  /** out[i] = (float)((double) v[i] / ‖v‖₂); a zero-norm vector passes
    * through unchanged (the `when(normF === 0)` branch it replaces). */
  case class L2NormalizeExpr(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(FloatType)
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))

    def kernel(a: ArrayData): ArrayData = {
      val n = a.numElements()
      var s = 0.0; var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) { val v = a.getFloat(i).toDouble; s += v * v }
        i += 1
      }
      val norm = math.sqrt(s)
      if (norm == 0.0) return a
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null
                 else (a.getFloat(i).toDouble / norm).toFloat
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(a: Any): Any =
      kernel(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("l2n", this, classOf[L2NormalizeExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** res[i] = vec[i] - coarse(cid)[i] (float subtraction — the
    * `zip_with(vec, cent, a - b)` it replaces; the longer side's excess
    * positions go null exactly like zip_with's padding). */
  case class ResidualExpr(left: Expression, right: Expression,
      coarse: Array[Array[Float]])
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(FloatType)
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), IntegerType)

    def kernel(a: ArrayData, cid: Int): ArrayData = {
      val cv = coarse(cid)
      val n1 = a.numElements(); val n2 = cv.length
      val n = math.max(n1, n2)
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (i >= n1 || i >= n2 || a.isNullAt(i)) null
                 else a.getFloat(i) - cv(i)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(a: Any, c: Any): Any =
      kernel(a.asInstanceOf[ArrayData], c.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("resE", this, classOf[ResidualExpr].getName)
      nullSafeCodeGen(ctx, ev, (a, c) => s"${ev.value} = $ref.kernel($a, $c);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** q · coarse(cid): Σ_i (double) q[i] * (double) c[i], left to right —
    * the `aggregate(zip_with(...))` it replaces. */
  case class QDotCentroidExpr(left: Expression, right: Expression,
      coarse: Array[Array[Float]])
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), IntegerType)

    def kernel(a: ArrayData, cid: Int): Double = {
      val cv = coarse(cid)
      val n = math.min(a.numElements(), cv.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
      s
    }

    override protected def nullSafeEval(a: Any, c: Any): Any =
      kernel(a.asInstanceOf[ArrayData], c.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("qdc", this, classOf[QDotCentroidExpr].getName)
      nullSafeCodeGen(ctx, ev, (a, c) => s"${ev.value} = $ref.kernel($a, $c);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** The m PQ sub-codes of one (residual or raw) vector: per subspace,
    * the nearest codebook cell by the EXACT scoring loop of
    * [[NearestCentroidsExpr.assign]] (dot · 1/‖cell‖, strict-> keeps the
    * lower cell id on ties) over the vector's `dsub` slice — the
    * per-subspace `nearestCentroids(slice(...))` chain it replaces,
    * without materializing the slices. */
  case class PqCodesExpr(child: Expression, books: Array[Array[Array[Float]]])
      extends UnaryExpression with ImplicitCastInputTypes {
    // containsNull = true: the CreateArray formulation this replaces was
    // nullable-element, and the persisted codes tables carry that schema —
    // a non-nullable element type here would make every upsert's conform
    // cast fail against an existing table
    override def dataType: DataType = ArrayType(IntegerType)
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))

    @transient private lazy val invNorm: Array[Array[Double]] =
      books.map(_.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
        if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
      })

    def kernel(a: ArrayData): ArrayData = {
      val m = books.length
      val dsub = books(0)(0).length
      val dim = a.numElements()
      val out = new Array[Any](m)
      var s = 0; var best = 0
      while (s < m) {
        val base = s * dsub
        // slice(vec, base+1, dsub) yields the positions [base, base+dsub)
        // clipped to the array end — the dot loop below runs over exactly
        // those positions, like assign() over the materialized slice
        val sliceLen = math.max(0, math.min(dsub, dim - base))
        val book = books(s)
        var bestScore = Double.NegativeInfinity
        best = 0
        var c = 0
        while (c < book.length) {
          val cv = book(c)
          val n = math.min(sliceLen, cv.length)
          var dot = 0.0; var i = 0
          while (i < n) { dot += a.getFloat(base + i).toDouble * cv(i).toDouble; i += 1 }
          val score = dot * invNorm(s)(c)
          if (score > bestScore) { bestScore = score; best = c }
          c += 1
        }
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(a: Any): Any =
      kernel(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqc", this, classOf[PqCodesExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** The per-query ADC lookup tables as ONE array<array<double>> column:
    * out[s][c] = Σ_i (double) q[s·dsub+i] * (double) book[s][c][i] —
    * the per-subspace `transform(bookLit, aggregate(zip_with(slice…)))`
    * columns it replaces, same slice clipping, same accumulation order. */
  case class AdcTablesExpr(child: Expression, books: Array[Array[Array[Float]]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))

    def kernel(a: ArrayData): ArrayData = {
      val m = books.length
      val dsub = books(0)(0).length
      val dim = a.numElements()
      val out = new Array[Any](m)
      var s = 0
      while (s < m) {
        val base = s * dsub
        val sliceLen = math.max(0, math.min(dsub, dim - base))
        val book = books(s)
        val tab = new Array[Any](book.length)
        var c = 0
        while (c < book.length) {
          val cv = book(c)
          val n = math.min(sliceLen, cv.length)
          var dot = 0.0; var i = 0
          while (i < n) { dot += a.getFloat(base + i).toDouble * cv(i).toDouble; i += 1 }
          tab(c) = dot
          c += 1
        }
        out(s) = new GenericArrayData(tab)
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(a: Any): Any =
      kernel(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("adct", this, classOf[AdcTablesExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** ADC score: Σ_s tables[s][codes[s]], left to right — the
    * `element_at(_t_s, codes[s]+1)` chain it replaces. */
  case class AdcScoreExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] = Seq(
      ArrayType(IntegerType),
      ArrayType(ArrayType(DoubleType)))

    def kernel(codes: ArrayData, tables: ArrayData): Double = {
      val m = math.min(codes.numElements(), tables.numElements())
      var s = 0.0; var i = 0
      while (i < m) {
        s += tables.getArray(i).getDouble(codes.getInt(i))
        i += 1
      }
      s
    }

    override protected def nullSafeEval(c: Any, t: Any): Any =
      kernel(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("adcs", this, classOf[AdcScoreExpr].getName)
      nullSafeCodeGen(ctx, ev, (c, t) => s"${ev.value} = $ref.kernel($c, $t);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Squared PQ reconstruction error decoded from ALREADY-assigned codes:
    * Σ_s Σ_i ((double) res[s·dsub+i] − (double) book[s][codes[s]][i])². */
  case class PqSqErrorFromCodesExpr(left: Expression, right: Expression,
      books: Array[Array[Array[Float]]])
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), ArrayType(IntegerType))

    def kernel(res: ArrayData, codes: ArrayData): Double = {
      val m = books.length
      val dsub = books(0)(0).length
      val dim = res.numElements()
      var tot = 0.0; var s = 0
      while (s < m) {
        val base = s * dsub
        val sliceLen = math.max(0, math.min(dsub, dim - base))
        val cv = books(s)(codes.getInt(s))
        val n = math.min(sliceLen, cv.length)
        var i = 0
        while (i < n) {
          val d = res.getFloat(base + i).toDouble - cv(i).toDouble
          tot += d * d
          i += 1
        }
        s += 1
      }
      tot
    }

    override protected def nullSafeEval(r: Any, c: Any): Any =
      kernel(r.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqe", this, classOf[PqSqErrorFromCodesExpr].getName)
      nullSafeCodeGen(ctx, ev, (r, c) => s"${ev.value} = $ref.kernel($r, $c);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def l2normalize(vec: Column): Column =
    ColumnBridge.column(L2NormalizeExpr(ColumnBridge.expression(vec)))
  def residual(vec: Column, cid: Column, coarse: Array[Array[Float]]): Column =
    ColumnBridge.column(ResidualExpr(ColumnBridge.expression(vec),
      ColumnBridge.expression(cid), coarse))
  def qDotCentroid(vec: Column, cid: Column, coarse: Array[Array[Float]]): Column =
    ColumnBridge.column(QDotCentroidExpr(ColumnBridge.expression(vec),
      ColumnBridge.expression(cid), coarse))
  def pqCodes(vec: Column, books: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqCodesExpr(ColumnBridge.expression(vec), books))
  def adcTables(vec: Column, books: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(AdcTablesExpr(ColumnBridge.expression(vec), books))
  def adcScore(codes: Column, tables: Column): Column =
    ColumnBridge.column(AdcScoreExpr(ColumnBridge.expression(codes),
      ColumnBridge.expression(tables)))
  def pqSqErrorFromCodes(res: Column, codes: Column,
      books: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqSqErrorFromCodesExpr(ColumnBridge.expression(res),
      ColumnBridge.expression(codes), books))
}
