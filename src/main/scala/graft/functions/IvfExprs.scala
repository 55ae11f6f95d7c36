package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/**
 * IVF coarse quantization: map an `array<float>` embedding to the ids of its
 * `nprobe` nearest centroids by cosine (ref: the inverted-file ANN layout of
 * Faiss/IVF; the reference engine has no ANN index — this is a
 * beyond-reference training-pipeline operator, SURVEY.md §2.3).
 *
 * The centroid matrix is a plan-time constant carried inside the expression
 * node (it is small — nlist ≤ 4096 × dim floats — and shipped to executors
 * once via task serialization, like a broadcast). Codegen emits a single
 * virtual call into [[assign]] per row: the O(nlist·dim) scoring loop stays
 * in tight JVM code, rows stay inside whole-stage codegen, and no
 * per-row allocation happens beyond the tiny result array.
 */
case class NearestCentroidsExpr(child: Expression,
    centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nprobe >= 1 && nprobe <= centroids.length,
    s"nprobe must be in [1, ${centroids.length}]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))

  // precomputed inverse norms: ranking by cosine = ranking by dot / ||c||
  // (the query-side norm is a common positive factor)
  @transient private lazy val invNorm: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
  }

  /** Top-`nprobe` centroid ids by cosine, best first; ties break on the
    * lower centroid id (deterministic across runs and engines). */
  def assign(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val bestId = new Array[Int](nprobe)
    val bestScore = new Array[Double](nprobe)
    java.util.Arrays.fill(bestScore, Double.NegativeInfinity)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(dim, cv.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
      val score = dot * invNorm(c)
      // strict > keeps the earlier (lower-id) centroid on exact ties
      if (score > bestScore(nprobe - 1)) {
        var j = nprobe - 1
        while (j > 0 && bestScore(j - 1) < score) {
          bestScore(j) = bestScore(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestScore(j) = score; bestId(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestId.map(Integer.valueOf(_).asInstanceOf[Any]))
  }

  override protected def nullSafeEval(a: Any): Any =
    assign(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfExpr", this, classOf[NearestCentroidsExpr].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.assign($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfExprs {
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    ColumnBridge.column(
      NearestCentroidsExpr(ColumnBridge.expression(vec), centroids, nprobe))
}
