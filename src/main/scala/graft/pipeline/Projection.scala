package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Random-projection dimensionality reduction for embedding columns — the
 * Johnson-Lindenstrauss step a 100 TB pipeline runs before clustering or
 * coarse ANN when the native dimension is too wide (Achlioptas 2003
 * "Database-friendly random projections": ±1 sign matrices preserve
 * pairwise distances as well as Gaussian ones and need no float matrix).
 *
 * The sign matrix is derived from md5 parity, so it is a pure function of
 * (i, j): every executor — and the external oracle — states the identical
 * matrix with no broadcast and no RNG state. Values are quantized to
 * integer micro-units BEFORE the sum, so the projection is exact integer
 * arithmetic, bit-stable at any parallelism.
 *
 * Plan shape: dim·k literal signs fold into one codegen'd projection per
 * row (zip_with + aggregate) — no explode, no join, no shuffle; the only
 * exchange is whatever the caller does with the result.
 */
object Projection {

  /** +1 when the first hex digit of md5("i_j") is even (the DuckDB twin
    * states `substr(md5(i||'_'||j),1,1) IN ('0','2','4','6','8','a','c','e')`). */
  private[pipeline] def sign(i: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_${j}".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1L else -1L
  }

  /** Project `vecCol` (array<float>, uniform dimension) to `k` integer
    * components: out_j = Σ_i sign(i,j) · round(v_i · 1e6). Returns one row
    * per (id, j) with the component value, ready for downstream groupBys.
    * `dim` is read from one aggregate over the corpus (metadata-sized). */
  def signProject(vecs: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = vecs.agg(max(size(col(vecCol)))).head().getInt(0)
    val comps = (0 until k).map { j =>
      val signs = array((0 until dim).map(i => lit(sign(i, j))): _*)
      aggregate(
        zip_with(col(vecCol), signs,
          (v, s) => s * round(v.cast("double") * 1000000.0).cast("long")),
        lit(0L), (acc, x) => acc + x)
    }
    vecs.select(col(idCol), posexplode(array(comps: _*)).as(Seq("j", "proj")))
  }
}
