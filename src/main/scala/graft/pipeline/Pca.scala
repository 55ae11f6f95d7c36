package graft.pipeline

import org.apache.spark.ml.feature.{PCA => MlPca}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PCA dimensionality reduction for embedding columns — the data-dependent
 * counterpart of [[Projection]]'s oblivious JL sign matrix: when the corpus
 * is available ahead of time, d→k PCA preserves more variance at the same k
 * (whitening / compaction before clustering, IVF coarse quantizers, or
 * cheap near-dup cosine).
 *
 * Built on Spark ML's estimator (public API, Gramian-based): the fit is ONE
 * distributed pass accumulating the d×d Gramian via treeAggregate — O(d²)
 * driver memory, never O(n) — followed by a driver-side eigendecomposition;
 * the transform is a per-row mat-vec that broadcasts the d×k basis. At
 * 100 TB both stages are corpus-linear with metadata-sized driver state
 * (d ≤ a few thousand for any real embedding column).
 *
 * Eigenvector SIGN is basis-dependent (±v both valid), so results are
 * canonicalized: each component is flipped so its largest-magnitude
 * coordinate is positive — making the output a pure function of the data,
 * restatable by an external implementation. Declared rows-only for the
 * driver oracle; PcaSpec pins orthonormality, non-increasing explained
 * variance, planted-direction recovery, and exact Gram reconstruction.
 */
object Pca {

  private def fit(vecs: DataFrame, k: Int, vecCol: String) = {
    val withVec = vecs.withColumn("_v",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new MlPca().setInputCol("_v").setOutputCol("_p").setK(k)
      .fit(withVec)
    // sign canonicalization: flip each principal component so its
    // largest-|coordinate| entry is positive (first index wins ties)
    val pc = model.pc // d x k, column-major
    val d = pc.numRows
    val flip = Array.tabulate(k) { j =>
      var arg = 0
      var best = 0.0
      var i = 0
      while (i < d) {
        val a = math.abs(pc(i, j))
        if (a > best) { best = a; arg = i }
        i += 1
      }
      if (pc(arg, j) < 0) -1.0 else 1.0
    }
    (withVec, model, flip)
  }

  /** Fit PCA(k) on `vecCol` (array<float>) and project every row.
    * Returns (idCol, projected array<double> of length k). */
  def project(vecs: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (withVec, model, flip) = fit(vecs, k, vecCol)
    val signs = array(flip.map(lit): _*)
    model.transform(withVec)
      .select(col(idCol),
        zip_with(vector_to_array(col("_p")), signs, (x, s) => x * s)
          .as("projected"))
  }

  /** The fitted, sign-canonicalized basis itself (specs / export):
    * (k components of length d, explained variance per component). */
  def basis(vecs: DataFrame, k: Int, vecCol: String = "embedding")
      : (Array[Array[Double]], Array[Double]) = {
    val (_, model, flip) = fit(vecs, k, vecCol)
    val pc = model.pc
    val comps = Array.tabulate(k)(j =>
      Array.tabulate(pc.numRows)(i => pc(i, j) * flip(j)))
    (comps, model.explainedVariance.toArray)
  }
}
