package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar (int8-style) embedding quantization — the standard storage/ANN
 * compression step in a training-data pipeline: each dimension is affinely
 * mapped to [0, 255] using corpus-wide per-dimension min/max, shrinking an
 * `array<float>` index 4× and making distance kernels integer-SIMD-able.
 *
 * Calibration is one distributed pass (posexplode → per-dimension min/max
 * — a `dim`-row aggregate, map-side combined); the codes are then a pure
 * map with the calibration vector inlined as a literal array (broadcast-
 * like, no join, stays in whole-stage codegen). Deterministic: no sampling,
 * ties don't exist in min/max.
 */
object Quantize {

  /** Per-dimension (min, max) over the corpus, index order. */
  def calibrate(vecs: DataFrame, vecCol: String = "embedding"): Array[(Double, Double)] =
    vecs.select(posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy("i").agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .orderBy("i").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  /** Adds a `codes` column: `array<int>` of 0..255 per-dimension codes
    * (round((v - min_d) * 255 / (max_d - min_d)); constant dims code to 0). */
  def quantizeInt8(vecs: DataFrame, calib: Array[(Double, Double)],
      vecCol: String = "embedding"): DataFrame = {
    val mns = array(calib.map(c => lit(c._1)): _*)
    val rngs = array(calib.map(c => lit(c._2 - c._1)): _*)
    vecs.withColumn("codes", transform(col(vecCol), (v, i) => {
      val rng = element_at(rngs, i + 1)
      when(rng === 0.0, lit(0))
        .otherwise(round((v.cast("double") - element_at(mns, i + 1)) * 255.0 / rng)
          .cast("int"))
    }))
  }

  /** Dequantize `codes` back to doubles (midpoint-free affine inverse). */
  def dequantize(df: DataFrame, calib: Array[(Double, Double)],
      codesCol: String = "codes"): Column = {
    val mns = array(calib.map(c => lit(c._1)): _*)
    val rngs = array(calib.map(c => lit(c._2 - c._1)): _*)
    transform(col(codesCol), (q, i) =>
      q.cast("double") * element_at(rngs, i + 1) / 255.0 + element_at(mns, i + 1))
  }
}
