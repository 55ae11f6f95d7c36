package graft.table

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Paths}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Per-base-file bloom filters over record keys — the reference's bloom
 * index / BLOOM_FILTERS metadata partition (ref: hudi-common/src/main/java/
 * org/apache/hudi/metadata/HoodieTableMetadataUtil.java, hudi-client-common
 * .../index/bloom/HoodieBloomIndex.java).
 *
 * Each base file gets a `<path>.bloom` sidecar written by the same
 * distributed job that reads back the file's key column after staging.
 * Key-range pruning degrades to scan-everything when keys are uniformly
 * distributed across file groups (hash assignment makes every file's
 * [min,max] span the whole key space); blooms stay selective there —
 * candidateSlices consults them after range pruning, in the executors,
 * with no false negatives (every written key is in its file's filter).
 */
object KeyBloom {
  /** 1% false positives ≈ 9.6 bits/key — a 1M-row file costs ~1.2 MB. */
  val Fpp = 0.01

  def sidecar(rel: String): String = rel + ".bloom"

  def build(keys: Array[String]): Array[Byte] = {
    val bf = BloomFilter.create(math.max(64L, keys.length.toLong), Fpp)
    keys.foreach(bf.putString)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** None = sidecar missing/corrupt → caller keeps the file as a candidate
    * (pruning must stay conservative). */
  def load(basePath: String, rel: String): Option[BloomFilter] =
    try {
      val p = Paths.get(basePath, sidecar(rel))
      if (!Files.isRegularFile(p)) None
      else Some(BloomFilter.readFrom(new ByteArrayInputStream(Files.readAllBytes(p))))
    } catch { case _: Exception => None }
}
