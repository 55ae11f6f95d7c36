package graft.pipeline

import graft.TestSpark
import graft.functions.CharEntropy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracles for the three rows-only round-9 operators: best-fit packing,
  * char entropy, PCA projection. */
class PackingPcaEntropySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ entropy

  test("char entropy matches an exact driver-side replay") {
    val texts = Seq("", "aaaa", "abab", "abcd",
      "the quick brown fox jumps over the lazy dog",
      "aGVsbG8gd29ybGQhIQ==aGVsbG8gd29ybGQhIQ==", "日本語のテキスト")
    def oracle(s: String): Double = {
      if (s.isEmpty) return 0.0
      val counts = s.groupBy(identity).view.mapValues(_.length).toSeq.sortBy(_._1)
      var h = 0.0
      for ((_, c) <- counts) {
        val p = c.toDouble / s.length
        h -= p * (math.log(p) / math.log(2.0))
      }
      h
    }
    val got = texts.toDF("t").select(CharEntropy(col("t"))).as[Double].collect()
    // bit-exact: the kernel folds in ascending char order, same as the oracle
    assert(got.toSeq === texts.map(oracle))
    assert(oracle("aaaa") === 0.0)
    assert(math.abs(oracle("abab") - 1.0) < 1e-12)
    assert(math.abs(oracle("abcd") - 2.0) < 1e-12)
  }

  test("char entropy is SQL-registered and null-safe") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_char_entropy('abab') AS h, graft_char_entropy(NULL) AS n")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.isNullAt(1))
  }

  test("text_entropy query: natural text kept, constant noise dropped") {
    val df = PipelineQueries.textEntropy(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
    val noise = Seq((1L, "xxxxxxxxxxxxxxxxxxxxxxxxxxxx")).toDF("doc_id", "text")
      .select(CharEntropy(col("text"))).as[Double].head()
    assert(noise === 0.0)
  }

  // ----------------------------------------------------------- best-fit

  test("packBestFit: capacity respected, docs whole, FFD replay per bucket") {
    val rnd = new scala.util.Random(991)
    val docs = (1 to 300).map(i => (i.toLong, rnd.nextInt(900) + 1))
      .toDF("doc_id", "n")
    val packed = Curation.packBestFit(docs, col("n"), budget = 1000L,
      idCol = "doc_id", orderCol = "doc_id", numPartitions = 4)
      .collect().map(r => (r.getString(0).toLong, r.getLong(1), r.getLong(2)))
    // every doc exactly once
    assert(packed.map(_._1).sorted.toSeq === (1L to 300L).toSeq)
    // no bin over capacity
    val fills = packed.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(fills.values.forall(_ <= 1000L), "bin over budget")
    // decent fill: FFD at these sizes wastes far less than half
    val bins = fills.size
    val total = packed.map(_._2).sum
    assert(bins <= (total / 1000L) * 2 + 4, s"too many bins: $bins")
    // deterministic
    val again = Curation.packBestFit(docs, col("n"), budget = 1000L,
      idCol = "doc_id", orderCol = "doc_id", numPartitions = 4)
      .collect().map(r => (r.getString(0).toLong, r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === packed.sortBy(_._1).toSeq)
  }

  test("packBestFit: oversize docs get singleton bins that accept nothing") {
    val docs = Seq((1L, 5000), (2L, 5000), (3L, 10), (4L, 10))
      .toDF("doc_id", "n")
    val packed = Curation.packBestFit(docs, col("n"), budget = 100L,
      idCol = "doc_id", orderCol = "doc_id", numPartitions = 1)
      .collect().map(r => (r.getString(0).toLong, r.getLong(2)))
    val byBin = packed.groupBy(_._2).view.mapValues(_.map(_._1).toSet).values.toSet
    assert(byBin === Set(Set(1L), Set(2L), Set(3L, 4L)))
  }

  test("packBestFit single bucket replays exact best-fit-decreasing") {
    val sizes = Seq(60, 50, 40, 30, 20, 10, 5)
    val docs = sizes.zipWithIndex.map { case (n, i) => ((i + 1).toLong, n) }
      .toDF("doc_id", "n")
    val packed = Curation.packBestFit(docs, col("n"), budget = 100L,
      idCol = "doc_id", orderCol = "doc_id", numPartitions = 1)
      .collect().map(r => (r.getString(0).toLong, r.getLong(2))).toMap
    // BFD replay: 60 -> b0(rem 40); 50 -> b1(rem 50); 40 -> b0(rem 0);
    // 30 -> b1(rem 20); 20 -> b1(rem 0); 10 -> b2(rem 90); 5 -> b2
    assert(packed(1L) === packed(3L))
    assert(packed(2L) === packed(4L) && packed(4L) === packed(5L))
    assert(packed(6L) === packed(7L))
    assert(Set(packed(1L), packed(2L), packed(6L)).size === 3)
  }

  // ---------------------------------------------------------------- PCA

  test("PCA basis is orthonormal with non-increasing explained variance") {
    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (comps, varr) = Pca.basis(vecs, k = 4)
    for (a <- comps) {
      val n = math.sqrt(a.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"component norm $n")
    }
    for (Seq(a, b) <- comps.toSeq.combinations(2)) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-6, s"components not orthogonal: $dot")
    }
    assert(varr.toSeq === varr.sortBy(-_).toSeq, "variance not sorted")
  }

  test("PCA recovers a planted dominant direction and is deterministic") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val dir = Array.tabulate(d)(i => if (i % 2 == 0) 0.5 else -0.5)
    val rows = (1 to 400).map { i =>
      val t = rnd.nextGaussian() * 10.0
      (i.toLong, Array.tabulate(d)(j =>
        (t * dir(j) + rnd.nextGaussian() * 0.01).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (comps, _) = Pca.basis(df, k = 2, vecCol = "embedding")
    val cos = comps(0).zip(dir).map { case (x, y) => x * y }.sum /
      math.sqrt(dir.map(x => x * x).sum)
    assert(math.abs(math.abs(cos) - 1.0) < 1e-3,
      s"first component misses planted direction: |cos|=${math.abs(cos)}")
    val p1 = Pca.project(df, k = 2, idCol = "vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = Pca.project(df, k = 2, idCol = "vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 === p2, "projection not deterministic")
    // sign canonicalization: largest-|coord| entry of each component >= 0
    for (c <- comps) assert(c(c.map(math.abs).zipWithIndex.maxBy(_._1)._2) >= 0)
  }
}
