package graft.pipeline

import graft.{Tables, TestSpark}
import graft.table.{GraftTable, TableConfig, CopyOnWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The self-driving vector ingest lane: drift past the threshold triggers
  * a rebuild AT THE LIVE SHAPE (parameters + encoding from the meta), the
  * baseline resets so one distribution shift means one rebuild, and the
  * index keeps covering the corpus throughout. */
class SelfDrivingLaneSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("drift-triggered rebuild in the continuous ingest lane: one shift, one rebuild, corpus covered") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val seed = vecs.filter(col("vec_id") < 400)
    val dim = vecs.select(size(col("embedding"))).head.getInt(0)
    // off-distribution batches: one-hot vectors (the driftStats fixture
    // shape — codebooks trained on real embeddings quantize them badly)
    def oneHots(base: Long, n: Int) = (0 until n).map { i =>
      (base + i, Array.tabulate(dim)(d =>
        if (d == (i % dim)) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val batch1 = oneHots(900000L, 50)
    val batch2 = oneHots(900100L, 50)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
      .unionByName(batch1.limit(5))
    val dir = java.nio.file.Files.createTempDirectory("graft_sdl_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sdl2_").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_sdlc_").toString
    try {
      val corpus = GraftTable.create(spark, corpusDir,
        TableConfig("emb_corpus_sdl", CopyOnWrite, keyFields = Seq("vec_id")))
      corpus.bulkInsert(seed)
      AnnIndex.buildIvfPq(seed, dir, nlist = 16)
      // the shift is real before the lane runs: one-hot batch vs a
      // baseline trained on real embeddings (deterministic: 1.81)
      assert(AnnIndex.driftStats(dir, batch1).ratio.exists(_ > 1.5))
      val batches = Iterator(("c1", batch1), ("c2", batch2))
      val ing = AnnIndex.continuousIngestIvfPq(corpus, dir,
        () => if (batches.hasNext) Some(batches.next()) else None,
        compactEvery = 0, rebuildIfDriftAbove = 1.5, driftCheckEvery = 1)
      try assert(ing.run(maxCycles = 2, idleMs = 1) === 2) finally ing.close()
      // ONE rebuild: batch1 tripped the threshold (retrain includes the
      // one-hots), batch2 — same distribution — reads under it against
      // the RESET baseline, so no storm
      val versions = AnnIndex.indexVersions(dir, "ivfpq")
      assert(versions.map(v => (v._1, v._2, v._3)) ===
        Seq(("root", false, true), ("v1", true, true)),
        s"expected exactly one rebuild, got $versions")
      assert(AnnIndex.driftStats(dir, batch2).ratio.exists(_ < 1.5),
        "the reset baseline must absorb the shifted distribution")
      // the index covers the corpus end to end
      assert(AnnIndex.reconcileIvfPq(dir, corpus.snapshot()) === 0L)
      // and answers bit-identically to the loop-free sequence: build on
      // what the rebuild saw (seed + batch1), then upsert batch2
      AnnIndex.buildIvfPq(seed.unionByName(batch1), dir2, nlist = 16)
      AnnIndex.upsertIvfPq(dir2, batch2)
      val full = corpus.snapshot().select("vec_id", "embedding")
      assert(resultSet(AnnIndex.queryIvfPq(dir, full, queries, k = 5,
        nprobe = 6)) ===
        resultSet(AnnIndex.queryIvfPq(dir2, full, queries, k = 5,
          nprobe = 6)),
        "self-driving lane diverged from the loop-free sequence")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dir2)
      GraftTable.drop(corpusDir)
    }
  }
}
