package graft.pipeline

import graft.{Tables, TestSpark}
import graft.table.{GraftTable, TableConfig, CopyOnWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted ANN index's operational lifecycle: drift-triggered atomic
  * rebuild (versioned dirs + meta re-point), the corpus/index reconcile
  * healer, and the continuous embeddings-ingest composition — the vector
  * lane's mirror of MinhashIndexSpec's crash-semantics suite. */
class AnnIndexLifecycleSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def codesIds(root: String) =
    GraftTable.load(spark, s"$root/codes").snapshot()
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("rebuild is atomic: orphans are inert, the meta rename is the swap, vacuum reclaims") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
    val corpusA = vecs.filter(col("vec_id") % 2 === 0)
    val corpusB = vecs
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_annreb_").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_annrebB_").toString
    try {
      AnnIndex.buildIvfPq(corpusA, dir, nlist = 16)
      def res(d: String, corpus: org.apache.spark.sql.DataFrame) =
        resultSet(AnnIndex.queryIvfPq(d, corpus, queries, k = 5, nprobe = 6))
      val resA = res(dir, corpusA)
      // a crashed rebuild leaves an orphan version dir with NO meta
      // re-point: queries must keep serving the live version bit-for-bit
      // (readers key off the meta, never the directory listing)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "v1"))
      assert(res(dir, corpusA) === resA,
        "an un-committed version dir must be invisible to queries")
      // the rebuild proper: retrain + re-encode the evolved corpus into a
      // FRESH version (never the orphan — it may hold half-built tables),
      // then the atomic meta rename re-points every reader
      AnnIndex.rebuildIvfPq(dir, corpusB, nlist = 16)
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "v2", "codes")),
        "rebuild must skip the crashed orphan's version number")
      AnnIndex.buildIvfPq(corpusB, dirB, nlist = 16)
      val resB = res(dir, corpusB)
      assert(resB === res(dirB, corpusB),
        "a rebuilt index must answer exactly like a fresh build")
      // the drift baseline resets to the NEW build's observed error: the
      // rebuild corpus scores at ratio 1
      val ds = AnnIndex.driftStats(dir, corpusB)
      assert(ds.ratio.exists(r => math.abs(r - 1.0) < 1e-6),
        s"rebuild must reset the drift baseline, got ${ds.ratio}")
      // index maintenance follows the live version: an upsert lands in v2,
      // not the superseded root table set
      val rootCount = codesIds(dir).size
      val donor = vecs.filter(col("vec_id") === 3L)
        .select(lit(777000L).as("vec_id"), col("embedding"))
      AnnIndex.upsertIvfPq(dir, donor)
      assert(codesIds(s"$dir/v2").contains(777000L),
        "upsert must land in the live version")
      assert(codesIds(dir).size === rootCount,
        "upsert must not touch the superseded root tables")
      val resAfterUpsert = res(dir,
        corpusB.unionByName(donor.withColumn("label", lit(0))
          .select(vecs.columns.map(col): _*)))
      // vacuum reclaims the superseded root set and the orphan; the live
      // version keeps serving bit-identically
      assert(AnnIndex.vacuumIvfPq(dir) === 2,
        "vacuum must reclaim the pre-rebuild root set and the orphan")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "codes")), "root codes must be gone")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "v1")), "orphan dir must be gone")
      assert(res(dir,
        corpusB.unionByName(donor.withColumn("label", lit(0))
          .select(vecs.columns.map(col): _*))) === resAfterUpsert,
        "vacuum must not move a bit of any query")
      assert(AnnIndex.vacuumIvfPq(dir) === 0, "vacuum replay is a no-op")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dirB)
    }
  }

  test("reconcileIvfPq heals the lost-refresh window and converges; un-codable rows are excluded") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val seed = vecs.filter(col("vec_id") < 400)
    val dir = java.nio.file.Files.createTempDirectory("graft_annrec_").toString
    try {
      AnnIndex.buildIvfPq(seed, dir, nlist = 16)
      // corpus moved ahead of the index (the crash window): codes missing
      val corpus = vecs
      assert(AnnIndex.reconcileIvfPq(dir, corpus) === 100L,
        "reconcile must encode exactly the missing vectors")
      assert(codesIds(dir) === corpus.select("vec_id").collect()
        .map(_.getLong(0)).toSet, "codes must cover the corpus")
      assert(AnnIndex.reconcileIvfPq(dir, corpus) === 0L,
        "a consistent pair must reconcile to 0")
      // un-codable rows (null / empty embedding) are structurally absent,
      // not missing: they must not re-trigger repair forever
      val unCodable = Seq(
        (900001L, null.asInstanceOf[Array[Float]]),
        (900002L, Array.empty[Float])).toDF("vec_id", "embedding")
      val withBad = corpus.unionByName(unCodable)
      val t = GraftTable.load(spark, s"$dir/codes")
      val commitsBefore = t.timeline.completed().size
      assert(AnnIndex.reconcileIvfPq(dir, withBad) === 0L)
      assert(AnnIndex.reconcileIvfPq(dir, withBad) === 0L, "must stay 0")
      assert(t.timeline.completed().size === commitsBefore,
        "a converged reconcile must not write empty commits")
    } finally GraftTable.drop(dir)
  }

  test("reconcileLsh heals to exactly a fresh build and converges") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val seed = vecs.filter(col("vec_id") < 400)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshrec_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lshrec2_").toString
    try {
      AnnIndex.buildLsh(seed, dir, planes = 4, tables = 8)
      assert(AnnIndex.reconcileLsh(dir, vecs) === 100L)
      assert(AnnIndex.reconcileLsh(dir, vecs) === 0L, "must converge")
      // hyperplanes are deterministic in (planes, tables): a healed index
      // must answer bit-identically to one built from the full corpus
      AnnIndex.buildLsh(vecs, dir2, planes = 4, tables = 8)
      assert(resultSet(AnnIndex.queryLsh(dir, queries, k = 5)) ===
        resultSet(AnnIndex.queryLsh(dir2, queries, k = 5)),
        "healed LSH index diverged from a fresh build")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dir2)
    }
  }

  test("LSH probe predicate prunes files: reads ~probed pairs, not the whole index") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_lshpr_").toString
    try {
      // wide hash space (planes=16 → 2^16 buckets) + tiny files force a
      // many-file layout with ~distinct buckets per file; exact-duplicate
      // vectors guarantee the probe COLLIDES (zero collisions would let
      // AQE fold the whole join to an EmptyRelation and erase the scan)
      val corpus = vecs.unionByName(
        vecs.withColumn("vec_id", col("vec_id") + 100000L))
      AnnIndex.buildLsh(corpus, dir, planes = 16, tables = 8,
        targetFileSizeRows = 10)
      val q = vecs.filter(col("vec_id") === 123L)
      // AQE hides scans inside query stages — walk through the adaptive
      // wrappers to the index-table FileSourceScanExec nodes
      def indexScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = {
        import org.apache.spark.sql.execution.adaptive.{
          AdaptiveSparkPlanExec, QueryStageExec}
        val self = p match {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains(dir)) => Seq(f)
          case _ => Nil
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case other => other.children
        }
        self ++ kids.flatMap(indexScans)
      }
      def filesRead(b: Option[Boolean]): Long = {
        val df = AnnIndex.queryLsh(dir, q, k = 5, broadcastQueries = b)
        df.collect()
        indexScans(df.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
      }
      val total = filesRead(Some(false))
      val pruned = filesRead(Some(true))
      assert(total >= 200, s"fixture must be many-file (got $total)")
      // 1 query × 8 tables = 8 probed (table, bucket) pairs; the shared
      // per-table disjunction lands each pair in ~one file of that
      // table's raw-column range sort
      assert(pruned <= 16 && pruned * 4 < total,
        s"probe must prune files: read $pruned of $total")
      // pruning is physics, not semantics
      assert(resultSet(AnnIndex.queryLsh(dir, q, k = 5,
        broadcastQueries = Some(true))) ===
        resultSet(AnnIndex.queryLsh(dir, q, k = 5,
          broadcastQueries = Some(false))),
        "pruned LSH query diverged from the full-scan one")
    } finally GraftTable.drop(dir)
  }

  test("continuous embeddings ingest: codes follow commits, restart reconciles the crash window") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val seed = vecs.filter(col("vec_id") < 400)
    val batch1 = vecs.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val batch2 = vecs.filter(col("vec_id") >= 450)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_anning_").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_anningc_").toString
    try {
      val corpus = GraftTable.create(spark, corpusDir,
        TableConfig("emb_corpus", CopyOnWrite, keyFields = Seq("vec_id")))
      corpus.bulkInsert(seed)
      AnnIndex.buildIvfPq(seed, dir, nlist = 16)
      val batches = Iterator(("cp1", batch1), ("cp2", batch2))
      val ing = AnnIndex.continuousIngestIvfPq(corpus, dir,
        () => if (batches.hasNext) Some(batches.next()) else None,
        compactEvery = 0)
      try assert(ing.run(maxCycles = 2, idleMs = 1) === 2) finally ing.close()
      def corpusIds() = GraftTable.load(spark, corpusDir).snapshot()
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(corpusIds() === (0L until 500L).toSet)
      assert(codesIds(dir) === corpusIds(),
        "post-commit hook must keep codes covering the corpus")
      assert(graft.streaming.ContinuousIngest.lastCheckpoint(
        GraftTable.load(spark, corpusDir)) === Some("cp2"),
        "source checkpoint must ride the corpus commit")
      val healthy = resultSet(AnnIndex.queryIvfPq(dir,
        GraftTable.load(spark, corpusDir).snapshot(), queries,
        k = 5, nprobe = 6))
      // crash window: corpus committed batch2 but its codes upsert was
      // lost (simulated via delete). A restarted lane reconciles BEFORE
      // its first pull — queries read exactly the healthy answers again.
      AnnIndex.deleteIvfPq(dir, batch2.select("vec_id"))
      assert(codesIds(dir) !== corpusIds(), "fixture must open the window")
      val ing2 = AnnIndex.continuousIngestIvfPq(
        GraftTable.load(spark, corpusDir), dir, () => None, compactEvery = 0)
      ing2.close()
      assert(codesIds(dir) === corpusIds(),
        "restart must reconcile the lost-refresh window")
      assert(resultSet(AnnIndex.queryIvfPq(dir,
        GraftTable.load(spark, corpusDir).snapshot(), queries,
        k = 5, nprobe = 6)) === healthy,
        "healed index must answer exactly like the pre-crash one")
      assert(AnnIndex.reconcileIvfPq(dir,
        GraftTable.load(spark, corpusDir).snapshot()) === 0L)
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(corpusDir)
    }
  }
}
