package graft.pipeline

import graft.{Tables, TestSpark}
import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rebuild/vacuum parity across all three persisted indexes (the MinHash
  * and LSH siblings of AnnIndexLifecycleSpec's IVF-PQ suite), the
  * timeline-backed version pointer (the legacy meta JSON is a cache, not
  * the commit point), the rebuild↔concurrent-upsert race healed by
  * reconcile, and bucket-occupancy drift — the train-free indexes'
  * WHEN-to-rebuild signal. */
class IndexRebuildSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def gateRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bucketDocIds(root: String) =
    GraftTable.load(spark, s"$root/buckets").snapshot()
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  private def bucketVecIds(root: String) =
    GraftTable.load(spark, s"$root/buckets").snapshot()
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet

  private def rmTimeline(dir: String): Unit =
    graft.table.Fs.walk(java.nio.file.Paths.get(dir, ".graft"))
      .reverse.foreach(java.nio.file.Files.deleteIfExists(_))

  test("minhash rebuild with new banding is atomic: orphan inert, rebuilt ≡ fresh build, vacuum reclaims") {
    val docs = Tables.documents(spark, sf)
    val corpusA = docs.filter(col("doc_id") < 150).select("doc_id", "text")
    val corpusB = docs.filter(col("doc_id") < 250).select("doc_id", "text")
    // near-copies of every doc: gated iff their source doc is indexed
    val batch = docs.select((col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit(" graft extra")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mhreb_").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_mhrebB_").toString
    try {
      MinhashIndex.build(corpusA, dir, n = 3, numHashes = 32, bands = 8)
      def res(d: String, corpus: org.apache.spark.sql.DataFrame) =
        gateRows(MinhashIndex.gate(d, corpus, batch))
      val resA = res(dir, corpusA)
      // a crashed rebuild's orphan version dir (no meta re-point) must be
      // invisible — readers key off the meta, never the dir listing
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "v1"))
      assert(res(dir, corpusA) === resA,
        "an un-committed version dir must be invisible to the gate")
      // rebuild the grown corpus with NEW banding parameters (the change
      // that forces a full re-band: they're baked into every row) into a
      // fresh version — skipping the orphan's number
      MinhashIndex.rebuild(dir, corpusB, n = 3, numHashes = 32, bands = 16)
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "v2", "buckets")),
        "rebuild must skip the crashed orphan's version number")
      MinhashIndex.build(corpusB, dirB, n = 3, numHashes = 32, bands = 16)
      val resB = res(dir, corpusB)
      assert(resB === res(dirB, corpusB),
        "a rebuilt index must gate exactly like a fresh build")
      // index maintenance follows the live version: an upserted doc's
      // near-copy is gated; the superseded root tables never change
      val donor = docs.filter(col("doc_id") === 260)
        .select(lit(777000L).as("doc_id"), col("text"))
      val rootIds = bucketDocIds(dir)
      MinhashIndex.upsert(dir, donor)
      assert(bucketDocIds(s"$dir/v2").contains(777000L),
        "upsert must land in the live version")
      assert(bucketDocIds(dir) === rootIds,
        "upsert must not touch the superseded root tables")
      val corpusAfter = corpusB.unionByName(donor)
      val resAfterUpsert = res(dir, corpusAfter)
      assert(!resAfterUpsert.contains(10260L),
        "the upserted doc's near-copy must now be gated")
      // vacuum reclaims the superseded root set and the orphan; the live
      // version keeps gating bit-identically
      assert(MinhashIndex.vacuum(dir) === 2,
        "vacuum must reclaim the pre-rebuild root set and the orphan")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "buckets")), "root buckets must be gone")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "v1")), "orphan dir must be gone")
      assert(res(dir, corpusAfter) === resAfterUpsert,
        "vacuum must not move a bit of any gate answer")
      assert(MinhashIndex.vacuum(dir) === 0, "vacuum replay is a no-op")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dirB)
    }
  }

  test("lsh rebuild with new planes is atomic: orphan inert, rebuilt ≡ fresh build, vacuum reclaims") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val corpusA = vecs.filter(col("vec_id") % 2 === 0)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshreb_").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_lshrebB_").toString
    try {
      AnnIndex.buildLsh(corpusA, dir, planes = 4, tables = 8)
      def res(d: String) = resultSet(AnnIndex.queryLsh(d, queries, k = 5))
      val resA = res(dir)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "v1"))
      assert(res(dir) === resA,
        "an un-committed version dir must be invisible to queries")
      // the grown corpus outgrew 4 planes: rebuild with 8 (the occupancy
      // remedy) into a fresh version
      AnnIndex.rebuildLsh(dir, vecs, planes = 8, tables = 8)
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "v2", "buckets")),
        "rebuild must skip the crashed orphan's version number")
      AnnIndex.buildLsh(vecs, dirB, planes = 8, tables = 8)
      val resB = res(dir)
      assert(resB === res(dirB),
        "a rebuilt index must answer exactly like a fresh build")
      // maintenance follows the live version
      val donor = vecs.filter(col("vec_id") === 3L)
        .select(lit(777000L).as("vec_id"), col("embedding"))
      val rootIds = bucketVecIds(dir)
      AnnIndex.upsertLsh(dir, donor)
      assert(bucketVecIds(s"$dir/v2").contains(777000L),
        "upsert must land in the live version")
      assert(bucketVecIds(dir) === rootIds,
        "upsert must not touch the superseded root tables")
      val resAfterUpsert = res(dir)
      assert(AnnIndex.vacuumLsh(dir) === 2,
        "vacuum must reclaim the pre-rebuild root set and the orphan")
      assert(res(dir) === resAfterUpsert,
        "vacuum must not move a bit of any query")
      assert(AnnIndex.vacuumLsh(dir) === 0, "vacuum replay is a no-op")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dirB)
    }
  }

  test("rebuild ↔ concurrent-upsert race: vacuum discards the superseded-version write, reconcile heals it") {
    // the unpinned edge VERDICT r14 named: an upsert that resolved the
    // meta just before a rebuild lands its codes in the version the
    // rebuild supersedes; vacuum silently discards them. The sanctioned
    // recovery: the CORPUS is the source of truth, so reconcile
    // re-encodes exactly the lost vectors and queries read as if the
    // race never happened — which is why vacuum's cadence must trail
    // in-flight writers the way clean trails readers.
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = vecs.filter(col("vec_id") < 450)
    val donor = vecs.filter(col("vec_id") >= 450)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_annrace_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_annrace2_").toString
    try {
      AnnIndex.buildIvfPq(base, dir, nlist = 16)
      // the racing writer: pinned the pre-rebuild meta, lands in the root
      // version (sequentially equivalent to upsert-then-rebuild)
      AnnIndex.upsertIvfPq(dir, donor)
      // the rebuild's corpus snapshot predates the donor batch
      AnnIndex.rebuildIvfPq(dir, base, nlist = 16)
      assert(AnnIndex.vacuumIvfPq(dir) === 1)
      // the lost update is real: the live version has no donor codes
      assert(bucketlessCodesIds(s"$dir/v1").intersect(
        donor.collect().map(_.getLong(0)).toSet).isEmpty,
        "fixture must lose the superseded-version upsert")
      // corpus-as-source-of-truth recovery
      assert(AnnIndex.reconcileIvfPq(dir, vecs) === donor.count(),
        "reconcile must re-encode exactly the discarded vectors")
      // healthy reference: the same operations without the race
      AnnIndex.buildIvfPq(base, dir2, nlist = 16)
      AnnIndex.upsertIvfPq(dir2, donor)
      assert(resultSet(AnnIndex.queryIvfPq(dir, vecs, queries, k = 5,
        nprobe = 6)) ===
        resultSet(AnnIndex.queryIvfPq(dir2, vecs, queries, k = 5,
          nprobe = 6)),
        "healed index must answer exactly like the race-free sequence")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dir2)
    }
  }

  private def bucketlessCodesIds(root: String) =
    GraftTable.load(spark, s"$root/codes").snapshot()
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("the version pointer rides the lake timeline: the legacy meta file is a cache, not the commit point") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_tlptr_").toString
    val dirM = java.nio.file.Files.createTempDirectory("graft_tlptrM_").toString
    try {
      AnnIndex.buildIvfPq(vecs.filter(col("vec_id") % 2 === 0), dir,
        nlist = 16)
      AnnIndex.rebuildIvfPq(dir, vecs, nlist = 16)
      val res = resultSet(AnnIndex.queryIvfPq(dir, vecs, queries, k = 5,
        nprobe = 6))
      // deleting the legacy file changes nothing: readers resolve the
      // newest timeline instant
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir, "ivfpq_meta.json"))
      assert(resultSet(AnnIndex.queryIvfPq(dir, vecs, queries, k = 5,
        nprobe = 6)) === res,
        "queries must not depend on the legacy meta file")
      // a TORN legacy file — exactly what a non-atomic object-store
      // rename produces — changes nothing either
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "ivfpq_meta.json"),
        """{"version":2,"enc""".getBytes("UTF-8"))
      assert(resultSet(AnnIndex.queryIvfPq(dir, vecs, queries, k = 5,
        nprobe = 6)) === res,
        "a torn legacy meta file must be ignored while the timeline exists")
      // vacuum bounds the meta history: readers resolve only the newest
      // instant, so older ones are droppable debugging history
      val liveJson = {
        // package-private access: re-commit the live meta verbatim
        val m = IndexMeta.read(dir, "ivfpq_meta.json").get
        (1 to 15).foreach(_ =>
          IndexMeta.commit(dir, "ivfpq_meta.json", m.toString))
      }
      AnnIndex.vacuumIvfPq(dir)
      assert(new graft.table.Timeline(dir).completed().size <= 10,
        "vacuum must trim the meta-instant history")
      assert(resultSet(AnnIndex.queryIvfPq(dir, vecs, queries, k = 5,
        nprobe = 6)) === res,
        "meta-history trimming must not move a bit of any query")
      // the minhash sibling, through a rebuild (version pointer in play)
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      val batch = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" graft extra")).as("text"))
      MinhashIndex.build(docs.filter(col("doc_id") < 150), dirM)
      MinhashIndex.rebuild(dirM, docs.filter(col("doc_id") < 250))
      val g = gateRows(MinhashIndex.gate(dirM,
        docs.filter(col("doc_id") < 250), batch))
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dirM, "minhash_meta.json"))
      assert(gateRows(MinhashIndex.gate(dirM,
        docs.filter(col("doc_id") < 250), batch)) === g,
        "the gate must not depend on the legacy meta file")
    } finally {
      GraftTable.drop(dir)
      GraftTable.drop(dirM)
    }
  }

  test("minhash occupancy drift: a hot-bucket flood climbs the ratio; rebuild resets the baseline") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val seed = docs.filter(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhocc_").toString
    try {
      MinhashIndex.build(seed, dir, n = 3, numHashes = 32, bands = 8)
      val s0 = MinhashIndex.occupancyStats(spark, dir)
      assert(s0.buckets > 0 && s0.buildP99.nonEmpty)
      assert(s0.ratio.exists(r => math.abs(r - 1.0) < 1e-9),
        s"untouched index must read ratio 1, got ${s0.ratio}")
      // the crawl hits mirror farms: 30 pages × 50 copies each — the
      // banding that was sized for the seed corpus now has hot buckets,
      // every gate's candidate join balloons with them
      val flood = docs.filter(col("doc_id") < 30)
        .crossJoin(spark.range(50))
        .select((col("doc_id") * 100 + col("id") + 100000L).as("doc_id"),
          col("text"))
      MinhashIndex.upsert(dir, flood)
      val s1 = MinhashIndex.occupancyStats(spark, dir)
      assert(s1.ratio.exists(_ > 2.0),
        s"hot-bucket flood must climb the occupancy ratio, got ${s1.ratio}")
      assert(s1.max >= 50, s"the hottest bucket holds the mirrors: ${s1.max}")
      // acting on the signal: rebuild re-bands everything and resets the
      // baseline to what the NEW build achieved
      MinhashIndex.rebuild(dir, seed.unionByName(flood), n = 3,
        numHashes = 64, bands = 8)
      val s2 = MinhashIndex.occupancyStats(spark, dir)
      assert(s2.ratio.exists(r => math.abs(r - 1.0) < 1e-9),
        s"rebuild must reset the occupancy baseline, got ${s2.ratio}")
      // a pre-baseline index (legacy meta without occupancy fields) reads
      // an honest None, never "healthy"
      rmTimeline(dir)
      val meta = java.nio.file.Paths.get(dir, "minhash_meta.json")
      val noBase = new String(java.nio.file.Files.readAllBytes(meta), "UTF-8")
        .replaceAll(""","occ_mean":[0-9.Ee+-]+,"occ_p99":[0-9.Ee+-]+,"occ_max":[0-9]+""", "")
      java.nio.file.Files.write(meta, noBase.getBytes("UTF-8"))
      val s3 = MinhashIndex.occupancyStats(spark, dir)
      assert(s3.buildP99.isEmpty && s3.ratio.isEmpty,
        "no baseline must read None, not a ratio")
    } finally GraftTable.drop(dir)
  }

  test("lsh occupancy drift: duplicate-vector flood climbs the ratio") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_lshocc_").toString
    try {
      AnnIndex.buildLsh(vecs, dir, planes = 4, tables = 8)
      val s0 = AnnIndex.occupancyStatsLsh(spark, dir)
      assert(s0.ratio.exists(r => math.abs(r - 1.0) < 1e-9),
        s"untouched index must read ratio 1, got ${s0.ratio}")
      val flood = spark.range(300)
        .crossJoin(vecs.filter(col("vec_id") === 3L).select("embedding"))
        .select((col("id") + 800000L).as("vec_id"), col("embedding"))
      AnnIndex.upsertLsh(dir, flood)
      val s1 = AnnIndex.occupancyStatsLsh(spark, dir)
      assert(s1.ratio.exists(_ > 1.5),
        s"duplicate flood must climb the occupancy ratio, got ${s1.ratio}")
      assert(s1.max >= 300L,
        s"the hottest bucket holds every duplicate: ${s1.max}")
    } finally GraftTable.drop(dir)
  }
}
