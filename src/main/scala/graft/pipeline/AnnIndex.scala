package graft.pipeline

import graft.table._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted ANN index (SURVEY.md §2.3): the production
 * build-once/query-many shape of [[Similarity.ivfPqTopK]] — FAISS's
 * operational model re-expressed over the lake engine. A build trains the
 * IVF coarse centroids and PQ codebooks ONCE, encodes the corpus once, and
 * persists all three as Graft tables under one index directory:
 *
 *   - `centroids`  (cid, vec)        — nlist rows, metadata-sized
 *   - `codebooks`  (sub, cell, vec)  — m·ksub rows, metadata-sized
 *   - `codes`      (vec_id, cid, codes) — one row per corpus vector,
 *     PARTITIONED BY cid (hive-style), so a query probing nprobe cells
 *     reads exactly those partitions — the lake engine's partition-pruned
 *     listing serves the IVF inverted-file lookup
 *
 * Every query then pays NO training and NO corpus encode: load the two
 * metadata-sized tables to the driver (the same footprint the in-memory
 * path already broadcasts), scan only the probed `codes` partitions, and
 * run the SAME search core ([[Similarity.ivfPqSearch]]) — results are
 * bit-identical to the in-memory path by construction (training is
 * deterministic: id-ordered init, no RNG).
 *
 * 100 TB posture: the build is the one corpus-scale job (train on an
 * id-strided sample, encode in one map pass, bulk-insert partitioned by
 * cid); queries touch nprobe/nlist of the CODES (m small ints per vector,
 * not the raw floats) plus the k·rerank exact-rerank rows. Index refresh
 * is a table write like any other — upsert new vectors' codes into their
 * cid partition; the lake table's timeline gives the index versioning,
 * time travel and incremental reads for free.
 *
 * Lifecycle (all three index kinds — IVF-PQ, LSH, and the MinHash
 * sibling): build → upsert/delete/refresh → drift watch ([[driftStats]]
 * for the trained index, [[occupancyStatsLsh]] /
 * [[MinhashIndex.occupancyStats]] for the train-free ones) → atomic
 * versioned rebuild → vacuum, with [[reconcileIvfPq]]/[[reconcileLsh]]
 * healing any corpus/index gap from the corpus as source of truth. The
 * version pointer commits through the index root's own timeline
 * ([[IndexMeta]]).
 */
object AnnIndex {

  /** Train + encode + persist an IVF-PQ index for `corpus` under
    * `indexDir`. `residual` (default true, FAISS's default) encodes cell
    * residuals — better recall at the same (m, ksub); the choice is
    * VERSIONED into `ivfpq_meta.json` so queries and refreshes can never
    * mix encodings, and a pre-residual index (no meta file) still loads
    * as the raw-vector v1 format. Returns the number of indexed vectors. */
  def buildIvfPq(corpus: DataFrame, indexDir: String, nlist: Int = 16,
      m: Int = 8, ksub: Int = 16, trainIters: Int = 3,
      trainSampleMod: Long = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", residual: Boolean = true): Long = {
    val (count, trainErr) = buildIvfPqTables(corpus, indexDir, nlist, m,
      ksub, trainIters, trainSampleMod, idCol, vecCol, residual)
    writeIvfPqMeta(indexDir, residual, trainErr, nlist, m, ksub, dir = None)
    count
  }

  /** Train + encode + land the three index tables under `tablesRoot`.
    * Shared by [[buildIvfPq]] (tables at the index root) and
    * [[rebuildIvfPq]] (tables in a fresh version subdir) — one build
    * definition, so a rebuilt index is a fresh build by construction.
    * Returns (indexed vectors, build mean-sq reconstruction error —
    * NaN when unmeasurable). */
  private def buildIvfPqTables(corpus: DataFrame, tablesRoot: String,
      nlist: Int, m: Int, ksub: Int, trainIters: Int, trainSampleMod: Long,
      idCol: String, vecCol: String, residual: Boolean): (Long, Double) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cN = Similarity.l2normalize(corpus, vecCol)
    val coarse = Similarity.trainIvfCentroids(cN, nlist, trainIters,
      trainSampleMod, idCol, vecCol)
    // shared with ivfPqTopK: same training, same one-pass encode, so
    // persisted codes are bit-identical to the in-memory build's
    val (books, enc) = Similarity.encodeIvfPq(cN, coarse, m, ksub,
      trainIters, trainSampleMod, residual, idCol, vecCol,
      errAs = Some("_err"))
    // centroids + codebooks are metadata-sized tables independent of the
    // codes write: land them from a side thread so their commit machinery
    // overlaps the corpus-scale encode+write below (guide §2.6 — Spark's
    // scheduler happily runs jobs from several threads; the tables live in
    // different dirs, so no commit can conflict)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val sideTables = Future {
      val centroidsT = GraftTable.create(spark, s"$tablesRoot/centroids",
        TableConfig("ann_centroids", CopyOnWrite, keyFields = Seq("cid")))
      centroidsT.bulkInsert(
        coarse.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("cid", "vec"))
      val codebooksT = GraftTable.create(spark, s"$tablesRoot/codebooks",
        TableConfig("ann_codebooks", CopyOnWrite, keyFields = Seq("sub", "cell")))
      codebooksT.bulkInsert(
        books.zipWithIndex.flatMap { case (book, s) =>
          book.zipWithIndex.map { case (v, c) => (s, c, v) }
        }.toSeq.toDF("sub", "cell", "vec"))
    }
    // codes landed partitioned by cid — the inverted file IS the
    // partition layout
    val codesT = GraftTable.create(spark, s"$tablesRoot/codes",
      TableConfig("ann_codes", CopyOnWrite, keyFields = Seq("vec_id"),
        partitioning = PartitionByColumns(Seq("cid"))))
    // drift baseline: mean squared reconstruction error of the WHOLE
    // encoded corpus, observed DURING the codes write (error decoded from
    // the just-assigned codes + a CollectMetrics node — zero extra jobs,
    // zero extra corpus reads), persisted so driftStats can compare
    // future deltas against what the index achieved at build time
    val obs = org.apache.spark.sql.Observation()
    val instant = codesT.bulkInsert(enc
      .observe(obs, avg(col("_err")).as("err"))
      .select(col("neighbor_id").as("vec_id"), col("cid"), col("codes")))
    val trainErr = obs.get.get("err") match {
      case Some(v: java.lang.Double) => v.doubleValue
      // a MISSING metric (zero-row write: avg over nothing is null) is not
      // a zero baseline — zero would read every later nonzero delta as
      // ratio ∞ ("rebuild now"); NaN routes through the isFinite guard in
      // writeIvfPqMeta to the honest pre-baseline (None) path
      case _ => Double.NaN
    }
    // the side tables must be fully committed before the meta re-point
    // makes this version live
    Await.result(sideTables, scala.concurrent.duration.Duration.Inf)
    // indexed-row count from the commit's write stats — no corpus-scale
    // read-back of the table we just wrote
    (codesT.commitRows(instant), trainErr)
  }

  /** Persist the index meta — the ONE pointer every reader resolves: the
    * encoding flag, the drift baseline, and (versioned indexes) the
    * subdir the live tables occupy. The commit point is a
    * `replacecommit` instant on the index root's own timeline
    * ([[IndexMeta.commit]] — the lake's append-only commit protocol, so
    * the swap is atomic on object stores too, not just under POSIX
    * rename); a concurrent reader sees the old complete meta or the new
    * complete meta, never a torn write. The `ivfpq_meta.json` file is a
    * cache/compat shim. */
  private def writeIvfPqMeta(indexDir: String, residual: Boolean,
      trainErr: Double, nlist: Int, m: Int, ksub: Int,
      dir: Option[String]): Unit = {
    // a NaN/Infinity mean (one poisoned embedding) must not write invalid
    // JSON that bricks every later read of the index — such a build simply
    // records no baseline (driftStats reports it as pre-baseline)
    val errField =
      if (java.lang.Double.isFinite(trainErr)) s""","train_err":$trainErr"""
      else ""
    val dirField = dir.map(d => s""","dir":"$d"""").getOrElse("")
    // build parameters make the index self-describing: a drift-triggered
    // rebuild (the ingest lane's, or anyone's) retrains at the LIVE
    // shape without the caller re-stating it
    IndexMeta.commit(indexDir, "ivfpq_meta.json",
      s"""{"version":2,"encoding":"${if (residual) "residual" else "raw"}"""" +
        s""","nlist":$nlist,"m":$m,"ksub":$ksub$errField$dirField}""")
  }

  /** The live index's (nlist, m, ksub) from the meta — defaults for a
    * pre-round-15 meta match the build defaults everywhere. */
  private def ivfPqParams(
      meta: Option[com.fasterxml.jackson.databind.JsonNode]): (Int, Int, Int) =
    (meta.map(_.path("nlist").asInt(16)).getOrElse(16),
      meta.map(_.path("m").asInt(8)).getOrElse(8),
      meta.map(_.path("ksub").asInt(16)).getOrElse(16))

  /** Directory the live index tables occupy: the meta's `dir` subdir for
    * a rebuilt (versioned) index, the index root otherwise — resolved
    * from ONE parsed meta so an operation that already read the meta
    * can't race a concurrent rebuild into mixing versions. */
  private def ivfPqRootOf(indexDir: String,
      meta: Option[com.fasterxml.jackson.databind.JsonNode]): String =
    IndexMeta.liveRoot(indexDir, meta)

  /** Atomic full rebuild — what acting on [[driftStats]] means: retrain +
    * re-encode `corpus` into a FRESH version subdir (`v1`, `v2`, …; the
    * live tables are never touched), then atomically re-point the meta.
    * Queries running during the rebuild serve the old version end to end
    * (their one meta read pins it); queries planned after the rename see
    * the new one — never a half-built mix. The drift baseline resets to
    * the new build's observed error. Replaces nothing on disk: old
    * versions stay queryable via their own tables until [[vacuumIvfPq]]
    * reclaims them. Returns the number of indexed vectors. */
  def rebuildIvfPq(indexDir: String, corpus: DataFrame, nlist: Int = 16,
      m: Int = 8, ksub: Int = 16, trainIters: Int = 3,
      trainSampleMod: Long = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", residual: Boolean = true): Long = {
    // exclusive-create version allocation: past every existing v<N> (a
    // crashed rebuild's orphan is never re-entered — it may hold a
    // half-built table set), and two CONCURRENT rebuilds get different
    // dirs — neither can corrupt the other; the later meta commit wins
    // and the loser's version is vacuumable garbage
    val sub = IndexMeta.allocateVersion(indexDir)
    val (count, trainErr) = buildIvfPqTables(corpus, s"$indexDir/$sub",
      nlist, m, ksub, trainIters, trainSampleMod, idCol, vecCol, residual)
    writeIvfPqMeta(indexDir, residual, trainErr, nlist, m, ksub,
      dir = Some(sub))
    count
  }

  /** Reclaim index versions the meta no longer points at — the cleanup
    * policy [[rebuildIvfPq]] defers. Drops superseded version subdirs AND
    * the root table set once a versioned dir is live. Cadence rule, the
    * one [[IndexMeta]] documents: old versions must outlive in-flight
    * READERS (run on the table-clean cadence) and must also trail
    * in-flight WRITERS — an [[upsertIvfPq]] that pinned the meta just
    * before a rebuild lands its codes in the superseded version, and
    * vacuuming before [[reconcileIvfPq]] has closed that corpus/index gap
    * discards them (the corpus stays the source of truth; reconcile
    * re-encodes the lost rows — spec-pinned). Returns the number of
    * table sets dropped. */
  def vacuumIvfPq(indexDir: String): Int =
    IndexMeta.vacuum(indexDir, "ivfpq_meta.json",
      Seq("centroids", "codebooks", "codes"))

  /** Repair the IVF-PQ index to cover the corpus — the vector sibling of
    * [[graft.pipeline.MinhashIndex.reconcile]]: encode + upsert codes for
    * every corpus vector MISSING from the codes table. The divergence
    * this heals is structural in any loop whose checkpoint rides the
    * corpus commit (a crash between the corpus write and the post-commit
    * [[upsertIvfPq]] means the batch never replays —
    * [[continuousIngestIvfPq]]'s restart path), and it also absorbs an
    * index lagging any out-of-band corpus write. Cost: an id-only
    * anti-join (corpus ids vs codes vec_ids — both single-column,
    * COLUMN-PRUNED scans; the codes side reads m-byte code rows' ids,
    * never raw floats), and only when ids are missing, one
    * delta-scale encode of THOSE vectors. UN-codable rows (null or empty
    * embedding — no code row CAN exist for them) are excluded on the
    * repair path so a corpus that permanently carries them still
    * converges to 0 / no-commit. Returns the number of vectors added. */
  def reconcileIvfPq(indexDir: String, corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val spark = corpus.sparkSession
    val root = ivfPqRootOf(indexDir, ivfPqMeta(indexDir))
    val indexed = GraftTable.load(spark, s"$root/codes").snapshot()
      .select(col("vec_id").as(idCol)).distinct()
    val missingIds = corpus.select(col(idCol))
      .join(indexed, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    if (missingIds.isEmpty) return 0L
    val addable = corpus.join(missingIds, Seq(idCol), "left_semi")
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .localCheckpoint(true)
    val added = addable.count()
    if (added > 0) upsertIvfPq(indexDir, addable, idCol, vecCol)
    added
  }

  /** [[reconcileIvfPq]] for the persisted LSH index — same crash window
    * ([[upsertLsh]] after an external corpus commit), same id-only probe
    * (here against the buckets table's vec_ids), same un-codable-row
    * exclusion, same converge-to-no-op contract. */
  def reconcileLsh(indexDir: String, corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val spark = corpus.sparkSession
    val indexed = GraftTable.load(spark,
        s"${lshMeta(indexDir)._3}/buckets").snapshot()
      .select(col("vec_id").as(idCol)).distinct()
    val missingIds = corpus.select(col(idCol))
      .join(indexed, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    if (missingIds.isEmpty) return 0L
    val addable = corpus.join(missingIds, Seq(idCol), "left_semi")
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .localCheckpoint(true)
    val added = addable.count()
    if (added > 0) upsertLsh(indexDir, addable, idCol, vecCol)
    added
  }

  /** The embeddings ingest lane wired the way
    * [[graft.pipeline.MinhashIndex.continuousIngest]] wires the text
    * lane: each pulled batch of vectors upserts into the corpus table
    * (checkpoint riding the commit), and the post-commit hook encodes +
    * upserts the batch's codes so queries see the new vectors without a
    * rebuild. Crash semantics are the minhash lane's exactly: a batch
    * that committed never replays, so the one gap — corpus committed,
    * codes upsert lost — is healed by running [[reconcileIvfPq]] BEFORE
    * the first pull; a crashed hook leaves ids ABSENT from the index
    * (invisible as neighbors, never wrong) until that restart repair. */
  def continuousIngestIvfPq(corpus: GraftTable, indexDir: String,
      source: () => Option[(String, DataFrame)],
      idCol: String = "vec_id", vecCol: String = "embedding",
      compactEvery: Int = 5, rebuildIfDriftAbove: Double = 0.0,
      driftCheckEvery: Int = 8): graft.streaming.ContinuousIngest = {
    reconcileIvfPq(indexDir, corpus.snapshot(), idCol, vecCol)
    // self-driving maintenance (rebuildIfDriftAbove > 0): every
    // driftCheckEvery committed batches, score THAT batch's PQ
    // reconstruction error against the build baseline (a delta-scale map
    // pass — the probe driftStats documents) and, at/above the
    // threshold, retrain from the corpus snapshot at the meta's own
    // (nlist, m, ksub). The rebuild resets the baseline, so a
    // one-time distribution shift triggers ONE rebuild, not a storm.
    // Vacuum stays on the ops cadence (CALL vacuum_index) — in-flight
    // readers elsewhere may still hold the superseded version.
    var sinceCheck = 0
    new graft.streaming.ContinuousIngest(corpus, source,
      // pin the batch so the post-commit hook encodes EXACTLY the rows
      // that committed, not a re-pull of a possibly-moving source frame
      transforms = Seq(_.localCheckpoint(true)),
      compactEvery = compactEvery,
      onBatchCommitted = (_, batch) => {
        // the corpus takes every row; the index takes only codable ones
        // (same exclusion as reconcileIvfPq — no code row can exist for a
        // null/empty embedding)
        val codable =
          batch.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        if (!codable.isEmpty) upsertIvfPq(indexDir, codable, idCol, vecCol)
        if (rebuildIfDriftAbove > 0) {
          sinceCheck += 1
          if (sinceCheck >= driftCheckEvery) {
            sinceCheck = 0
            val ds = driftStats(indexDir, codable, idCol, vecCol)
            if (ds.ratio.exists(_ >= rebuildIfDriftAbove)) {
              // retrain at the LIVE shape — parameters AND encoding come
              // from the meta, never re-stated (or silently defaulted)
              val meta = ivfPqMeta(indexDir)
              val (nlist, m, ksub) = ivfPqParams(meta)
              rebuildIvfPq(indexDir, corpus.snapshot(), nlist, m, ksub,
                idCol = idCol, vecCol = vecCol,
                residual = meta.exists(_.path("encoding").asText == "residual"))
            }
          }
        }
      })
  }

  /** Version inventory for any persisted index kind — one row per
    * version root still on disk: (name, live?, complete table set?,
    * bytes). The introspection behind `CALL show_index_versions`: what a
    * vacuum would reclaim, whether a crashed rebuild left an orphan,
    * per-version disk held. */
  def indexVersions(indexDir: String,
      kind: String): Seq[(String, Boolean, Boolean, Long)] =
    kind.toLowerCase match {
      case "ivfpq" => IndexMeta.versions(indexDir, "ivfpq_meta.json",
        Seq("centroids", "codebooks", "codes"))
      case "minhash" => IndexMeta.versions(indexDir, "minhash_meta.json",
        Seq("buckets"))
      case "lsh" => IndexMeta.versions(indexDir, "lsh_meta.json",
        Seq("buckets"))
      case other => throw new IllegalArgumentException(
        s"unknown index kind '$other': use ivfpq | minhash | lsh")
    }

  /** The parsed meta (timeline-committed, with the legacy-file fallback
    * [[IndexMeta.read]] documents), or None for a pre-meta (v1) index —
    * ONE read serving both the encoding flag and the drift baseline. */
  private def ivfPqMeta(indexDir: String): Option[com.fasterxml.jackson.databind.JsonNode] =
    IndexMeta.read(indexDir, "ivfpq_meta.json")

  /** Incremental index refresh — the operational complement of
    * [[buildIvfPq]] (FAISS's add()/remove-and-re-add shape): encode new
    * or changed vectors with the PERSISTED centroids + codebooks — no
    * retraining, one map pass over just the delta — and upsert their
    * codes into the codes table. A vector whose nearest cell changed
    * moves to its new cid partition via the global-index upsert (the old
    * row is tombstoned in place), so the inverted file stays consistent;
    * the lake timeline versions every refresh. Quantization drift (the
    * codebooks were trained before these vectors existed) is the standard
    * FAISS trade — rebuild when drift warrants it. Returns the commit
    * instant. */
  def upsertIvfPq(indexDir: String, vectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val spark = vectors.sparkSession
    // ONE meta read pins the version: root, encoding and trained state
    // all come from it, so a concurrent rebuild can't split this write
    // across versions
    val meta = ivfPqMeta(indexDir)
    val root = ivfPqRootOf(indexDir, meta)
    val (coarse, books) = loadTrained(spark, root)
    val vN = Similarity.l2normalize(vectors, vecCol)
    // encoding (residual vs raw) comes from the index's versioned meta —
    // a refresh can never mix encodings with the build
    val enc = Similarity.assignCodes(vN, coarse, books,
      meta.exists(_.path("encoding").asText == "residual"),
      idCol, vecCol, "vec_id")
    GraftTable.load(spark, s"$root/codes").upsertGlobal(enc)
  }

  /** Quantization-drift report for the persisted IVF-PQ index: mean
    * squared PQ reconstruction error of `vectors` (typically the latest
    * ingest delta, or an id-strided corpus sample) under the PERSISTED
    * centroids + codebooks, against the build-time baseline the meta file
    * records (the whole encoded corpus's mean error, observed for free
    * during the build's codes write). [[upsertIvfPq]] documents the FAISS
    * trade — codebooks trained before the delta existed quantize it
    * worse — and this is the statistic that says WHEN the rebuild is
    * warranted: `ratio` near 1 means the delta still matches the training
    * distribution; a sustained climb means recall is silently decaying
    * and the index should be rebuilt. One delta-scale map pass + scalar
    * aggregate — never a corpus or index scan. `trainMeanSqError` is None
    * only for a pre-baseline index (v1/early-v2, or a build whose mean was
    * non-finite); `ratio` is additionally None for an EMPTY probe (nothing
    * was measured — not "maximally healthy"). A legitimate ZERO baseline
    * (PQ reconstructs the build corpus exactly) still signals — any delta
    * error above it reads as ratio ∞, never as "no baseline". */
  def driftStats(indexDir: String, vectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DriftStats = {
    val meta = ivfPqMeta(indexDir)
    val residual = meta.exists(_.path("encoding").asText == "residual")
    val (coarse, books) = loadTrained(vectors.sparkSession,
      ivfPqRootOf(indexDir, meta))
    val (n, err) = Similarity.meanPqError(vectors, coarse, books,
      residual, vecCol)
    val trainErr = meta.map(_.path("train_err"))
      .filter(!_.isMissingNode).map(_.asDouble)
    // an EMPTY probe measured nothing: ratio None (same as pre-baseline),
    // never 0.0 — a monitoring caller keying rebuilds off ratio must not
    // read an empty delta as "reconstructing perfectly"
    DriftStats(n, err, trainErr, if (n == 0) None else trainErr.map { t =>
      if (t > 0) err / t
      else if (err == 0) 1.0
      else Double.PositiveInfinity
    })
  }

  /** [[driftStats]] result: `ratio` = meanSqError / trainMeanSqError —
    * the rebuild signal (None when the index predates the baseline;
    * ∞ when a zero baseline meets nonzero delta error). */
  case class DriftStats(n: Long, meanSqError: Double,
      trainMeanSqError: Option[Double], ratio: Option[Double])

  /** Delete vectors from the persisted IVF-PQ index — the takedown path
    * (FAISS `remove_ids`): a record removed from the corpus (takedown,
    * retention, dedup) must stop surfacing as a neighbor. The codes table
    * is keyed by vec_id but partitioned by cid, and the caller only knows
    * the ids — so the rows to tombstone are located with a left-semi join
    * against the index itself (an INDEX-scale scan of m-byte code rows,
    * never the corpus), then deleted through the ordinary record-level
    * delete door: the lake timeline versions the removal, and replaying
    * it is a same-key tombstone — idempotent. Returns the commit
    * instant. */
  def deleteIvfPq(indexDir: String, ids: DataFrame,
      idCol: String = "vec_id"): String = {
    val t = GraftTable.load(ids.sparkSession,
      s"${ivfPqRootOf(indexDir, ivfPqMeta(indexDir))}/codes")
    val doomed = t.snapshot().select("vec_id", "cid")
      .join(ids.select(col(idCol).as("vec_id")).distinct(),
        Seq("vec_id"), "left_semi")
      // pin the (key, partition) rows before writing to the table they
      // were read from — same posture as MinhashIndex.admit; the frame is
      // ids-sized, not corpus-sized
      .localCheckpoint(true)
    t.delete(doomed)
  }

  /** Train-free sibling: persist a random-hyperplane LSH index as ONE
    * graft table of (bucket, vec_id, table, vec) rows — one row per
    * (vector, hash table) — partitioned by the hash-table id (bounded:
    * `tables` partitions) and GLOBAL-SORTED on the (bucket, vec_id) key,
    * so each file within a partition covers a disjoint bucket range and
    * a probe's `bucket IN (...)` predicate prunes to ~1 file per bucket
    * from key-range stats alone. The (planes, tables) parameters ride in
    * a meta file so queries can't silently probe with mismatched
    * hyperplanes. Returns the number of index rows (vectors × tables). */
  def buildLsh(corpus: DataFrame, indexDir: String, planes: Int = 4,
      tables: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding",
      targetFileSizeRows: Int = 100000): Long = {
    val (rows, occ) = buildLshTable(corpus, indexDir, planes, tables,
      idCol, vecCol, targetFileSizeRows)
    writeLshMeta(indexDir, planes, tables, occ, dir = None)
    rows
  }

  /** Bucket + land the LSH table under `tablesRoot` — shared by
    * [[buildLsh]] (table at the index root) and [[rebuildLsh]] (table in
    * a fresh version subdir), so a rebuilt index is a fresh build by
    * construction. Returns (index rows, occupancy baseline — the
    * rows-per-(table, bucket) distribution of the just-written index,
    * read back as one column-pruned two-int-column aggregate; the
    * rebuild-trigger baseline [[occupancyStatsLsh]] compares against). */
  private def buildLshTable(corpus: DataFrame, tablesRoot: String,
      planes: Int, tables: Int, idCol: String, vecCol: String,
      targetFileSizeRows: Int): (Long, Option[(Long, Double, Double, Long)]) = {
    val spark = corpus.sparkSession
    val t = GraftTable.create(spark, s"$tablesRoot/buckets",
      TableConfig("ann_lsh_buckets", CopyOnWrite,
        keyFields = Seq("bucket", "vec_id"),
        partitioning = PartitionByColumns(Seq("table")),
        targetFileSizeRows = targetFileSizeRows))
    // range on the RAW (bucket, vec_id) columns — the probe predicate is
    // numeric, and decimal-string key slicing would wreck its file stats
    // (see GraftTable.bulkInsert's sortCols doc)
    val instant = t.bulkInsert(
      Similarity.lshBuckets(corpus, planes, tables, idCol, vecCol,
        "vec_id", "vec"),
      sortMode = "global_sort", sortCols = Seq("bucket", "vec_id"))
    // row count from the commit's write stats — no index-scale read-back
    // of the PAYLOAD; the occupancy baseline reads back only the two
    // grouping columns
    (t.commitRows(instant),
      IndexMeta.occupancyOf(t.snapshot().select("table", "bucket"), "table"))
  }

  private def writeLshMeta(indexDir: String, planes: Int, tables: Int,
      occ: Option[(Long, Double, Double, Long)], dir: Option[String]): Unit =
    IndexMeta.commit(indexDir, "lsh_meta.json",
      s"""{"planes":$planes,"tables":$tables""" +
        IndexMeta.occupancyJson(occ) +
        dir.map(d => s""","dir":"$d"""").getOrElse("") + "}")

  /** The parsed LSH meta plus the live table root — resolved from ONE
    * read, same posture as [[ivfPqMeta]]/[[ivfPqRootOf]]. */
  private def lshMeta(indexDir: String)
      : (Int, Int, String, Option[com.fasterxml.jackson.databind.JsonNode]) = {
    val meta = IndexMeta.read(indexDir, "lsh_meta.json")
    val m = meta.getOrElse(throw new IllegalStateException(
      s"no LSH index meta under $indexDir"))
    (m.path("planes").asInt, m.path("tables").asInt,
      IndexMeta.liveRoot(indexDir, meta), meta)
  }

  /** Atomic full rebuild of the LSH index with NEW (planes, tables) —
    * the parameter change a grown corpus actually needs (more planes
    * re-shrink the buckets [[occupancyStatsLsh]] watched balloon; more
    * tables buy the recall back): re-bucket the corpus into a fresh
    * `v<N>` subdir, then atomically re-point the meta through the index
    * timeline. Queries running during the rebuild serve the old version
    * end to end; the occupancy baseline resets to the new build's.
    * Returns the number of index rows. */
  def rebuildLsh(indexDir: String, corpus: DataFrame, planes: Int = 4,
      tables: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding",
      targetFileSizeRows: Int = 100000): Long = {
    val sub = IndexMeta.allocateVersion(indexDir)
    val (rows, occ) = buildLshTable(corpus, s"$indexDir/$sub", planes,
      tables, idCol, vecCol, targetFileSizeRows)
    writeLshMeta(indexDir, planes, tables, occ, dir = Some(sub))
    rows
  }

  /** [[vacuumIvfPq]] for the LSH index — same contract, same writer-
    * trailing cadence rule ([[reconcileLsh]] heals a discarded
    * superseded-version upsert from the corpus). */
  def vacuumLsh(indexDir: String): Int =
    IndexMeta.vacuum(indexDir, "lsh_meta.json", Seq("buckets"))

  /** Bucket-occupancy drift for the LSH index — the train-free analog of
    * [[driftStats]]: rows-per-(table, bucket) p99 now vs the build-time
    * baseline in the meta. A climbing ratio means the corpus outgrew the
    * plane count — candidate sets (and every probe's cost) are ballooning
    * — and [[rebuildLsh]] with more planes is warranted. One
    * column-pruned aggregate over the buckets table; never touches
    * vectors. */
  def occupancyStatsLsh(spark: SparkSession,
      indexDir: String): IndexMeta.OccupancyStats = {
    val (_, _, root, meta) = lshMeta(indexDir)
    IndexMeta.occupancyStats(
      GraftTable.load(spark, s"$root/buckets").snapshot()
        .select("table", "bucket"), "table", meta)
  }

  /** Incremental add for the LSH index: bucket ONLY the new vectors with
    * the build's persisted (planes, tables) — the hyperplanes are a
    * deterministic function of those parameters, so no train state is
    * read — and upsert their rows. Keys are (bucket, vec_id): replaying a
    * crashed batch re-upserts the same rows, exactly-once by idempotence.
    * For a CHANGED vector use [[refreshLsh]] — its OLD buckets are
    * different keys that a bare upsert would leave stale. */
  def upsertLsh(indexDir: String, vectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    // ONE meta read pins version + parameters together — a concurrent
    // rebuild can't split this write across versions or hyperplane sets
    val (planes, tables, root, _) = lshMeta(indexDir)
    GraftTable.load(vectors.sparkSession, s"$root/buckets").upsertGlobal(
      Similarity.lshBuckets(vectors, planes, tables, idCol, vecCol,
        "vec_id", "vec"))
  }

  /** Delete vectors from the persisted LSH index — see [[deleteIvfPq]]
    * for the contract; here a vector owns `tables` rows under DIFFERENT
    * (bucket, vec_id) keys, so the semi-join locates all of them. */
  def deleteLsh(indexDir: String, ids: DataFrame,
      idCol: String = "vec_id"): String = {
    val t = GraftTable.load(ids.sparkSession,
      s"${lshMeta(indexDir)._3}/buckets")
    val doomed = t.snapshot().select("bucket", "vec_id", "table")
      .join(ids.select(col(idCol).as("vec_id")).distinct(),
        Seq("vec_id"), "left_semi")
      .localCheckpoint(true)
    t.delete(doomed)
  }

  /** Changed-vector refresh for the LSH index: delete the ids' old rows,
    * then insert their new buckets — closing the staleness trade
    * [[upsertIvfPq]] documents (the IVF-PQ codes table is keyed by vec_id
    * alone, so its upsert IS the refresh; the LSH and MinhashIndex bucket
    * tables key on (bucket, id) and need the explicit two-step). Two
    * commits: a crash in between leaves the ids absent from the index
    * (invisible as neighbors, never wrong) and the replay re-runs both
    * keyed writes — idempotent. */
  def refreshLsh(indexDir: String, vectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    deleteLsh(indexDir, vectors.select(idCol), idCol)
    upsertLsh(indexDir, vectors, idCol, vecCol)
  }

  /** Query the persisted LSH index: bit-identical to
    * [[Similarity.lshTopK]] with the build's (planes, tables) — the
    * bucketing expression, collision join, exact-cosine scoring, and
    * two-phase top-k are shared code. The scan side filters to the
    * queries' probed buckets BEFORE the join (an explicit pushed-down
    * predicate — the probed set is |queries|·tables pairs, driver-tiny),
    * so key-range stats skip every unprobed file. */
  def queryLsh(indexDir: String, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    val spark = queries.sparkSession
    val (planes, tables, root, _) = lshMeta(indexDir)
    // size-aware like lshTopK (same estimate, same override knob): a
    // corpus-sized query frame shuffle-joins on (table, bucket) instead
    // of OOMing the driver as a broadcast — and then the probe-predicate
    // file-pruning below is skipped too (its driver collect has the same
    // |queries|·tables footprint as the broadcast it accompanies)
    val doBroadcast = Similarity.queryBroadcastDecision(
      queries, tables, broadcastQueries)
    // the pruning probe re-computes qb (a hash job over the queries), so
    // it additionally gates on the PAIR-CAP-sized estimate — a query set
    // that would blow the cap must not pay the probe only to full-scan
    val doProbe = doBroadcast && Similarity.probeDecision(
      queries.select(col(idCol)), tables, broadcastQueries)
    // when probing, PIN the (trickle-sized) queries first: the probe
    // collect and the collision join must bucket the SAME rows — a
    // non-deterministic query frame bucketed twice could push a pair set
    // that misses rows the join would match (the MinhashIndex.gate pin)
    val qb = Similarity.lshBuckets(
      if (doProbe) queries.localCheckpoint(true) else queries,
      planes, tables, idCol, vecCol, "query_id", "q_vec")
    val base = GraftTable.load(spark, s"$root/buckets").snapshot()
      .select(col("vec_id").as("neighbor_id"), col("table"), col("bucket"),
        col("vec").as("c_vec"))
    val enc = if (!doProbe) base else {
      // probed (table, bucket) pairs: one tiny driver-side set feeding
      // the shared per-partition disjunction — see
      // Similarity.probePairPredicate for why the pairing rides the
      // predicate; the limit probe bounds the collect regardless of what
      // the plan-time estimate claimed
      val pairs = qb.select(col("table"), col("bucket")).distinct()
        .limit(Similarity.ProbePairCap + 1).collect()
      if (pairs.length > Similarity.ProbePairCap) base
      else if (pairs.isEmpty) base.filter(lit(false))
      else base.filter(Similarity.probePairPredicate(
        pairs.toSeq.map(r => (r.getInt(0), r.getLong(1))), "table", "bucket"))
    }
    Similarity.rankLshCollisions(
      enc.join(if (doBroadcast) broadcast(qb) else qb,
        Seq("table", "bucket")), k)
  }

  /** Load the two metadata-sized tables back as driver arrays.
    * `tablesRoot` is the META-RESOLVED version dir ([[ivfPqRootOf]]), not
    * the index root — callers resolve once so version reads stay
    * consistent. */
  private def loadTrained(spark: SparkSession, tablesRoot: String)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val coarse = GraftTable.load(spark, s"$tablesRoot/centroids").snapshot()
      .select("cid", "vec").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray)
    val rows = GraftTable.load(spark, s"$tablesRoot/codebooks").snapshot()
      .select("sub", "cell", "vec").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m)(s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Float](2).toArray))
    (coarse, books)
  }

  /** Query a persisted IVF-PQ index: bit-identical to
    * [[Similarity.ivfPqTopK]] with the same build parameters, but with no
    * per-query training or corpus encode — and the codes scan prunes to
    * the probed cid partitions. `corpus` supplies the exact-rerank
    * vectors (the index stores codes only, the FAISS refine shape). */
  def queryIvfPq(indexDir: String, corpus: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 4, rerank: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    import graft.functions.IvfExprs.nearestCentroids
    val spark = corpus.sparkSession
    // ONE meta read pins the version for the whole query: a rebuild that
    // lands mid-plan re-points the meta, but this query keeps serving the
    // version it opened — never a half-built or mixed index
    val meta = ivfPqMeta(indexDir)
    val root = ivfPqRootOf(indexDir, meta)
    val (coarse, books) = loadTrained(spark, root)
    val cN = Similarity.l2normalize(corpus, vecCol)
    val qN = Similarity.l2normalize(queries, vecCol)
    // probed cells across all queries: the distinct cid set is bounded by
    // nlist (driver-tiny at ANY query count), so partition pruning is
    // safe even for corpus-sized query frames; the codes read lists and
    // scans ONLY those partitions
    val probed = qN
      .select(explode(nearestCentroids(col(vecCol), coarse, nprobe)).as("cid"))
      .distinct().collect().map(r => s"cid=${r.getInt(0)}").toSet
    val enc = GraftTable.load(spark, s"$root/codes")
      .snapshot(partitionPred = probed.contains)
      .select(col("vec_id").as("neighbor_id"), col("codes"), col("cid"))
    Similarity.ivfPqSearch(enc, cN, qN, coarse, books, k, nprobe, rerank,
      idCol, vecCol, broadcastQueries,
      residual = meta.exists(_.path("encoding").asText == "residual"))
  }
}
