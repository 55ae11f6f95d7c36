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
    val centroidsT = GraftTable.create(spark, s"$indexDir/centroids",
      TableConfig("ann_centroids", CopyOnWrite, keyFields = Seq("cid")))
    centroidsT.bulkInsert(
      coarse.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
        .toDF("cid", "vec"))
    val codebooksT = GraftTable.create(spark, s"$indexDir/codebooks",
      TableConfig("ann_codebooks", CopyOnWrite, keyFields = Seq("sub", "cell")))
    codebooksT.bulkInsert(
      books.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (v, c) => (s, c, v) }
      }.toSeq.toDF("sub", "cell", "vec"))
    // codes landed partitioned by cid — the inverted file IS the
    // partition layout
    val codesT = GraftTable.create(spark, s"$indexDir/codes",
      TableConfig("ann_codes", CopyOnWrite, keyFields = Seq("vec_id"),
        partitioning = PartitionByColumns(Seq("cid"))))
    // drift baseline: mean squared reconstruction error of the WHOLE
    // encoded corpus, observed DURING the codes write (error decoded from
    // the just-assigned codes + a CollectMetrics node — zero extra jobs,
    // zero extra corpus reads), persisted so driftStats can compare
    // future deltas against what the index achieved at build time
    val obs = org.apache.spark.sql.Observation("pq_train_err")
    val instant = codesT.bulkInsert(enc
      .observe(obs, avg(col("_err")).as("err"))
      .select(col("neighbor_id").as("vec_id"), col("cid"), col("codes")))
    val trainErr = obs.get.get("err") match {
      case Some(v: java.lang.Double) => v.doubleValue
      case _ => 0.0
    }
    // a NaN/Infinity mean (one poisoned embedding) must not write invalid
    // JSON that bricks every later read of the index — such a build simply
    // records no baseline (driftStats reports it as pre-baseline)
    val errField =
      if (java.lang.Double.isFinite(trainErr)) s""","train_err":$trainErr"""
      else ""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(indexDir, "ivfpq_meta.json"),
      (s"""{"version":2,"encoding":"${if (residual) "residual" else "raw"}"""" +
        s"""$errField}""").getBytes("UTF-8"))
    // indexed-row count from the commit's write stats — no corpus-scale
    // read-back of the table we just wrote
    codesT.commitRows(instant)
  }

  /** The parsed meta file, or None for a pre-meta (v1) index — ONE read
    * serving both the encoding flag and the drift baseline. */
  private def ivfPqMeta(indexDir: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val p = java.nio.file.Paths.get(indexDir, "ivfpq_meta.json")
    if (!java.nio.file.Files.exists(p)) None
    else Some(graft.table.Json.mapper.readTree(java.nio.file.Files.readAllBytes(p)))
  }

  /** Whether `indexDir` holds residual-encoded codes: v2 meta says;
    * a missing meta file IS the v1 raw-vector format. */
  private def ivfPqResidual(indexDir: String): Boolean =
    ivfPqMeta(indexDir).exists(_.path("encoding").asText == "residual")

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
    val (coarse, books) = loadTrained(spark, indexDir)
    val vN = Similarity.l2normalize(vectors, vecCol)
    // encoding (residual vs raw) comes from the index's versioned meta —
    // a refresh can never mix encodings with the build
    val enc = Similarity.assignCodes(vN, coarse, books,
      ivfPqResidual(indexDir), idCol, vecCol, "vec_id")
    GraftTable.load(spark, s"$indexDir/codes").upsertGlobal(enc)
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
    * aggregate — never a corpus or index scan. `trainMeanSqError` and
    * `ratio` are None only for a pre-baseline index (v1/early-v2, or a
    * build whose mean was non-finite); a legitimate ZERO baseline (PQ
    * reconstructs the build corpus exactly) still signals — any delta
    * error above it reads as ratio ∞, never as "no baseline". */
  def driftStats(indexDir: String, vectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DriftStats = {
    val meta = ivfPqMeta(indexDir)
    val residual = meta.exists(_.path("encoding").asText == "residual")
    val (coarse, books) = loadTrained(vectors.sparkSession, indexDir)
    val (n, err) = Similarity.meanPqError(vectors, coarse, books,
      residual, vecCol)
    val trainErr = meta.map(_.path("train_err"))
      .filter(!_.isMissingNode).map(_.asDouble)
    DriftStats(n, err, trainErr, trainErr.map { t =>
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
    val t = GraftTable.load(ids.sparkSession, s"$indexDir/codes")
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
      vecCol: String = "embedding"): Long = {
    val spark = corpus.sparkSession
    val t = GraftTable.create(spark, s"$indexDir/buckets",
      TableConfig("ann_lsh_buckets", CopyOnWrite,
        keyFields = Seq("bucket", "vec_id"),
        partitioning = PartitionByColumns(Seq("table")),
        targetFileSizeRows = 100000))
    val instant = t.bulkInsert(
      Similarity.lshBuckets(corpus, planes, tables, idCol, vecCol,
        "vec_id", "vec"),
      sortMode = "global_sort")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(indexDir, "lsh_meta.json"),
      s"""{"planes":$planes,"tables":$tables}""".getBytes("UTF-8"))
    // row count from the commit's write stats — no index-scale read-back
    t.commitRows(instant)
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
    val meta = graft.table.Json.mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(indexDir, "lsh_meta.json")))
    GraftTable.load(vectors.sparkSession, s"$indexDir/buckets").upsertGlobal(
      Similarity.lshBuckets(vectors, meta.path("planes").asInt,
        meta.path("tables").asInt, idCol, vecCol, "vec_id", "vec"))
  }

  /** Delete vectors from the persisted LSH index — see [[deleteIvfPq]]
    * for the contract; here a vector owns `tables` rows under DIFFERENT
    * (bucket, vec_id) keys, so the semi-join locates all of them. */
  def deleteLsh(indexDir: String, ids: DataFrame,
      idCol: String = "vec_id"): String = {
    val t = GraftTable.load(ids.sparkSession, s"$indexDir/buckets")
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
    val meta = graft.table.Json.mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(indexDir, "lsh_meta.json")))
    val (planes, tables) = (meta.path("planes").asInt, meta.path("tables").asInt)
    val qb = Similarity.lshBuckets(queries, planes, tables, idCol, vecCol,
      "query_id", "q_vec")
    // size-aware like lshTopK (same estimate, same override knob): a
    // corpus-sized query frame shuffle-joins on (table, bucket) instead
    // of OOMing the driver as a broadcast — and then the bucket InSet
    // file-pruning below is skipped too (its driver collect has the same
    // |queries|·tables footprint as the broadcast it accompanies)
    val doBroadcast = Similarity.queryBroadcastDecision(
      queries, tables, broadcastQueries)
    val base = GraftTable.load(spark, s"$indexDir/buckets").snapshot()
      .select(col("vec_id").as("neighbor_id"), col("table"), col("bucket"),
        col("vec").as("c_vec"))
    val enc = if (!doBroadcast) base else {
      // probed buckets: one tiny driver-side set feeding a plain
      // `bucket IN (...)` predicate — a RAW-column InSet the scan's
      // key-range file stats can act on (a composite (table, bucket)
      // expression would defeat stats pruning); the equi-join right after
      // enforces the exact (table, bucket) pairing anyway
      val probed = qb.select(col("bucket")).distinct()
        .collect().map(_.getLong(0))
      base.filter(col("bucket").isin(probed.map(Long.box): _*))
    }
    Similarity.rankLshCollisions(
      enc.join(if (doBroadcast) broadcast(qb) else qb,
        Seq("table", "bucket")), k)
  }

  /** Load the two metadata-sized tables back as driver arrays. */
  private def loadTrained(spark: SparkSession, indexDir: String)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val coarse = GraftTable.load(spark, s"$indexDir/centroids").snapshot()
      .select("cid", "vec").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray)
    val rows = GraftTable.load(spark, s"$indexDir/codebooks").snapshot()
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
    val (coarse, books) = loadTrained(spark, indexDir)
    val cN = Similarity.l2normalize(corpus, vecCol)
    val qN = Similarity.l2normalize(queries, vecCol)
    // probed cells across all queries: the distinct cid set is bounded by
    // nlist (driver-tiny at ANY query count), so partition pruning is
    // safe even for corpus-sized query frames; the codes read lists and
    // scans ONLY those partitions
    val probed = qN
      .select(explode(nearestCentroids(col(vecCol), coarse, nprobe)).as("cid"))
      .distinct().collect().map(r => s"cid=${r.getInt(0)}").toSet
    val enc = GraftTable.load(spark, s"$indexDir/codes")
      .snapshot(partitionPred = probed.contains)
      .select(col("vec_id").as("neighbor_id"), col("codes"), col("cid"))
    Similarity.ivfPqSearch(enc, cN, qN, coarse, books, k, nprobe, rerank,
      idCol, vecCol, broadcastQueries, residual = ivfPqResidual(indexDir))
  }
}
