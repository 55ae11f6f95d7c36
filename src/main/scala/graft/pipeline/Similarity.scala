package graft.pipeline

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (SURVEY.md §2.3).
 * Brute-force top-k is the exactness baseline (query side broadcast, one
 * pass over the corpus, per-query heap via window); LSH bucketing is the
 * 100 TB path — candidates shrink to same-bucket vectors, recall traded
 * via the number of hash tables.
 */
object Similarity {

  /** Per-query top-k without a candidates-sized per-query sort: ONE window
    * keyed on query_id ships every candidate of a query to one reducer
    * and sorts it there — at 10⁹ corpus vectors and ten queries, ten
    * reducers own the whole job. Phase 1 ranks within (query,
    * upstream-partition) slices — `spark_partition_id()` is captured
    * BEFORE the shuffle, so the window keys are numerous and balanced —
    * and phase 2 re-ranks only the ≤ k·numPartitions survivors
    * (metadata-sized). Identical to the single global window for any
    * deterministic total order (the global top k is a subset of the union
    * of partition-local top ks). Emits `rnk` (1-based long). */
  private def topKPerQuery(cands: DataFrame, k: Int,
      ord: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val wLocal = Window.partitionBy(col("query_id"), col("_part"))
      .orderBy(ord: _*)
    val wGlobal = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    cands.withColumn("_part", spark_partition_id())
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= k)
      .drop("_lr", "_part")
      .withColumn("rnk", row_number().over(wGlobal).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** ONE size-aware broadcast decision for every ANN query side: returns
    * whether the query frame should ride broadcast, from `base`'s
    * plan-time estimate (`optimizedPlan.stats`, no job) times `factor`
    * (the derived frame's row/width expansion: per-table or per-cell
    * explode, ADC tables) against the session's
    * `spark.sql.autoBroadcastJoinThreshold`. A corpus-vs-corpus query
    * frame (the SemDeDup-over-PQ shape — 10⁶+ queries) must NOT be
    * force-broadcast: that OOMs the driver where a shuffle join scales.
    * `overrideOpt` (the public `broadcastQueries` knob) wins when set. */
  private[pipeline] def queryBroadcastDecision(base: DataFrame, factor: Long,
      overrideOpt: Option[Boolean]): Boolean =
    overrideOpt.getOrElse {
      val threshold = base.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      val est = base.queryExecution.optimizedPlan.stats.sizeInBytes * factor
      threshold > 0 && est <= BigInt(threshold)
    }

  /** ONE probe-predicate shape for every persisted bucket index
    * ([[AnnIndex.queryLsh]]'s (table, bucket), [[MinhashIndex]]'s
    * (band, bucket)): the per-partition disjunction
    * `(part=p AND bucket IN (p's buckets)) OR …`. The pairing must ride
    * the PREDICATE, not just the later equi-join: a raw bucket-only InSet
    * is stats-tested against every partition's files, so with uniformly
    * distributed hash buckets each value may-match ~one file per
    * (value, partition) — barely any skipping — while here the
    * materialized partition column's [p, p] file stats kill every
    * wrong-partition branch and each bucket value then lands in ~one
    * file of that partition's bucket-range sort. */
  /** Hard cap on a pushed probe predicate's pair count: beyond it the
    * expression tree stops paying for itself (the plan-time may-match
    * walk visits every node per candidate file) and callers keep the
    * full-scan shuffle join. 4096 pairs = a 512-doc batch at 8 bands, or
    * 512 query vectors at 8 hash tables — well past any trickle probe. */
  private[pipeline] val ProbePairCap = 4096

  /** Whether a probe-pruning branch should even COMPUTE its pair set:
    * the probe costs a real job over the batch (a shingle+signature pass
    * for the MinHash gate), so a batch whose plan-time size estimate
    * already says the pair count will blow [[ProbePairCap]] must not pay
    * it only to fall back to the full scan — that is a pure regression
    * on large batches. The bound is `est(id frame bytes) · factor ≤
    * cap · 64` (a generous per-pair byte allowance): only genuinely
    * trickle-sized probes proceed, and the limit(cap+1) collect still
    * backstops an under-estimate. `overrideOpt` (probeBuckets /
    * broadcastQueries) wins when set. */
  private[pipeline] def probeDecision(idFrame: DataFrame, factor: Long,
      overrideOpt: Option[Boolean]): Boolean =
    overrideOpt.getOrElse {
      val est = idFrame.queryExecution.optimizedPlan.stats.sizeInBytes
      est * factor <= BigInt(ProbePairCap) * 64
    }

  private[pipeline] def probePairPredicate(pairs: Seq[(Int, Long)],
      partCol: String, bucketCol: String): org.apache.spark.sql.Column =
    pairs.groupBy(_._1).map { case (p, ps) =>
      col(partCol) === p &&
        col(bucketCol).isin(ps.map(x => Long.box(x._2)): _*)
    }.reduce(_ || _)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-pairs excluded). Small query sets ride broadcast so
    * the corpus never shuffles; a corpus-sized query frame falls back to
    * a distributed cross join (brute force IS all-pairs — the fallback
    * just keeps it off the driver). The corpus is scanned once and ranked
    * via the two-phase [[topKPerQuery]] — the plan a 1000-executor
    * cluster wants. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    import graft.functions.VectorExprs._
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normF(col(vecCol)).as("n_q"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      normF(col(vecCol)).as("n_c"))
    val joined =
      if (queryBroadcastDecision(queries, 1, broadcastQueries))
        c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      else c.crossJoin(q).filter(col("query_id") =!= col("neighbor_id"))
    val cands = joined
      .withColumn("sim", dotF(col("q_vec"), col("c_vec")) / (col("n_q") * col("n_c")))
    topKPerQuery(cands, k, Seq(col("sim").desc, col("neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** LSH parameters sized to the corpus: more hyperplanes as the corpus
    * grows (candidate buckets stay ~`targetBucket` vectors, so per-query
    * work is flat at any scale), with more tables to buy back the recall
    * each extra plane costs. At 10^9 vectors this yields ~22 planes and
    * the 32-table cap (22 planes collide similar pairs ~11% per table, so
    * 32 tables ≈ 97% recall vs 84% at 16 — worth the 2× index size). */
  def autoParams(corpusSize: Long, targetBucket: Int = 256): (Int, Int) = {
    val planes = math.max(2, math.min(24,
      math.ceil(math.log(math.max(1.0, corpusSize.toDouble / targetBucket)) / math.log(2)).toInt))
    val tables = math.max(8, math.min(32, planes * 2))
    (planes, tables)
  }

  /** [[lshTopK]] with planes/tables derived from the corpus row count. */
  def lshTopKAuto(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (planes, tables) = autoParams(corpus.count())
    lshTopK(corpus, queries, k, planes, tables, idCol, vecCol)
  }

  /** Train IVF coarse centroids with Lloyd iterations expressed as
    * DataFrame aggregations: assign (codegen'd nearest-centroid kernel,
    * one corpus pass) → per-(centroid, dim) mean (one shuffle of
    * nlist×dim partial sums — map-side combined, tiny) → collect the new
    * nlist×dim matrix to the driver (metadata-sized, like AQE stats).
    * Initialization is the first `nlist` vectors in id order —
    * deterministic across runs, no RNG. `sampleMod` trains on an
    * id-strided sample (at 100 TB you train on ~10⁵ vectors, not the
    * corpus). */
  def trainIvfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
      sampleMod: Long = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Float]] = {
    import graft.functions.IvfExprs.nearestCentroids
    val sample = (if (sampleMod > 1) corpus.filter(col(idCol) % sampleMod === 0)
                  else corpus).select(col(idCol), col(vecCol))
    var cents = sample.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(cents.nonEmpty, "cannot train IVF centroids on an empty corpus")
    for (_ <- 1 to iters) {
      val means = sample
        .withColumn("cid", element_at(nearestCentroids(col(vecCol), cents, 1), 1))
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg("v").as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCid.get(c) // an empty cell keeps its old centroid
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toArray)
          .getOrElse(cents(c))
      }.toArray
    }
    cents
  }

  /** Approximate top-k via an IVF (inverted-file) index: corpus vectors are
    * bucketed by nearest centroid, each query probes its `nprobe` nearest
    * cells, candidates are ranked by exact cosine. The 100 TB shape:
    * centroid assignment is one codegen'd map pass (no shuffle), the
    * candidate join is an equi-join on `cid` — broadcast when the query
    * side is small, shuffle otherwise (same size-aware branch as
    * [[lshTopK]]) — and each query touches nprobe/nlist of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, trainIters: Int = 3,
      trainSampleMod: Long = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    import graft.functions.IvfExprs.nearestCentroids
    import graft.functions.VectorExprs._
    val cents = trainIvfCentroids(corpus, nlist, trainIters, trainSampleMod, idCol, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      element_at(nearestCentroids(col(vecCol), cents, 1), 1).as("cid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(nearestCentroids(col(vecCol), cents, nprobe)).as("cid"))
    val joined =
      if (queryBroadcastDecision(queries, nprobe, broadcastQueries))
        c.join(broadcast(q), Seq("cid"))
      else c.join(q, Seq("cid"))
    val cands = joined
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dotF(col("q_vec"), col("c_vec")) /
        (normF(col("q_vec")) * normF(col("c_vec"))))
    topKPerQuery(cands, k, Seq(col("sim").desc, col("neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Per-row L2 normalization (zero vectors pass through), so dot product
    * over the normalized space IS cosine — the precondition for comparing
    * PQ-ADC rankings against the cosine brute force. */
  private[pipeline] def l2normalize(df: DataFrame, vecCol: String): DataFrame =
    // native kernel (PqExprs.L2NormalizeExpr): same arithmetic as the
    // when/transform formulation it replaces — (float)((double)v/norm),
    // zero-norm pass-through — but one O(d) codegen'd loop instead of a
    // per-ELEMENT interpreted lambda that re-derived the norm (O(d²))
    df.withColumn(vecCol, graft.functions.PqExprs.l2normalize(col(vecCol)))

  /** Train product-quantization codebooks (Jégou et al. 2011 "Product
    * Quantization for Nearest Neighbor Search"): the d-dim space splits
    * into `m` subspaces of d/m dims, each k-means'd INDEPENDENTLY with
    * `ksub` centroids — reusing [[trainIvfCentroids]]'s Lloyd-as-DataFrame-
    * aggs on the sliced column, so training is deterministic (id-ordered
    * init, no RNG) and runs on an id-strided sample (at 100 TB you train
    * on ~10⁵ vectors, m·iters passes over the SAMPLE, never the corpus).
    * Returns [m][ksub][d/m]. */
  def trainPqCodebooks(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 3,
      sampleMod: Long = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Array[Float]]] = {
    import graft.functions.IvfExprs.nearestCentroids
    val dim = corpus.agg(max(size(col(vecCol)))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val sample = (if (sampleMod > 1) corpus.filter(col(idCol) % sampleMod === 0)
                  else corpus).select(col(idCol), col(vecCol))
    // deterministic init: the first ksub sample vectors in id order, sliced
    // per subspace — ONE collect for all m codebooks
    val init = sample.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    require(init.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m)(s => init.map(v => v.slice(s * dsub, (s + 1) * dsub)))
    // every Lloyd iteration is ONE Spark job for ALL m subspaces (not m):
    // assign per-subspace cells in a single projection, posexplode the
    // vector, key each element by (subspace, cell, pos-in-subspace), one
    // map-side-combined mean — the shuffle carries m·ksub·dsub cells
    for (_ <- 1 to iters) {
      val assigns = books.indices.map(s =>
        element_at(nearestCentroids(
          slice(col(vecCol), s * dsub + 1, dsub), books(s), 1), 1).as(s"_c$s"))
      val cids = array(books.indices.map(s => col(s"_c$s")): _*)
      val means = sample.select(col(vecCol) +: assigns: _*)
        .select(cids.as("_cids"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .select((col("pos") / dsub).cast("int").as("sub"),
          (col("pos") % dsub).as("spos"),
          element_at(col("_cids"), (col("pos") / dsub).cast("int") + 1).as("cid"),
          col("v"))
        .groupBy("sub", "cid", "spos").agg(avg("v").as("m"))
        .collect()
      val byCell = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = Array.tabulate(m) { s =>
        books(s).indices.map { c =>
          byCell.get((s, c)) // an empty cell keeps its old centroid
            .map(_.sortBy(_.getInt(2)).map(_.getDouble(3).toFloat).toArray)
            .getOrElse(books(s)(c))
        }.toArray
      }
    }
    books
  }

  /** Encode each vector as `m` sub-codes (nearest centroid per subspace,
    * codegen'd kernel, one pass, no shuffle): d·4 bytes shrink to m
    * small ints — the index compression that lets a 100 TB corpus's ANN
    * index fit in executor memory. */
  /** The m-sub-code array expression for one vector column. */
  private[pipeline] def pqCodes(books: Array[Array[Array[Float]]],
      vecCol: String): org.apache.spark.sql.Column =
    // native kernel: the exact per-subspace assign() loop, no slice
    // materialization (PqExprs.PqCodesExpr)
    graft.functions.PqExprs.pqCodes(col(vecCol), books)

  def pqEncode(vecs: DataFrame, books: Array[Array[Array[Float]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vecs.select(col(idCol), pqCodes(books, vecCol).as("codes"))

  /** Squared PQ reconstruction error of one (already residual-or-raw)
    * vector column: Σ_sub ‖res_sub − codebook[sub][nearest cell]‖² — the
    * quantity PQ training minimizes, so its mean over a corpus sample is
    * THE quantization-drift statistic: vectors from the training
    * distribution score near the build-time mean, a drifted delta scores
    * above it (the codebooks were trained before those vectors existed —
    * the rebuild signal [[AnnIndex.driftStats]] serves). */
  private[pipeline] def pqSqError(books: Array[Array[Array[Float]]],
      resCol: String): org.apache.spark.sql.Column =
    // nearest cell ≡ assigned code (same assign() loop), so decoding from
    // freshly-computed codes is the same number — one native pass
    graft.functions.PqExprs.pqSqErrorFromCodes(col(resCol),
      graft.functions.PqExprs.pqCodes(col(resCol), books), books)

  /** [[pqSqError]] when the codes are ALREADY assigned (the build's encode
    * pass): decode each sub-cell by literal lookup instead of recomputing
    * the nearest centroid — the assigned code IS the nearest cell, so the
    * two forms are the same number by construction. */
  private[pipeline] def pqSqErrorFromCodes(books: Array[Array[Array[Float]]],
      resCol: String, codesCol: String): org.apache.spark.sql.Column =
    graft.functions.PqExprs.pqSqErrorFromCodes(col(resCol), col(codesCol), books)

  /** Mean squared reconstruction error of `vectors` under an ALREADY-
    * TRAINED (coarse, books) pair — one map pass + a scalar aggregate,
    * no shuffle beyond the final combine. [[AnnIndex.driftStats]]'s delta
    * probe; the same per-row statistic the build observes over the whole
    * encoded corpus via [[pqSqErrorFromCodes]] during its codes write
    * (nearest cell ≡ assigned code, so the two forms agree by
    * construction). */
  private[pipeline] def meanPqError(vectors: DataFrame,
      coarse: Array[Array[Float]], books: Array[Array[Array[Float]]],
      residual: Boolean, vecCol: String): (Long, Double) = {
    import graft.functions.IvfExprs.nearestCentroids
    val vN = l2normalize(vectors, vecCol)
    val cid = element_at(nearestCentroids(col(vecCol), coarse, 1), 1)
    val src =
      if (residual) vN.withColumn("_res", residualOf(col(vecCol), cid, coarse))
      else vN.withColumn("_res", col(vecCol))
    val row = src.select(pqSqError(books, "_res").as("_e"))
      .agg(count(lit(1)).as("n"), avg(col("_e")).as("err")).head
    (row.getLong(0), if (row.isNullAt(1)) 0.0 else row.getDouble(1))
  }

  /** Per-query ADC lookup tables as ONE array<array<double>> column
    * (native kernel — same per-cell dot products and order as the
    * per-subspace literal-codebook columns it replaces). */
  private def adcTables(books: Array[Array[Array[Float]]],
      vecCol: String): Seq[org.apache.spark.sql.Column] =
    Seq(graft.functions.PqExprs.adcTables(col(vecCol), books).as("_t"))

  /** ADC score of a `codes` row against the query's `_t` tables. */
  private def adcScore(m: Int): org.apache.spark.sql.Column =
    graft.functions.PqExprs.adcScore(col("codes"), col("_t"))

  /** Residual of `vec` against its cell's coarse centroid (float math,
    * deterministic): the quantity residual PQ encodes. Native kernel —
    * same element-wise float subtraction as the zip_with it replaces. */
  private def residualOf(vec: org.apache.spark.sql.Column,
      cid: org.apache.spark.sql.Column,
      coarse: Array[Array[Float]]): org.apache.spark.sql.Column =
    graft.functions.PqExprs.residual(vec, cid, coarse)

  /** q · coarse[cid] — the per-(query, probed-cell) constant residual ADC
    * adds back: q·x = q·c + q·r when x = c + r. */
  private def qDotCentroid(vec: org.apache.spark.sql.Column,
      cid: org.apache.spark.sql.Column,
      coarse: Array[Array[Float]]): org.apache.spark.sql.Column =
    graft.functions.PqExprs.qDotCentroid(vec, cid, coarse)

  /** FAISS-style IVF-PQ: coarse centroids prune candidates to the query's
    * `nprobe` cells (equi-join on cid, never a cross join), PQ-ADC ranks
    * within them (m lookups per candidate over m-byte codes), and the
    * k·rerank shortlist reranks by exact cosine. The complete 100 TB ANN
    * architecture: per query, work = nprobe/nlist of the corpus scanned as
    * CODES plus k·rerank full vectors — both knobs trade recall for cost
    * independently.
    *
    * `residual = true` (the default, FAISS's default too) encodes each
    * vector's RESIDUAL against its cell's coarse centroid instead of the
    * raw normalized vector: residuals are smaller and re-centered, so the
    * same (m, ksub) budget quantizes them with less error — materially
    * better recall for free once the coarse step exists. The ADC identity
    * is exact: q·x = q·c (one constant per (query, probed cell)) + q·r
    * (the table lookups); codebooks are trained on residuals. `false`
    * keeps the raw-vector encoding (and is what pre-residual persisted
    * indexes load as). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      trainIters: Int = 3, trainSampleMod: Long = 1, rerank: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None,
      residual: Boolean = true): DataFrame = {
    val cN = l2normalize(corpus, vecCol)
    val qN = l2normalize(queries, vecCol)
    val coarse = trainIvfCentroids(cN, nlist, trainIters, trainSampleMod, idCol, vecCol)
    val (books, enc) = encodeIvfPq(cN, coarse, m, ksub, trainIters,
      trainSampleMod, residual, idCol, vecCol)
    ivfPqSearch(enc, cN, qN, coarse, books, k, nprobe, rerank, idCol, vecCol,
      broadcastQueries, residual)
  }

  /** Train codebooks (on residuals or raw vectors) and encode the corpus —
    * codes + coarse cell in ONE projection over one corpus pass, no
    * self-join to reunite them. Shared by [[ivfPqTopK]] and
    * [[AnnIndex.buildIvfPq]] so in-memory and persisted codes are
    * bit-identical. `cN` must already be L2-normalized. */
  private[pipeline] def encodeIvfPq(cN: DataFrame, coarse: Array[Array[Float]],
      m: Int, ksub: Int, trainIters: Int, trainSampleMod: Long,
      residual: Boolean, idCol: String, vecCol: String,
      errAs: Option[String] = None)
      : (Array[Array[Array[Float]]], DataFrame) = {
    import graft.functions.IvfExprs.nearestCentroids
    val cid = element_at(nearestCentroids(col(vecCol), coarse, 1), 1)
    val encSrc =
      if (residual) cN.withColumn("_res", residualOf(col(vecCol), cid, coarse))
      else cN.withColumn("_res", col(vecCol))
    val books = trainPqCodebooks(encSrc, m, ksub, trainIters,
      trainSampleMod, idCol, "_res")
    (books, assignCodes(cN, coarse, books, residual, idCol, vecCol,
      "neighbor_id", errAs))
  }

  /** Encode vectors against ALREADY-TRAINED centroids + codebooks (one
    * map pass, no shuffle) — the index-refresh path shares this with the
    * build so delta codes are produced exactly like build codes. `vN`
    * must already be L2-normalized. Emits (idAs, cid, codes). */
  private[pipeline] def assignCodes(vN: DataFrame, coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]], residual: Boolean,
      idCol: String, vecCol: String, idAs: String,
      errAs: Option[String] = None): DataFrame = {
    import graft.functions.IvfExprs.nearestCentroids
    val cid = element_at(nearestCentroids(col(vecCol), coarse, 1), 1)
    val src =
      if (residual) vN.withColumn("_res", residualOf(col(vecCol), cid, coarse))
      else vN.withColumn("_res", col(vecCol))
    val coded = src.select(col(idCol).as(idAs), cid.as("cid"),
      pqCodes(books, "_res").as("codes"), col("_res"))
    // errAs: per-row squared reconstruction error decoded from the JUST-
    // assigned codes (no second nearest-cell pass) — the build observes
    // its mean during the codes write as the drift baseline
    errAs.foldLeft(coded) { (d, e) =>
      d.withColumn(e, pqSqErrorFromCodes(books, "_res", "codes"))
    }.drop("_res")
  }

  /** The IVF-PQ query side over an ALREADY-ENCODED corpus — shared verbatim
    * by [[ivfPqTopK]] (in-memory build) and [[AnnIndex.queryIvfPq]]
    * (persisted index), so the two paths are bit-identical by
    * construction. `enc` carries (neighbor_id, codes, cid); `cN`/`qN` are
    * the L2-normalized corpus (exact-rerank source) and queries.
    * `residual` must match how `enc`'s codes were produced. */
  private[pipeline] def ivfPqSearch(enc: DataFrame, cN: DataFrame,
      qN: DataFrame, coarse: Array[Array[Float]],
      books: Array[Array[Array[Float]]], k: Int, nprobe: Int, rerank: Int,
      idCol: String, vecCol: String,
      broadcastQueries: Option[Boolean] = None,
      residual: Boolean = false): DataFrame = {
    import graft.functions.IvfExprs.nearestCentroids
    val m = books.length
    // residual ADC: score = q·c (cell constant, one column per exploded
    // probe row) + Σ table lookups of the residual codebooks. Two selects
    // (explode first, then the cid-dependent _qc) — the optimizer
    // collapses the projections.
    val qExp = qN.select(col(idCol).as("query_id"), col(vecCol),
      explode(nearestCentroids(col(vecCol), coarse, nprobe)).as("cid"))
    val qcCols =
      if (residual) Seq(qDotCentroid(col(vecCol), col("cid"), coarse).as("_qc"))
      else Seq.empty
    val qT = qExp.select(Seq(col("query_id"), col("cid")) ++
      qcCols ++ adcTables(books, vecCol): _*)
    // size-aware like [[lshTopK]]: each query row explodes nprobe ways and
    // swaps its embedding for the m·ksub-float ADC table (≈2× the vector
    // at defaults, hence the extra factor); a corpus-sized query frame
    // falls back to a shuffle join on cid instead of OOMing the driver
    val qJoin =
      if (queryBroadcastDecision(qN, nprobe.toLong * 2, broadcastQueries))
        broadcast(qT)
      else qT
    val score = if (residual) col("_qc") + adcScore(m) else adcScore(m)
    // the ADC shortlist ranks nprobe/nlist of the corpus per query — the
    // two-phase rank keeps that off a single per-query reducer
    val shortlist = topKPerQuery(
      enc.join(qJoin, Seq("cid"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_adc", score),
      k * math.max(1, rerank), Seq(col("_adc").desc, col("neighbor_id")))
      .select(col("query_id"), col("neighbor_id"))
    rerankShortlist(shortlist, cN, qN, k, idCol, vecCol, broadcastQueries)
  }

  /** Exact-cosine rerank of an ADC shortlist (the FAISS refine step) —
    * shared tail of [[ivfPqSearch]] and [[pqTopK]]. The query-vector join
    * is size-aware: the shortlist is k·rerank rows per query
    * (metadata-sized), so an un-broadcastable query frame just shuffles
    * both small sides on query_id. */
  private def rerankShortlist(shortlist: DataFrame, cN: DataFrame,
      qN: DataFrame, k: Int, idCol: String, vecCol: String,
      broadcastQueries: Option[Boolean]): DataFrame = {
    import graft.functions.VectorExprs._
    val cVec = cN.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val qVec = qN.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val qJoin =
      if (queryBroadcastDecision(qN, 1, broadcastQueries)) broadcast(qVec) else qVec
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    shortlist.join(cVec, Seq("neighbor_id")).join(qJoin, Seq("query_id"))
      .withColumn("sim", dotF(col("q_vec"), col("c_vec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Approximate top-k via PQ asymmetric distance computation (ADC): both
    * sides L2-normalize (so scores approximate cosine), the corpus encodes
    * once to m-byte codes, and each query precomputes ONE (m × ksub)
    * table of subspace dot products against the codebooks — scoring a
    * candidate is then m array lookups over its codes, never touching the
    * original vector. The scan side reads codes only (the compressed
    * index); small query sets ride broadcast with their tables, and a
    * corpus-sized query frame falls back to a distributed cross join
    * (flat ADC IS all-pairs over codes — the fallback keeps it off the
    * driver; the pruned at-scale shape is [[ivfPqTopK]]). The 100 TB
    * shape: compose with [[ivfTopK]]'s coarse cells to prune candidates,
    * exactly as FAISS IVF-PQ does. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, trainIters: Int = 3,
      trainSampleMod: Long = 1, rerank: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    val cN = l2normalize(corpus, vecCol)
    val qN = l2normalize(queries, vecCol)
    val books = trainPqCodebooks(cN, m, ksub, trainIters, trainSampleMod, idCol, vecCol)
    val enc = pqEncode(cN, books, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val qT = qN.select(col(idCol).as("query_id") +: adcTables(books, vecCol): _*)
    // ADC shortlist over codes only (two-phase rank — the full-corpus
    // code scan never sorts on one per-query reducer), then EXACT rerank
    // of k·rerank candidates against the true vectors (the FAISS refine
    // step): the full-width scan stays m lookups/row; exact cosine
    // touches only the shortlist — a vanishing fraction at scale
    val joined =
      if (queryBroadcastDecision(qN, 2, broadcastQueries))
        enc.join(broadcast(qT), col("query_id") =!= col("neighbor_id"))
      else enc.crossJoin(qT).filter(col("query_id") =!= col("neighbor_id"))
    val shortlist = topKPerQuery(
      joined.withColumn("_adc", adcScore(m)),
      k * math.max(1, rerank), Seq(col("_adc").desc, col("neighbor_id")))
      .select(col("query_id"), col("neighbor_id"))
    rerankShortlist(shortlist, cN, qN, k, idCol, vecCol, broadcastQueries)
  }

  /** Approximate top-k via random-hyperplane LSH with `tables` independent
    * hash tables: candidates = vectors sharing a bucket with the query in
    * any table, ranked by exact cosine.
    *
    * Join strategy is SIZE-AWARE: a small query set (the common case —
    * interactive ANN) is broadcast so the corpus never shuffles; a large
    * query frame (corpus-vs-corpus ANN) would OOM the driver as a broadcast,
    * so it falls back to a shuffle join on (table, bucket). The estimate is
    * plan-time (`optimizedPlan.stats`, no job) × `tables` (each query row is
    * exploded per table, carrying its embedding) against the session's
    * `spark.sql.autoBroadcastJoinThreshold`; `broadcastQueries` overrides. */
  /** One row per (vector, hash table): (idAs, vecAs, table, bucket) — the
    * shared bucketing of [[lshTopK]] and the persisted [[AnnIndex]] LSH
    * index (same expression ⇒ same buckets ⇒ bit-identical candidates). */
  private[pipeline] def lshBuckets(df: DataFrame, planes: Int, tables: Int,
      idCol: String, vecCol: String, idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs), posexplode(
      array((0 until tables).map(t => lshBucket(col(vecCol), planes, t * 1000)): _*))
      .as(Seq("table", "bucket")))

  /** Exact-cosine ranking of LSH bucket collisions — shared tail of
    * [[lshTopK]] and [[AnnIndex.queryLsh]]. Scores BEFORE deduplicating
    * multi-table collisions (the cosine is identical per pair, so
    * first(sim) is exact and the dedup shuffle carries 8 bytes per row
    * instead of two embedding payloads), then two-phase per-query top-k. */
  private[pipeline] def rankLshCollisions(joined: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorExprs._
    val cands = joined
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dotF(col("q_vec"), col("c_vec")) /
        (normF(col("q_vec")) * normF(col("c_vec"))))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("sim")).as("sim"))
    topKPerQuery(cands, k, Seq(col("sim").desc, col("neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 4, tables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      lshBuckets(df, planes, tables, idCol, vecCol, id, vec)
    val qb = bucketed(queries, "query_id", "q_vec")
    val cb = bucketed(corpus, "neighbor_id", "c_vec")
    val joined =
      if (queryBroadcastDecision(queries, tables, broadcastQueries))
        cb.join(broadcast(qb), Seq("table", "bucket"))
      else cb.join(qb, Seq("table", "bucket"))
    rankLshCollisions(joined, k)
  }
}
