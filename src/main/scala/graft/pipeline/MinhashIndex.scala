package graft.pipeline

import graft.table._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Persisted MinHash band-bucket index (SURVEY.md §2.3) — the dedup sibling
 * of [[AnnIndex]]: the build-once/refresh-incrementally shape of the
 * continuous-crawl near-dup gate. Without it, every
 * [[Dedup.minhashIncremental]] batch pays one full corpus shingle +
 * signature pass — corpus-linear per batch, quadratic over the crawl's
 * life. With it, the corpus side of the gate is a scan of this table:
 *
 *   - `buckets` (bucket, doc_id, band) — `bands` rows per corpus document,
 *     partitioned by band (bounded: `bands` partitions) and GLOBAL-SORTED
 *     on (bucket, doc_id), the same posture as [[AnnIndex.buildLsh]]: each
 *     file within a band partition covers a disjoint bucket range, and
 *     [[gate]]'s small-batch branch pushes the batch's probed
 *     (band, bucket) pairs into the scan, so file stats prune the probe
 *     to the few colliding files.
 *
 * The banding parameters (n, numHashes, bands) ride in the
 * timeline-committed index meta ([[IndexMeta]]) so a gate can't silently
 * probe with mismatched shingling — and since a parameter change
 * invalidates every persisted row, changing them on a LIVE index is
 * [[rebuild]]: a fresh `v<N>` version + an atomic meta re-point, with
 * [[vacuum]] as the deferred cleanup and [[occupancyStats]] (bucket p99
 * vs the build baseline) as the WHEN-to-rebuild signal. Signatures and
 * banding are the module's ONE shared definition
 * ([[Dedup.signaturesFrom]] / [[Dedup.bandBuckets]]), so the persisted
 * gate is bit-identical to the inline one by construction (both are
 * deterministic xxhash64 transforms — no RNG).
 *
 * 100 TB posture: the build is the one corpus-scale job; each batch then
 * costs O(batch shingles + index scan + candidates) — the corpus TEXT is
 * re-read only for candidate docs (a semi-join pushed at the lake table),
 * never re-shingled wholesale. Refresh is a keyed upsert like any other
 * table write: replaying a crashed batch re-upserts the same
 * (bucket, doc_id) keys — exactly-once by idempotence — and the lake
 * timeline gives the index versioning and time travel for free.
 *
 * Ref (behavior, not code): hudi-utilities deltastreamer's
 * transformer-chain ingest loop; Lee et al. 2022 / CCNet for the
 * gate-new-crawl-batches-against-curated-corpus shape.
 */
object MinhashIndex {

  /** Shingle + signature + band the curated corpus ONCE and persist the
    * band-bucket table under `indexDir`. Returns the number of index rows
    * (documents × bands), read from the commit's write stats — no
    * index-scale read-back. */
  def build(corpus: DataFrame, indexDir: String, n: Int = 3,
      numHashes: Int = 32, bands: Int = 8, idCol: String = "doc_id",
      textCol: String = "text", targetFileSizeRows: Int = 100000): Long = {
    val (rows, occ) = buildTable(corpus, indexDir, n, numHashes, bands,
      idCol, textCol, targetFileSizeRows)
    writeMeta(indexDir, n, numHashes, bands, occ, dir = None)
    rows
  }

  /** Band + land the buckets table under `tablesRoot` — shared by
    * [[build]] (table at the index root) and [[rebuild]] (fresh version
    * subdir), so a rebuilt index is a fresh build by construction.
    * Returns (index rows, occupancy baseline — rows-per-(band, bucket)
    * of the just-written index, read back as one column-pruned
    * two-int-column aggregate for [[occupancyStats]] to compare
    * against). */
  private def buildTable(corpus: DataFrame, tablesRoot: String, n: Int,
      numHashes: Int, bands: Int, idCol: String, textCol: String,
      targetFileSizeRows: Int): (Long, Option[(Long, Double, Double, Long)]) = {
    val spark = corpus.sparkSession
    val t = GraftTable.create(spark, s"$tablesRoot/buckets",
      TableConfig("minhash_buckets", CopyOnWrite,
        keyFields = Seq("bucket", "doc_id"),
        partitioning = PartitionByColumns(Seq("band")),
        targetFileSizeRows = targetFileSizeRows))
    // range on the RAW (bucket, doc_id) columns, not the record-key
    // string: the gate probes the numeric bucket column, and decimal
    // string slicing would leave its per-file numeric stats useless
    val instant = t.bulkInsert(bandRows(corpus, n, numHashes, bands,
      idCol, textCol), sortMode = "global_sort",
      sortCols = Seq("bucket", "doc_id"))
    (t.commitRows(instant),
      IndexMeta.occupancyOf(t.snapshot().select("band", "bucket"), "band"))
  }

  private def writeMeta(indexDir: String, n: Int, numHashes: Int,
      bands: Int, occ: Option[(Long, Double, Double, Long)],
      dir: Option[String]): Unit =
    IndexMeta.commit(indexDir, "minhash_meta.json",
      s"""{"n":$n,"numHashes":$numHashes,"bands":$bands""" +
        IndexMeta.occupancyJson(occ) +
        dir.map(d => s""","dir":"$d"""").getOrElse("") + "}")

  /** Atomic full rebuild with NEW banding parameters — what acting on
    * [[occupancyStats]] means for this index: a grown corpus needs more
    * hashes/bands to keep buckets (and so every gate's candidate set)
    * small, and those parameters are baked into every persisted row, so
    * the change is a full re-band. The corpus is re-signed into a fresh
    * `v<N>` subdir (live tables never touched), then the meta is
    * atomically re-pointed through the index timeline ([[IndexMeta]]):
    * gates running during the rebuild serve the old version end to end;
    * gates planned after see the new one. The occupancy baseline resets.
    * Old versions stay queryable until [[vacuum]] reclaims them. Returns
    * the number of index rows. */
  def rebuild(indexDir: String, corpus: DataFrame, n: Int = 3,
      numHashes: Int = 32, bands: Int = 8, idCol: String = "doc_id",
      textCol: String = "text", targetFileSizeRows: Int = 100000): Long = {
    val sub = IndexMeta.allocateVersion(indexDir)
    val (rows, occ) = buildTable(corpus, s"$indexDir/$sub", n, numHashes,
      bands, idCol, textCol, targetFileSizeRows)
    writeMeta(indexDir, n, numHashes, bands, occ, dir = Some(sub))
    rows
  }

  /** [[graft.pipeline.AnnIndex.vacuumIvfPq]] for this index — same
    * contract, same writer-trailing cadence rule ([[reconcile]] heals a
    * discarded superseded-version upsert from the corpus). */
  def vacuum(indexDir: String): Int =
    IndexMeta.vacuum(indexDir, "minhash_meta.json", Seq("buckets"))

  /** Bucket-occupancy drift — the train-free analog of
    * [[graft.pipeline.AnnIndex.driftStats]]: rows-per-(band, bucket) p99
    * now vs the build-time baseline in the meta. A climbing ratio means
    * the corpus outgrew the banding — hot buckets are ballooning every
    * gate's candidate join — and [[rebuild]] with more hashes/bands is
    * warranted. One column-pruned aggregate over the buckets table;
    * never touches text. */
  def occupancyStats(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): IndexMeta.OccupancyStats = {
    val (_, _, _, root, meta) = metaAndRoot(indexDir)
    IndexMeta.occupancyStats(
      GraftTable.load(spark, s"$root/buckets").snapshot()
        .select("band", "bucket"), "band", meta)
  }

  /** Incremental refresh — the append step of the crawl loop: signature +
    * band ONLY the new documents (one map-side pass over the delta; the
    * existing corpus is untouched) and upsert their rows. Keys are
    * (bucket, doc_id), so replaying the same batch after a crash is a
    * same-key upsert — exactly-once by idempotence. Intended for the
    * crawl contract (doc ids append-only, text immutable): a CHANGED
    * document's old buckets are different keys a bare upsert leaves
    * stale — use [[refresh]] for those. Returns the commit instant. */
  def upsert(indexDir: String, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val spark = newDocs.sparkSession
    val (n, numHashes, bands, root, _) = metaAndRoot(indexDir)
    GraftTable.load(spark, s"$root/buckets")
      .upsertGlobal(bandRows(newDocs, n, numHashes, bands, idCol, textCol))
  }

  /** Delete documents from the index — the takedown path, and the first
    * half of [[refresh]]: a doc removed from the curated corpus must stop
    * gating future crawl batches (its near-dups become admissible again).
    * The caller knows only doc ids; the (bucket, doc_id, band) rows to
    * tombstone are located with a left-semi join against the index itself
    * — an INDEX-scale scan (`bands` longs per doc), never a corpus text
    * pass. Replay is a same-key tombstone — idempotent. */
  def delete(indexDir: String, docIds: DataFrame,
      idCol: String = "doc_id"): String = {
    val t = GraftTable.load(docIds.sparkSession,
      s"${metaAndRoot(indexDir)._4}/buckets")
    val doomed = t.snapshot().select("bucket", "doc_id", "band")
      .join(docIds.select(col(idCol).as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      // pin before writing to the table the rows were read from (same
      // posture as admit's survivor pin); ids-sized, not corpus-sized
      .localCheckpoint(true)
    t.delete(doomed)
  }

  /** Changed-document refresh: delete the docs' OLD band rows (their new
    * text hashes to different buckets — different keys a bare [[upsert]]
    * would leave stale, the trade upsert's doc names), then band + upsert
    * the new text. Two commits: a crash in between leaves the docs absent
    * from the index (their near-dups admissible — never a WRONG gate, the
    * same window a not-yet-indexed doc has) and replaying the refresh
    * re-runs both keyed writes — idempotent. */
  def refresh(indexDir: String, changedDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): String = {
    delete(indexDir, changedDocs.select(idCol), idCol)
    upsert(indexDir, changedDocs, idCol, textCol)
  }

  /** Batch-vs-corpus near-dup gate against the PERSISTED index:
    * bit-identical to [[Dedup.minhashIncremental]] with the build's
    * parameters — banding, candidate join, exact-Jaccard verification and
    * survivor selection are shared code. The corpus contributes only (a)
    * this table's (bucket, doc_id) rows on the candidate join and (b) its
    * text for CANDIDATE docs on the verification semi-join — no full
    * corpus shingle or signature pass exists in any plan.
    *
    * Size-aware probe (the [[AnnIndex.queryLsh]] shape): a SMALL batch —
    * judged by the same plan-time estimate every ANN query side uses —
    * collects its own probed (band, bucket) pairs (|batch|·bands rows,
    * driver-tiny, hard-capped) and pushes the per-band disjunction
    * `(band=b AND bucket IN (b's buckets)) OR …` into the index scan, so
    * the build's global (bucket, doc_id) sort turns key-range file stats
    * into file pruning: a trickle batch against a many-file index reads
    * ~one file per probed pair, not the whole table (see [[indexBands]]
    * for why the pairing must ride the predicate). A LARGE batch keeps
    * the full-scan shuffle join (its probe set would be as big as the
    * index). Outputs are bit-identical either way — pruning only drops
    * (band, bucket) rows the candidate equi-join could never match;
    * `probeBuckets` overrides the estimate like `broadcastQueries` does
    * for ANN.
    *
    * The index is authoritative for the corpus's membership in band
    * space: a corpus doc not yet upserted here is invisible to the gate
    * until refreshed. */
  def gate(indexDir: String, existing: DataFrame, batch: DataFrame,
      tau: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text",
      probeBuckets: Option[Boolean] = None): DataFrame = {
    val (n, numHashes, bands, root, _) = metaAndRoot(indexDir)
    // probe decision sized to the PAIR CAP, not the broadcast threshold:
    // the probe costs a batch shingle+signature job, so a batch that
    // would blow the cap anyway must skip straight to the full-scan join
    // (estimated on the id projection — text bytes would overstate the
    // probe ~100×)
    val probe = Similarity.probeDecision(batch.select(col(idCol)), bands,
      probeBuckets)
    // when probing, PIN the (trickle-sized) batch first: the probe's
    // pair collect and the gate's candidate join are separate actions,
    // and a non-deterministic batch frame (a sampled or moving source —
    // continuousIngest gates the RAW batch; only the gate OUTPUT is
    // checkpointed) banded twice could push a pair set missing rows the
    // join would match, silently admitting a near-duplicate
    val b = if (probe) batch.localCheckpoint(true) else batch
    Dedup.minhashIncremental(existing, b, n, numHashes, bands, tau,
      idCol, textCol,
      existingBands = Some(indexBands(root, b, n, numHashes,
        bands, idCol, textCol, probe)))
  }

  /** The corpus side of the gate's candidate join: the persisted buckets
    * snapshot, pruned — when the batch is small — to the batch's own
    * probed (band, bucket) pairs. The probe set is computed from the FULL
    * batch (a superset of the within-batch-deduped side the join actually
    * uses), so pruning can never drop a matchable row: bit-identical by
    * construction.
    *
    * The pushed predicate is [[Similarity.probePairPredicate]]'s
    * per-band disjunction — see there for why the (band, bucket) pairing
    * must ride the predicate itself (a raw bucket-only InSet barely
    * skips anything under uniform 64-bit buckets). Files read ≈ probed
    * pairs, not pairs × bands. Factored out so the pruning spec can pin
    * files-read ≪ files-total on exactly the frame the gate joins. */
  private[pipeline] def indexBands(bucketsRoot: String, batch: DataFrame,
      n: Int, numHashes: Int, bands: Int, idCol: String, textCol: String,
      probe: Boolean): DataFrame = {
    val base = GraftTable.load(batch.sparkSession, s"$bucketsRoot/buckets")
      .snapshot()
      .select(col("doc_id").as(idCol), col("band"), col("bucket"))
    // the probe decision is the CALLER's ([[gate]] makes it once, pins
    // the batch, and passes the same pinned frame here and to the join)
    if (!probe) base
    else {
      // one batch-scale signature pass (the gate re-shingles the batch
      // anyway) collapsed to a driver-tiny distinct pair set; the
      // limit(cap+1) probe bounds the collect no matter what the
      // plan-time estimate claimed (the HotInlineCap posture)
      val pairs = bandRows(batch, n, numHashes, bands, idCol, textCol)
        .select(col("band"), col("bucket")).distinct()
        .limit(Similarity.ProbePairCap + 1).collect()
      if (pairs.length > Similarity.ProbePairCap) base
      else if (pairs.isEmpty) base.filter(lit(false)) // nothing to collide
      else base.filter(Similarity.probePairPredicate(
        pairs.toSeq.map(r => (r.getInt(0), r.getLong(1))), "band", "bucket"))
    }
  }

  /** One crawl-loop step: gate `batch` against the index, upsert the
    * survivors into the curated `corpus` table, then refresh the index
    * with the survivors' bands — so the NEXT batch sees them. Crash
    * anywhere and replay the batch: the gate's survivor set is a
    * deterministic function of (index, batch), and both upserts are keyed
    * (doc_id / (bucket, doc_id)), so the replay rewrites the same rows —
    * exactly-once end to end. Returns the admitted survivors. */
  def admit(indexDir: String, corpus: GraftTable, batch: DataFrame,
      tau: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // pin the survivor set BEFORE refreshing the index: a lazy frame
    // re-evaluated after the refresh would see the survivors' own bands
    // and gate them out of their own admission
    val survivors = gate(indexDir, corpus.snapshot(), batch, tau,
      idCol, textCol).localCheckpoint(true)
    if (!survivors.isEmpty) {
      corpus.upsertGlobal(survivors)
      upsert(indexDir, survivors, idCol, textCol)
    }
    survivors
  }

  /** Repair the index to cover the corpus: band + upsert every corpus doc
    * whose rows are MISSING from the index. The divergence this heals is
    * structural in any loop whose checkpoint rides the corpus commit
    * (a crash between the corpus write and the index refresh means the
    * batch never replays — [[continuousIngest]]'s restart path), and it
    * also absorbs an index lagging any out-of-band corpus write. Cost: an
    * id-only anti-join (corpus ids vs index doc_ids — both single-column,
    * COLUMN-PRUNED scans), and only when that probe finds ids missing, one
    * text pass semi-joined to THOSE ids; a consistent pair — every clean
    * restart of a fully-bandable corpus — never reads a byte of text and
    * is a no-op (no commit, returns 0). UN-bandable docs (shorter than
    * `n` tokens, whitespace-only, null — zero shingle windows, so no
    * band rows CAN exist for them) are excluded on the repair path: they
    * are structurally absent from the index, not missing, and counting
    * them would re-run an empty upsert on every restart forever. Returns
    * the number of docs actually added. */
  def reconcile(indexDir: String, corpus: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    val spark = corpus.sparkSession
    val (n, _, _, root, _) = metaAndRoot(indexDir)
    val indexed = GraftTable.load(spark, s"$root/buckets").snapshot()
      .select(col("doc_id").as(idCol)).distinct()
    // id-ONLY anti-join first (a column-pruned scan — the consistent
    // case, every loop restart, never touches corpus text), pinned so the
    // emptiness probe and the text semi-join share one evaluation
    val missingIds = corpus.select(col(idCol))
      .join(indexed, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    if (missingIds.isEmpty) return 0L
    // repair path only: read text for just the missing ids and keep the
    // docs that actually band — the SAME windowing kernel the build uses,
    // so "bandable" here is by construction "produces index rows"
    val addable = corpus.join(missingIds, Seq(idCol), "left_semi")
      .filter(size(graft.functions.ShingleHashes(col(textCol), n)) > 0)
      .localCheckpoint(true)
    val added = addable.count()
    if (added > 0) upsert(indexDir, addable, idCol, textCol)
    added
  }

  /** The persisted gate wired into the DeltaStreamer-style continuous
    * loop ([[graft.streaming.ContinuousIngest]]): each pulled batch is
    * gated against the index (a TRANSFORM — survivors are what commits to
    * the curated corpus, with the source checkpoint riding the commit),
    * and the post-commit hook upserts the survivors' band rows so the
    * NEXT batch sees them. The gate output is localCheckpoint-pinned, so
    * the hook never re-evaluates it against the already-refreshed index.
    * Crash anywhere: the checkpoint rides the corpus commit, so a batch
    * that committed never replays — the constructor heals the one gap
    * that leaves (corpus committed, index refresh lost) by running
    * [[reconcile]] BEFORE the first pull. Compaction/clean/archive
    * cadence and the services split are ContinuousIngest's own. */
  def continuousIngest(corpus: GraftTable, indexDir: String,
      source: () => Option[(String, DataFrame)], tau: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      compactEvery: Int = 5): graft.streaming.ContinuousIngest = {
    reconcile(indexDir, corpus.snapshot(), idCol, textCol)
    new graft.streaming.ContinuousIngest(corpus, source,
      transforms = Seq(batch =>
        gate(indexDir, corpus.snapshot(), batch, tau, idCol, textCol)
          .localCheckpoint(true)),
      compactEvery = compactEvery,
      onBatchCommitted = (_, survivors) =>
        if (!survivors.isEmpty) upsert(indexDir, survivors, idCol, textCol))
  }

  /** (doc_id, band, bucket) rows of `docs` under the module's one
    * signature/banding definition. */
  private def bandRows(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
      idCol: String, textCol: String): DataFrame =
    Dedup.bandBuckets(
      Dedup.minhashSignatures(docs, n, numHashes, idCol, textCol),
      bands, numHashes / bands, idCol)
      .select(col(idCol).as("doc_id"), col("band"), col("bucket"))

  /** Banding parameters + live table root + raw meta, from ONE
    * timeline-backed read ([[IndexMeta.read]]) — parameters and version
    * resolve together, so a concurrent [[rebuild]] (which changes BOTH)
    * can never split one operation across banding sets. */
  private def metaAndRoot(indexDir: String)
      : (Int, Int, Int, String, Option[com.fasterxml.jackson.databind.JsonNode]) = {
    val meta = IndexMeta.read(indexDir, "minhash_meta.json")
    val j = meta.getOrElse(throw new IllegalStateException(
      s"no MinHash index meta under $indexDir"))
    (j.path("n").asInt, j.path("numHashes").asInt, j.path("bands").asInt,
      IndexMeta.liveRoot(indexDir, meta), meta)
  }
}
