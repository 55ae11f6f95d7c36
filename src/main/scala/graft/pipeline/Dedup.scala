package graft.pipeline

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus deduplication operators (SURVEY.md §2.3). Everything is a
 * DataFrame transform; the only shuffles are the groupBy/join keys each
 * algorithm inherently needs (shingle, band bucket, simhash chunk), which
 * is what makes them run at corpus scale — no pairwise O(n²) work except
 * inside a candidate bucket.
 */
object Dedup {

  /** Scale-adaptive parallelism floor for the per-row-kernel-heavy inputs
    * (shingling, simhash, window explodes): a frame whose PLAN-TIME size
    * estimate (`optimizedPlan.stats`, no job — the same source every ANN
    * broadcast decision uses) says its scan cannot fill the session's
    * default parallelism is hash-repartitioned by `key` so the kernel
    * runs on every core; a corpus-scale frame passes through untouched —
    * no extra shuffle where the scan already parallelizes. The threshold
    * is one scan-split (8 MB) per core: below it the whole input came
    * from a handful of splits (a small parquet file is ONE task no matter
    * the cluster — guide §2.5 "input skew"), and the repartition moves
    * at most that many bytes. ONLY for operators whose aggregates are
    * order-insensitive (counts / min / integer sums): hash partitioning
    * reorders rows, so a float-summing operator must not ride this. */
  private[pipeline] def spread(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // ANALYZED-plan stats, deliberately not optimizedPlan: running the
    // optimizer here would fire ConvertToLocalRelation, which EVALUATES
    // projections over local relations on the driver — a caller's
    // side-effecting expression would run an extra time (and local test
    // fixtures are exactly such plans). Analysis triggers no evaluation.
    val est = df.queryExecution.analyzed.stats.sizeInBytes
    if (est <= BigInt(p) * (8L << 20)) df.repartition(p, col(key)) else df
  }

  /** Exact dedup on content hash: keep the lowest id per md5(text).
    * Null text hashes to a per-document sentinel — unknown content is not
    * equal to other unknown content, so null-text docs are all kept.
    *
    * Keeper selection is a partial-aggregatable `groupBy(_h).agg(min(id))`
    * + semi-join back on (_h, id) — NEVER a window: a boilerplate page
    * ("404 not found") duplicated 10⁸ times in a crawl is exactly what
    * this operator exists to collapse, and a
    * `row_number().over(partitionBy(_h))` would ship every copy (with its
    * TEXT) to one sorting reducer; the agg collapses the hot hash
    * map-side and the join-back key is unique per keeper. Assumes ids are
    * unique (the corpus contract everywhere in this module); on dirty
    * input, every row CARRYING the minimal id survives — rows, not one
    * row (spec-pinned, so the shape can't silently drift). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hashed = docs.withColumn("_h",
      coalesce(md5(col(textCol)), concat(lit("null:"), col(idCol).cast("string"))))
    val keep = hashed.groupBy(col("_h")).agg(min(col(idCol)).as(idCol))
    hashed.join(keep, Seq("_h", idCol), "left_semi").drop("_h")
  }

  /** URL canonicalization — the first dedup key of every crawl pipeline
    * (CommonCrawl/CCNet-style URL-level dedup runs before any content
    * method touches bytes): lowercase scheme+authority (path stays
    * case-sensitive per RFC 3986), strip the fragment, strip default
    * ports (:443 https / :80 http), drop `utm_*` tracking params, sort
    * the remaining query params. Pure column expressions — no UDF, the
    * whole kernel stays inside native evaluation. Query strings are
    * assumed '?'-free after the first '?' (the URL grammar). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefix = regexp_extract(noFrag, "^([^/?#]*//[^/?]*)", 1)
    val lowered = concat(lower(prefix),
      noFrag.substr(length(prefix) + 1, lit(Int.MaxValue)))
    // capture-the-delimiter instead of lookahead: the same regex runs in
    // RE2-only engines (an external oracle restates it verbatim)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:]*):443(/|\\?|$)", "$1$2"),
      "^(http://[^/:]*):80(/|\\?|$)", "$1$2")
    val path = split_part(noPort, lit("?"), lit(1))
    val query = when(length(noPort) > length(path),
      split_part(noPort, lit("?"), lit(2))).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** URL-level dedup: keep the lowest id per canonical URL. One hash
    * shuffle on the canonical string — at 100 TB the shuffle carries
    * (url, id), never documents. */
  def byUrl(docs: DataFrame, urlCol: Column, idCol: String = "doc_id"): DataFrame = {
    // same skew-safe keeper shape as [[exact]]: a hot canonical URL
    // (crawled 10⁶ times) collapses map-side instead of sorting on one
    // reducer
    val withCu = docs.withColumn("_cu", canonicalizeUrl(urlCol))
    val keep = withCu.groupBy(col("_cu")).agg(min(col(idCol)).as(idCol))
    withCu.join(keep, Seq("_cu", idCol), "left_semi")
      .withColumnRenamed("_cu", "url_canonical")
  }

  /** Exact dedup after text NORMALIZATION — the "near-exact" first pass of
    * C4/RefinedWeb-style curation (case, punctuation and whitespace
    * variants of the same document collapse before any fuzzy method runs).
    * Normalization stays in the ASCII-safe subset (strip non-alphanumerics
    * first, lowercase after) so an external oracle states byte-identical
    * strings. Same shuffle shape as [[exact]]: one hash groupBy. */
  def exactNormalized(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "[^A-Za-z0-9]+", " ")))
    val hashed = docs.withColumn("_h",
      coalesce(md5(norm), concat(lit("null:"), col(idCol).cast("string"))))
    // skew-safe keeper selection — see [[exact]]
    val keep = hashed.groupBy(col("_h")).agg(min(col(idCol)).as(idCol))
    hashed.join(keep, Seq("_h", idCol), "left_semi").drop("_h")
  }

  /** Incremental (snapshot-over-snapshot) dedup — the Dolma/CCNet shape
    * where each new crawl batch dedups against the already-curated corpus:
    * the existing side collapses to its content-hash set (a single-column
    * projection — at scale a column-pruned parquet scan whose shuffle
    * carries 16-byte hashes, never documents), the incoming batch first
    * dedups within itself ([[exact]], keep min id), then left-anti joins
    * the existing hashes. The curated corpus is never rewritten or
    * re-shuffled as text, so the cost per batch is O(batch + |corpus
    * hashes|) regardless of corpus size. Null-text docs are all kept
    * (null never equals null), matching [[exact]]. */
  def incremental(existing: DataFrame, incoming: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val seen = existing.select(md5(col(textCol)).as("_h"))
      .where(col("_h").isNotNull).distinct()
    exact(incoming, idCol, textCol)
      .withColumn("_h", md5(col(textCol)))
      .join(seen, Seq("_h"), "left_anti")
      .drop("_h")
  }

  /** ONE whitespace tokenization for every positional substring operator:
    * ASCII `\s+` split with empty tokens dropped, so a leading tab/newline
    * (which `trim` — spaces only — would not strip) cannot shift every
    * position by one. The hashed at-scale mode feeds `concat_ws(" ", toks)`
    * into the native kernel, so the kernel's positions align with THESE
    * tokens by construction — the kernel's own Character.isWhitespace
    * tokenizer disagrees with `\s+` on Unicode whitespace (U+3000, U+2028,
    * U+2000-200A: common in web/CJK crawls), and any disagreement between
    * the position source and the rebuild side removes the WRONG tokens. */
  private def wsToks(textCol: Column): Column = {
    // strip BOTH ends (any Java-\s kind) then split: no empty tokens —
    // Spark's split uses Java split with limit -1, which KEEPS trailing
    // empty strings (unlike limit 0), so trailing whitespace must be
    // stripped up front; interior `\s+` runs can't produce an empty. This
    // avoids a per-element lambda filter (a higher-order filter costs a
    // lambda eval per token in the hot path of every substring operator).
    // trim with an explicit set = Java \s exactly ([ \t\n\x0B\f\r]) is an
    // ends-only character scan — the anchored-regex alternative
    // (`^\s+|\s+$`) re-scans the WHOLE text per document in the hot path
    // of all five substring operators. Whitespace-only text explicitly
    // maps to the empty array (split would yield [""]).
    val stripped = trim(textCol, " \t\n\u000B\f\r")
    when(stripped === "", typedlit(Array.empty[String]))
      .otherwise(split(stripped, "\\s+"))
  }

  /** First-occurrence survivor selection without a window function: a
    * `row_number().over(Window.partitionBy(sh))` ships EVERY occurrence of
    * a window value to one reducer and sorts it there — at corpus scale a
    * boilerplate 10-token window ("all rights reserved…") occurs in 10⁶+
    * documents and that reducer is the job. `groupBy(sh).agg(min(struct))`
    * is partial-aggregatable (map-side combine shrinks each hot key to one
    * row per map task before the shuffle); the join-back carries ONLY the
    * windows seen ≥ 2 times (filtered BEFORE the join — the vast majority
    * of windows are unique, so the right side collapses to the duplicated
    * few and AQE can turn the join-back into a broadcast), and is
    * AQE-skew-splittable otherwise. Returns only the occ rows of
    * DUPLICATED windows, extended with `_first` (smallest (id, pos) for
    * the window). */
  private def dupOccurrences(occ: DataFrame, idCol: String): DataFrame = {
    val firsts = occ.groupBy(col("sh"))
      .agg(min(struct(col(idCol), col("pos"))).as("_first"),
        count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= 2)
      .select(col("sh"), col("_first"))
    occ.join(firsts, Seq("sh"))
  }

  /** Exact-substring duplication signal (Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better": long verbatim token
    * windows shared across documents — there via suffix arrays; here as
    * the per-document signal the method thresholds on). For each document,
    * counts its n-token windows — EVERY position, not distinct — whose
    * exact window text occurs in ≥2 distinct documents. Corpus-linear: one
    * explode (pinned — it feeds both the frequency agg and the scoring
    * join), a (window → distinct-doc-count) partial agg, one equi-join
    * back; the shuffle carries (window, doc) pairs, nothing is pairwise.
    * Returns (id, n_windows, dup_windows). */
  def substringDupSignal(docs0: DataFrame, n: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      hashed: Boolean = false): DataFrame = {
    val docs = spread(docs0, idCol)
    val toks = wsToks(col(textCol))
    val windows = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        array_join(slice(toks, i + lit(1), lit(n)), " "))
    ).otherwise(array())
    // `hashed` is the at-scale mode: the native one-pass kernel
    // (ShingleHashes.all) emits an 8-byte hash per window position with NO
    // intermediate window strings, and the shuffle key shrinks from a
    // ~60-byte string to a long — identical counts modulo astronomically
    // unlikely collisions (spec-pinned equal at test scale); default off
    // so the external oracle states exact strings. The kernel's tokenizer
    // is bit-identical to [[wsToks]] (exact Java-\s set, no empty tokens),
    // so both modes count windows over identical token boundaries.
    val exploded = (if (hashed)
        docs.select(col(idCol),
          explode(graft.functions.ShingleHashes.all(col(textCol), n)).as("sh"))
      else docs.select(col(idCol), explode(windows).as("sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfc = exploded.groupBy(col("sh")).agg(countDistinct(col(idCol)).as("df"))
    val perDoc = exploded.join(dfc, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum((col("df") >= 2).cast("long")).as("dup_windows"))
    val out = docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
    val materialized = out.localCheckpoint(eager = true)
    exploded.unpersist(blocking = false)
    materialized
  }

  /** Exact-substring span REMOVAL — the actual transformation of Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), extending [[substringDupSignal]]'s per-doc signal: every
    * n-token window occurring ≥2 times in the corpus (across OR within
    * docs) is removed at every occurrence except the globally FIRST
    * (smallest (doc, pos)) — first occurrence wins, later copies of the
    * span are dropped and the doc is reassembled from its surviving
    * tokens.
    *
    * Corpus-linear throughout (the dedup_lines_within shape): one window
    * explode, one partial-aggregatable (window → min(doc,pos), count)
    * groupBy plus a join-back on the window value — NEVER a window
    * function (a `row_number().over(partitionBy(sh))` would sort every
    * occurrence of a hot boilerplate window on one reducer; the agg+join
    * shape map-side-combines hot keys and AQE can split the skewed join
    * partition), a covered-position anti-join on (doc, pos), and a
    * per-doc sort-rebuild — no pairwise joins anywhere. `hashed` shrinks
    * the shuffle key to the native kernel's 8-byte hash for the at-scale
    * mode (identical output modulo ~|windows|²/2⁶⁴ collisions); default
    * off so the external oracle states exact strings. Both modes derive
    * positions from the SAME [[wsToks]] tokenization as the rebuild side.
    *
    * Returns (idCol, n_tokens, n_removed, clean): original whitespace
    * token count, removed-token count, and the rebuilt text (`""` when
    * every token was removed). Docs shorter than n tokens pass through
    * untouched. */
  def substringRemove(docs: DataFrame, n: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      hashed: Boolean = false): DataFrame = {
    val (out, cached) = substringRemovePlan(docs, n, idCol, textCol, hashed)
    materializeAndReleaseAll(out, cached)
  }

  /** The un-materialized plan of [[substringRemove]] plus its pinned
    * caches — split out so plan-quality specs can assert the physical
    * shape (no window function keyed on the window value) before
    * execution. `occ` is persisted because the agg+join first-occurrence
    * selection consumes it TWICE (agg side + probe side) — without the
    * cache the scan + kernel + posexplode lineage executes twice, which
    * is exactly the premium a single-pass window plan never paid. */
  private[graft] def substringRemovePlan(docs0: DataFrame, n: Int,
      idCol: String, textCol: String,
      hashed: Boolean): (DataFrame, Seq[DataFrame]) = {
    val docs = spread(docs0, idCol)
    val withToks = docs
      .select(col(idCol), wsToks(col(textCol)).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hashed mode: the kernel's tokenizer is bit-identical to [[wsToks]]
    // (exact Java-\s set, no empty tokens), so its positions align with
    // `toks` on any input — no window strings, no re-joined doc string
    val occ = (if (hashed)
      docs.select(col(idCol), posexplode(
        graft.functions.ShingleHashes.all(col(textCol), n))
        .as(Seq("pos", "sh")))
    else withToks.filter(size(col("toks")) >= n)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => array_join(slice(col("toks"), i + lit(1), lit(n)), " ")))
        .as(Seq("pos", "sh"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // first occurrence in global (doc, pos) order survives; later
    // occurrences of any window seen >= 2 times are removal spans
    val marked = dupOccurrences(occ, idCol)
      .filter(struct(col(idCol), col("pos")) =!= col("_first"))
    val covered = marked.select(col(idCol),
      explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos")).distinct()
    val tokens = withToks.select(col(idCol),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val rebuilt = tokens.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean"))
    val out = withToks
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean"), lit("")).as("clean"))
    (out, Seq(withToks, occ))
  }

  /** Incremental (batch-vs-corpus) exact-substring span removal — the
    * production shape of [[substringRemove]]: the curated CORPUS is
    * immutable (already stored, already deduplicated), so a batch window
    * is removed when it occurs ANYWHERE in the corpus (the corpus always
    * wins) or when an earlier batch occurrence exists (within-batch
    * first-occurrence-wins, exactly the batch variant's rule). Only batch
    * docs are rewritten and returned.
    *
    * Corpus cost: ONE window explode collapsed to DISTINCT window keys —
    * the curated corpus is never re-shuffled as text (the
    * dedup_incremental posture); the batch pays the same skew-safe
    * first-occurrence agg+join as the batch variant plus one
    * semi-join-shaped membership mark against the corpus keys. */
  def substringRemoveIncremental(corpus0: DataFrame, batch0: DataFrame,
      n: Int = 10, idCol: String = "doc_id", textCol: String = "text",
      hashed: Boolean = false): DataFrame = {
    val corpus = spread(corpus0, idCol)
    val batch = spread(batch0, idCol)
    def windowsOf(docs: DataFrame) =
      if (hashed)
        docs.select(col(idCol), posexplode(
          graft.functions.ShingleHashes.all(col(textCol), n)).as(Seq("pos", "sh")))
      else {
        val toks = wsToks(col(textCol))
        docs.filter(size(toks) >= n)
          .select(col(idCol), posexplode(
            transform(sequence(lit(0), size(toks) - n),
              i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
            .as(Seq("pos", "sh")))
      }
    val corpusSh = windowsOf(corpus).select(col("sh")).distinct()
    val withToks = batch
      .select(col(idCol), wsToks(col(textCol)).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pinned: consumed three times (corpus semi-join, dup agg, dup probe)
    val occ = windowsOf(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // two independent removal marks, unioned: (a) the window occurs in the
    // immutable corpus — a semi-join against its distinct keys (the corpus
    // always wins); (b) a within-batch later occurrence of a duplicated
    // window — the batch variant's skew-safe agg+join over ONLY the
    // duplicated windows. Overlaps collapse in `covered`'s distinct.
    val markedCorpus = occ.join(corpusSh, Seq("sh"), "left_semi")
      .select(col(idCol), col("pos"))
    val markedBatch = dupOccurrences(occ, idCol)
      .filter(struct(col(idCol), col("pos")) =!= col("_first"))
      .select(col(idCol), col("pos"))
    val marked = markedCorpus.unionByName(markedBatch)
    val covered = marked.select(col(idCol),
      explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos")).distinct()
    val tokens = withToks.select(col(idCol),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val rebuilt = tokens.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean"))
    val out = withToks
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean"), lit("")).as("clean"))
    materializeAndReleaseAll(out, Seq(withToks, occ))
  }

  /** Distinct word n-gram shingles per document. */
  def shingles(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val sh = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    ).otherwise(array())
    docs.select(col(idCol), explode(array_distinct(sh)).as("shingle"))
  }

  /** Distinct hashed word n-gram shingles per document via the native
    * one-pass kernel (graft.functions.ShingleHashes) — no intermediate
    * token arrays or shingle strings. */
  def shingleHashes(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    spread(docs, idCol).select(col(idCol),
      explode(graft.functions.ShingleHashes(col(textCol), n)).as("shingle"))

  /** All pairs with shingle-Jaccard ≥ tau. The join key is the shingle
    * (as a 64-bit hash — long joins shuffle a fraction of the bytes of
    * string joins; collision odds are ~|shingles|²/2⁶⁴), so only documents
    * sharing a shingle ever meet.
    *
    * `maxDocFrac` caps each shingle's document frequency in CANDIDATE
    * GENERATION: a boilerplate shingle shared by f docs contributes f²
    * joined rows, so one hot shingle in 1M docs is 10¹² rows before the
    * groupBy — the cap is ON BY DEFAULT so the operator is scale-safe
    * without caller discipline. The reported jaccard stays EXACT: sizes
    * come from the FULL shingle sets, and each candidate pair's shared
    * HOT shingles are counted back in via a per-doc hot-shingle array
    * (tiny — at most the handful of corpus-wide boilerplate shingles) —
    * so capping changes neither the value nor the tau test for any pair
    * that meets. The only approximation is RECALL: a pair whose EVERY
    * shared shingle is hot never meets — at tau ≥ 0.5 such docs are
    * majority corpus-wide boilerplate. `maxDocFrac >= 1.0` disables the
    * cap (single-phase exhaustive join).
    *
    * At the default maxDocFrac the hot set is tiny by construction (each
    * member appears in > maxDocFrac of the corpus, so |hot| <
    * occurrences / maxDf — a few thousand longs at any scale), so it is
    * collected to the driver and inlined as an InSet predicate: exclusion
    * is a map-side filter (no anti-join), and when the set is EMPTY — a
    * clean corpus, the common case — the plan short-circuits to the
    * single-phase exhaustive join with zero cap overhead. A set that
    * overflows [[HotInlineCap]] (possible when the caller passes a small
    * maxDocFrac on a big corpus) is never collected: exclusion falls back
    * to anti/semi joins against the hot frame. */
  /** Max hot shingles inlined as a driver-side InSet predicate; beyond
    * this the exclusion falls back to anti/semi joins (see
    * [[jaccardPairsPlan]]). */
  private[graft] val HotInlineCap = 10000

  def jaccardPairs(docs: DataFrame, n: Int = 3, tau: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocFrac: Double = 0.1): DataFrame = {
    val (result, cached) = jaccardPairsPlan(docs, n, tau, idCol, textCol, maxDocFrac)
    materializeAndRelease(result, cached)
  }

  /** The un-materialized plan of [[jaccardPairs]] plus its pinned shingle
    * cache — split out so plan-quality specs can assert the clean-corpus
    * short-circuit (no hot-recount joins when the hot set is empty). */
  private[graft] def jaccardPairsPlan(docs: DataFrame, n: Int, tau: Double,
      idCol: String, textCol: String, maxDocFrac: Double,
      hotInlineCap: Int = HotInlineCap): (DataFrame, DataFrame) = {
    // cached: consumed by the sizes agg and both join sides
    val shAll = shingleHashes(docs, n, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // For the default maxDocFrac the hot set is tiny by construction
    // (|hot| < occurrences / maxDf), but the API allows any maxDocFrac > 0,
    // and a small fraction on a large corpus makes a full collect a driver
    // OOM / plan-size blowup. Probe with limit(cap+1): when the set fits
    // the cap it is collected and inlined as a map-side InSet predicate;
    // otherwise exclusion falls back to anti/semi joins against the hot
    // frame (AQE broadcasts it when it is in fact small enough).
    val hotDf: Option[DataFrame] =
      if (maxDocFrac >= 1.0) None
      else {
        val maxDf = math.max(2L, (docs.count() * maxDocFrac).toLong)
        Some(shAll.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("shingle")))
      }
    val probed: Array[Long] = hotDf match {
      case None => Array.empty
      case Some(h) => h.limit(hotInlineCap + 1).collect().map(_.getLong(0))
    }
    val inlineHot = probed.length <= hotInlineCap
    val noHotShingles = hotDf.isEmpty || (inlineHot && probed.isEmpty)
    val isHot = col("shingle").isin(probed.map(Long.box): _*)
    val sh =
      if (noHotShingles) shAll
      else if (inlineHot) shAll.filter(!isHot)
      else shAll.join(hotDf.get, Seq("shingle"), "left_anti")
    // sizes over the FULL sets — the denominator never depends on the cap
    val sizes = shAll.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val commonNonHot = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common_nh"))
    // exact hot-shingle intersection per candidate pair: each doc carries
    // its (few) hot shingles as an array; two hash joins + array_intersect
    val common = if (noHotShingles)
      commonNonHot.withColumnRenamed("common_nh", "common")
    else {
      val hotRows =
        if (inlineHot) shAll.filter(isHot)
        else shAll.join(hotDf.get, Seq("shingle"), "left_semi")
      val hotPerDoc = hotRows
        .groupBy(col(idCol)).agg(collect_set(col("shingle")).as("hot_sh"))
      val noHot = lit(Array.empty[Long])
      commonNonHot
        .join(hotPerDoc.select(col(idCol).as("id_a"), col("hot_sh").as("hot_a")),
          Seq("id_a"), "left")
        .join(hotPerDoc.select(col(idCol).as("id_b"), col("hot_sh").as("hot_b")),
          Seq("id_b"), "left")
        .withColumn("common", col("common_nh") + size(array_intersect(
          coalesce(col("hot_a"), noHot), coalesce(col("hot_b"), noHot))))
        .select(col("id_a"), col("id_b"), col("common"))
    }
    val result = common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    (result, shAll)
  }

  /** Force `result` (small: pairs above threshold) into local checkpoint
    * storage, then release the big intermediate cache it was built from —
    * otherwise the shingle blocks stay pinned for the session after the
    * returned frame is consumed. */
  private def materializeAndRelease(result: DataFrame, cached: DataFrame): DataFrame =
    materializeAndReleaseAll(result, Seq(cached))

  private def materializeAndReleaseAll(result: DataFrame,
      cached: Seq[DataFrame]): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** numHashes independent permutations approximated by
    * xxhash64(shingleHash, i); signature element i = min over shingles.
    * ONE signature definition for the whole module: [[minhashSignatures]]
    * and [[minhashLshPairs]] share this, so persisted signatures are
    * comparable with the LSH path's internal ones. */
  private[pipeline] def signaturesFrom(sh: DataFrame, numHashes: Int, idCol: String): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"_m$i"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** MinHash signatures over the native shingle-hash kernel. */
  def minhashSignatures(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    signaturesFrom(shingleHashes(docs, n, idCol, textCol), numHashes, idCol)

  /**
   * MinHash + LSH banding: split the signature into `bands`, hash each band
   * to a bucket, candidate pairs collide in ≥1 bucket, then verify with the
   * exact Jaccard of the candidates only. At corpus scale the band-bucket
   * groupBy is the only global shuffle; candidate verification touches a
   * vanishing fraction of all pairs.
   */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
      bands: Int = 8, tau: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): rows-per-band = 0 " +
        "would put EVERY document in one bucket (full cross product)")
    val rows = numHashes / bands
    // one cached shingle-hash frame feeds the signatures AND the
    // candidate verification — shingling runs once
    val sh = shingleHashes(docs, n, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = signaturesFrom(sh, numHashes, idCol)
    val banded = bandBuckets(sig, bands, rows, idCol)
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b")).distinct()
    // exact-Jaccard verification restricted to the candidate pairs — the
    // whole point of LSH: never compute all-pairs similarity
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val common = cands
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    val result = common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    materializeAndRelease(result, sh)
  }

  /** LSH band buckets of a signature frame: one (id, band, bucket) row per
    * band — [[minhashLshPairs]] and [[minhashIncremental]] share this, so
    * a persisted corpus bucket table is comparable with either path. */
  private[pipeline] def bandBuckets(sig: DataFrame, bands: Int, rows: Int,
      idCol: String): DataFrame =
    sig.select(col(idCol), posexplode(
      array((0 until bands).map(b =>
        xxhash64(concat_ws(",", (0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1).cast("string")): _*))): _*))
      .as(Seq("band", "bucket")))

  /**
   * Batch-vs-corpus NEAR-dup gate (MinHash+LSH) — the continuous-crawl
   * sibling of [[incremental]]'s exact gate: returns the batch rows with
   * no VERIFIED near-duplicate (exact shingle-Jaccard ≥ tau) already in
   * the corpus. The batch is first near-dup'd within itself via
   * [[minhashLshPairs]] + keep-min-id, so two copies arriving in one
   * batch don't both slip past a corpus that has neither.
   *
   * Scale shape: candidates are batch×corpus rows COLLIDING IN A BAND
   * BUCKET — never an all-pairs product; the corpus contributes one
   * shingle+signature pass that collapses to (id, band, bucket) before
   * the join, and its TEXT is re-read only for candidate ids (an
   * equi-join semi-filter). At a steady ingest cadence, use
   * [[MinhashIndex]] — the persisted (bucket, doc_id, band) table whose
   * snapshot arrives here as `existingBands` — then the per-batch cost is
   * O(batch + index scan + candidates), the same posture as the exact
   * gate; `existingSig` is the intermediate option (persisted signatures,
   * bands recomputed per batch).
   */
  def minhashIncremental(existing: DataFrame, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8, tau: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      existingSig: Option[DataFrame] = None,
      existingBands: Option[DataFrame] = None): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    // within-batch near-dup first (keep min id per verified pair)
    val selfPairs = minhashLshPairs(batch, n, numHashes, bands, tau, idCol, textCol)
    val selfDup = selfPairs.select(col("id_b").as(idCol)).distinct()
    val kept = batch.join(selfDup, Seq(idCol), "left_anti")
    val bsh = shingleHashes(kept, n, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bSig = signaturesFrom(bsh, numHashes, idCol)
    // corpus band buckets: from the persisted index ([[MinhashIndex]]),
    // from persisted signatures, or (the from-scratch path) one full
    // corpus shingle+signature pass. Lazy getOrElse: with a persisted
    // source the full-corpus pass is never planned, let alone run.
    val cBands = existingBands.getOrElse {
      val cSig = existingSig.getOrElse(
        minhashSignatures(existing, n, numHashes, idCol, textCol))
      bandBuckets(cSig, bands, rows, idCol)
    }
    val cands = bandBuckets(bSig, bands, rows, idCol).as("b")
      .join(cBands.as("c"),
        col("b.band") === col("c.band") && col("b.bucket") === col("c.bucket"))
      .select(col(s"b.$idCol").as("id_b"), col(s"c.$idCol").as("id_c"))
      .distinct()
    // exact-Jaccard verification: corpus shingles only for CANDIDATE docs
    val csh = shingleHashes(
      existing.join(cands.select(col("id_c").as(idCol)).distinct(),
        Seq(idCol), "left_semi"), n, idCol, textCol)
    val sizesB = bsh.groupBy(col(idCol)).agg(count(lit(1)).as("sz_b"))
    val sizesC = csh.groupBy(col(idCol)).agg(count(lit(1)).as("sz_c"))
    val common = cands
      .join(bsh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b"))
      .join(csh.select(col(idCol).as("id_c"), col("shingle")), Seq("id_c", "shingle"))
      .groupBy(col("id_b"), col("id_c")).agg(count(lit(1)).as("common"))
    val dup = common
      .join(sizesB.select(col(idCol).as("id_b"), col("sz_b")), Seq("id_b"))
      .join(sizesC.select(col(idCol).as("id_c"), col("sz_c")), Seq("id_c"))
      .filter(col("common").cast("double") /
        (col("sz_b") + col("sz_c") - col("common")).cast("double") >= tau)
      .select(col("id_b").as(idCol)).distinct()
    materializeAndRelease(kept.join(dup, Seq(idCol), "left_anti"), bsh)
  }

  /** 64-bit SimHash per document via the native one-pass kernel
    * (graft.functions.Simhash64): bit b of the hash is the sign of the sum
    * of ±1 votes from each word's hash bit. */
  def simhash64(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), graft.functions.Simhash64(col(textCol)).as("simhash"))

  /** Chunk-LSH parameters for [[simhashPairs]], derived from corpus size
    * the way Similarity.autoParams sizes its tables: `(chunkBits,
    * probeRadius)` minimizing expected work = probe-emission rows +
    * random-collision candidate pairs, subject to the HAMMING GUARANTEE
    * (64/chunkBits)·(probeRadius+1) > maxHamming (pigeonhole: ≤ maxHamming
    * differing bits leave some chunk with ≤ probeRadius of them, and
    * multi-probing radius-`probeRadius` neighborhoods catches it).
    *
    * Small corpora get the classic 8×8-bit split (selectivity 1/256 is
    * plenty at thousands of docs); large corpora get 16- or 32-bit chunks
    * whose 1/65536 – 1/2³² selectivity keeps candidates ~O(n), multi-probing
    * to preserve the guarantee. Radius is capped (probe fan-out is
    * C(w,0..r)): the widest satisfiable setting is w=8/r=2 (8 chunks ×
    * radius 3 covers hamming ≤ 23), so maxHamming > 23 throws — lower the
    * threshold instead. Thresholds near that cap are already of doubtful
    * use (the reference literature [Manku et al., WWW'07] uses 3 for
    * 64-bit fingerprints; ~11 is a practical ceiling). */
  private[pipeline] def simhashAutoParams(corpusSize: Long, maxHamming: Int): (Int, Int) = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming out of range")
    def comb(n: Int, k: Int): Long =
      (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    val n = math.max(1.0, corpusSize.toDouble)
    val options = Seq(8, 16, 32).flatMap { w =>
      val chunks = 64 / w
      val r = math.ceil((maxHamming + 1).toDouble / chunks).toInt - 1
      val probes = (0 to r).map(comb(w, _)).sum
      if (r > 2 || probes > 700) None
      else {
        val emission = n * chunks * probes
        val collisions = chunks * probes * n * n / math.pow(2, w + 1)
        Some((w, r, emission + collisions))
      }
    }
    require(options.nonEmpty,
      s"maxHamming=$maxHamming needs an intractable multi-probe set (cap is " +
        "23 = 8 chunks x radius 3); lower it — 64-bit simhash near-dup " +
        "detection is only meaningful at hamming <= ~11 anyway")
    val (w, r, _) = options.minBy(_._3)
    (w, r)
  }

  /** Candidate pairs (pre-verification) for [[simhashPairs]]: chunk-LSH
    * self-join with multi-probe. The x side emits every value within
    * hamming `probeRadius` of each of its chunks; the y side emits exact
    * values — a pair within the guarantee meets in at least one chunk.
    *
    * A pair can qualify in several chunks; rather than a distinct() shuffle
    * over every candidate pair, each pair is emitted only from the FIRST
    * chunk where the two hashes are within `probeRadius` — a pure codegen
    * filter on the two simhashes already present in the joined row (exactly
    * one probe matches per qualifying chunk, so no dedup is needed within a
    * chunk). The only shuffle in the whole operator is the bucket join. */
  private[pipeline] def simhashCandidates(sh: DataFrame, chunkBits: Int,
      probeRadius: Int, idCol: String): DataFrame = {
    val chunks = 64 / chunkBits
    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    def chunkVal(c: Int) =
      shiftright(col("simhash"), c * chunkBits).bitwiseAND(lit(mask))
    // radius-r probe set of a chunk value: the value, all 1-bit flips, ...
    val flips: Seq[Long] = {
      val one = (0 until chunkBits).map(i => 1L << i)
      val two = for (i <- 0 until chunkBits; j <- i + 1 until chunkBits)
        yield (1L << i) | (1L << j)
      Seq(0L) ++ (if (probeRadius >= 1) one else Nil) ++
        (if (probeRadius >= 2) two else Nil)
    }
    val exact = sh.select(col(idCol), col("simhash"), posexplode(
      array((0 until chunks).map(chunkVal): _*)).as(Seq("chunk", "val")))
    val probed =
      if (probeRadius == 0) exact
      else sh.select(col(idCol), col("simhash"), posexplode(
          array((0 until chunks).map(chunkVal): _*)).as(Seq("chunk", "v0")))
        .select(col(idCol), col("simhash"), col("chunk"),
          explode(array(flips.map(f => col("v0").bitwiseXOR(lit(f))): _*)).as("val"))
    val xorv = col("x.simhash").bitwiseXOR(col("y.simhash"))
    val near = array((0 until chunks).map(c =>
      bit_count(shiftright(xorv, c * chunkBits).bitwiseAND(lit(mask)))
        <= probeRadius): _*)
    probed.as("x").join(exact.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.val") === col("y.val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      // this chunk is the pair's first qualifying one -> exactly-once emission
      .filter(col("x.chunk") === array_position(near, lit(true)) - 1)
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(xorv).as("hamming"))
  }

  /** SimHash near-dup pairs: chunk-LSH candidates (chunk width and probe
    * radius derived from corpus size — see [[simhashAutoParams]]), verified
    * with bit_count(xor) ≤ maxHamming.
    *
    * When `corpusSize` is None the sizing count PINS `docs` (persist) before
    * counting, so the input lineage executes ONCE — the pipeline reads the
    * same materialization instead of recomputing upstream. Pass
    * `corpusSize` (an estimate within ~2× is fine — the parameter choice is
    * coarse) to skip both the count job and the cache; callers that pass
    * None may `docs.unpersist()` after consuming the result. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 7,
      idCol: String = "doc_id", textCol: String = "text",
      corpusSize: Option[Long] = None): DataFrame = {
    // Pin the SIMHASHED frame, not the raw docs: (id, hash64) is two narrow
    // columns vs the full text corpus, the sizing count reads the pinned
    // materialization instead of re-running upstream lineage, and the
    // candidate self-join reuses the hashes instead of re-shingling the
    // text on each side.
    val sh0 = simhash64(spread(docs, idCol), idCol, textCol)
    val (sh, n) = corpusSize match {
      case Some(c) => (sh0, c)
      case None =>
        sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (sh0, sh0.count())
    }
    val (w, r) = simhashAutoParams(n, maxHamming)
    simhashCandidates(sh, w, r, idCol)
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine ≥ tau. Brute-force baseline — the
    * scale path buckets by LSH first (see Similarity.lshTopK). */
  def embeddingPairs(vecs: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExprs._
    // norms once per vector, native codegen dot per pair — the O(n²) inner
    // loop never allocates. The stream (a) side rides [[spread]]: a small
    // corpus arrives as ~one scan split, and the broadcast-nested-loop
    // join would otherwise run its whole O(n²) loop in ONE task.
    val a = spread(vecs, idCol).select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      normF(col(vecCol)).as("n_a"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      normF(col(vecCol)).as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dotF(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("sim") >= tau)
      .select(col("id_a"), col("id_b"))
  }

  /** Semantic dedup (the published SemDeDup shape): k-means-cluster the
    * embedding space COARSELY, then search for cosine-near pairs only
    * WITHIN each cluster — the all-pairs comparison shrinks from O(n²) to
    * O(Σ cluster²), and since identical/near-identical vectors share a
    * nearest centroid, exact duplicates are never missed. Centroids train
    * on an id-strided sample (Lloyd iterations as DataFrame aggs, see
    * [[Similarity.trainIvfCentroids]]); assignment is one codegen'd map
    * pass; the within-cluster self-join is an equi-join on cid. Returns
    * (id_a, id_b, sim) candidate near-dup pairs with cosine ≥ tau. */
  def semanticPairs(vecs: DataFrame, tau: Double, nlist: Int = 16,
      trainIters: Int = 3, trainSampleMod: Long = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.IvfExprs.nearestCentroids
    import graft.functions.VectorExprs._
    val cents = Similarity.trainIvfCentroids(vecs, nlist, trainIters,
      trainSampleMod, idCol, vecCol)
    val assigned = vecs.select(col(idCol), col(vecCol),
      element_at(nearestCentroids(col(vecCol), cents, 1), 1).as("cid"))
    val a = assigned.select(col("cid"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"), normF(col(vecCol)).as("n_a"))
    val b = assigned.select(col("cid"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"), normF(col(vecCol)).as("n_b"))
    a.join(b, Seq("cid")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", dotF(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("sim") >= tau)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
