package graft.pipeline

import graft.Tables
import graft.functions.{CharEntropy, RollingFingerprint, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LLM-training-data pipeline operators (SURVEY.md §2.3) as oracle-checked
 * queries: dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash /
 * embedding), similarity search (brute force + LSH ANN), text analysis
 * (tokens, quality, language ID, fingerprints), multimodal binary columns.
 *
 * The corpus has no natural duplicates, so dedup queries augment it with
 * deterministic near-duplicate copies (id + 10000) — the operators then
 * have real work to do and the oracle states the expected collapse.
 */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ exact copies with shifted ids. */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
  }

  /** documents ∪ near-duplicate copies (two extra tokens appended). */
  private def docsWithNearDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(docs
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra"))))
  }

  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(docsWithDups(s, d))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Inherits jaccardPairs' default hot-shingle cap (maxDocFrac = 0.1):
    * values stay exact for every reported pair, but a pair whose EVERY
    * shared shingle is corpus-wide boilerplate is never generated — the
    * documented recall trade the scale-safe default makes. */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(docsWithNearDups(s, d), n = 3, tau = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))

  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(docsWithNearDups(s, d), n = 3, numHashes = 32,
      bands = 8, tau = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  def dedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(docsWithNearDups(s, d), maxHamming = 10)
      .orderBy(col("id_a"), col("id_b"))

  /** Batch-vs-corpus NEAR-dup gate: the batch plants near-copies of
    * corpus docs (and one internal near-dup pair per doc); survivors are
    * the batch rows with no verified near-duplicate. */
  def dedupMinhashIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val existing = docs.filter(col("doc_id") < 250)
    // near-copies of corpus docs (should be gated) + genuinely new ids
    val batch = docs
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra")))
    Dedup.minhashIncremental(existing, batch, n = 3, numHashes = 32,
      bands = 8, tau = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** The continuous-crawl form of [[dedupMinhashIncremental]]: the corpus's
    * band buckets come from the PERSISTED [[MinhashIndex]] table instead of
    * a per-batch corpus re-signature — spec-pinned bit-identical to the
    * inline gate (rows-only here: LSH banding is not SQL-expressible). */
  def dedupMinhashPersisted(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val existing = docs.filter(col("doc_id") < 250)
    val batch = docs
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra")))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ann/mh_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    graft.table.GraftTable.drop(dir)
    MinhashIndex.build(existing, dir, n = 3, numHashes = 32, bands = 8)
    MinhashIndex.gate(dir, existing, batch, tau = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** The GATE path of [[dedupMinhashPersisted]] alone: the index build is
    * cached per (sf, banding) across runs — built on the first call,
    * REUSED after (the build is a deterministic transform of `existing`,
    * so a cached index is bit-identical to a fresh one; spec-pinned
    * against [[dedupMinhashPersisted]]'s output). Split out because the
    * combined fixture's timing is ~all build IO (a full multi-file
    * bulk-insert) — a 2.4× environment swing on that IO was drowning
    * gate-path regressions (VERDICT r14); under min-of-N passes this
    * entry times the steady-state gate. */
  def dedupMinhashGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val existing = docs.filter(col("doc_id") < 250)
    val batch = docs
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra")))
    // params in the dir key: a banding change can never read a stale cache
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ann/mhg_n3h32b8_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    if (IndexMeta.read(dir, "minhash_meta.json").isEmpty)
      MinhashIndex.build(existing, dir, n = 3, numHashes = 32, bands = 8)
    MinhashIndex.gate(dir, existing, batch, tau = 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  private def vecsWithDups(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
    v.unionByName(v.withColumn("vec_id", col("vec_id") + 100000))
  }

  def dedupEmbedding(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingPairs(vecsWithDups(s, d), tau = 0.95)
      .orderBy(col("id_a"), col("id_b"))

  def annCosineTopk(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  def annLshTopk(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    Similarity.lshTopK(vecs, vecs.filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** PQ-ADC approximate top-k (rows-only; ScalaTest pins recall@k vs the
    * cosine brute force + code determinism). */
  def annPqTopk(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    Similarity.pqTopK(vecs, vecs.filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF-PQ approximate top-k (rows-only; ScalaTest pins nprobe=nlist ≡
    * pure PQ plus a recall floor under real cell pruning). */
  def annIvfPqTopk(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    Similarity.ivfPqTopK(vecs, vecs.filter(col("vec_id") % 50 === 0), k = 5,
      nlist = 16, nprobe = 6)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Persisted-LSH sibling of [[annIvfPqPersisted]]: hyperplane buckets
    * land as one bucket-key-sorted graft table; the query probes with a
    * pushed-down bucket IN-set and must match the in-memory lshTopK
    * bit-for-bit (rows-only: hyperplane hashing is not SQL-expressible). */
  def annLshPersisted(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ann/lsh_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    graft.table.GraftTable.drop(dir)
    AnnIndex.buildLsh(vecs, dir, planes = 4, tables = 8)
    AnnIndex.queryLsh(dir, vecs.filter(col("vec_id") % 50 === 0), k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Build-once/query-many ANN: persist the IVF-PQ index (centroids +
    * codebooks + cid-partitioned codes) as graft tables, then answer the
    * query from the PERSISTED index — spec-pinned bit-identical to
    * [[annIvfPqTopk]]'s in-memory path (rows-only here: the training is
    * not SQL-expressible). */
  def annIvfPqPersisted(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ann/ivfpq_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    graft.table.GraftTable.drop(dir)
    AnnIndex.buildIvfPq(vecs, dir, nlist = 16)
    AnnIndex.queryIvfPq(dir, vecs, vecs.filter(col("vec_id") % 50 === 0),
      k = 5, nprobe = 6)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Drift-triggered operational rebuild exercised end to end: build the
    * persisted IVF-PQ index on HALF the corpus, atomically rebuild it from
    * the full corpus (fresh version subdir + atomic meta re-point — the
    * old version serves queries until the swap), vacuum the superseded
    * version, and answer from the rebuilt index — spec-pinned
    * bit-identical to a fresh full-corpus build (rows-only here: the
    * training is not SQL-expressible). */
  def annIvfPqRebuilt(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ann/ivfpqr_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    graft.table.GraftTable.drop(dir)
    AnnIndex.buildIvfPq(vecs.filter(col("vec_id") % 2 === 0), dir, nlist = 16)
    AnnIndex.rebuildIvfPq(dir, vecs, nlist = 16)
    AnnIndex.vacuumIvfPq(dir)
    AnnIndex.queryIvfPq(dir, vecs, vecs.filter(col("vec_id") % 50 === 0),
      k = 5, nprobe = 6)
      .orderBy(col("query_id"), col("rnk"))
  }

  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
      TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
      TextFunctions.punctCount(col("text")).as("punct_tokens"))
      .orderBy(col("doc_id"))

  def textQuality(s: SparkSession, d: String): DataFrame = {
    val cols = TextFunctions.qualityColumns(col("text"))
      .map { case (name, c) => c.as(name) }
    Tables.documents(s, d).select(col("doc_id") +: cols: _*).orderBy(col("doc_id"))
  }

  def textLangid(s: SparkSession, d: String): DataFrame = {
    val (scores, pred) = TextFunctions.langIdColumns(col("text"))
    Tables.documents(s, d).select(
      col("doc_id") +: (scores.map { case (n, c) => c.as(n) } :+ pred.as("pred_lang")): _*)
      .orderBy(col("doc_id"))
  }

  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), RollingFingerprint(col("text"), 16).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** PII scrubbing: plant deterministic synthetic PII (the corpus itself is
    * clean), then redact emails / IPv4s / phone runs. */
  def textRedact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("pii", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"),
        lit(".7 or call +1 555-01"), col("doc_id").cast("string")))
      .select(col("doc_id"),
        TextFunctions.redact(col("pii")).as("redacted"))
      .orderBy(col("doc_id"))

  /** Corpus vocabulary: top 200 lower-cased alpha terms by frequency. */
  def textVocab(s: SparkSession, d: String): DataFrame =
    Curation.vocabTopK(Tables.documents(s, d), col("text"), 200)

  /** BM25 keyword retrieval: three fixed queries, top-10 docs each. */
  def searchBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val queries = Seq(
      ("q1", "spark window merge"),
      ("q2", "customer batch join"),
      ("q3", "slow query scan")).toDF("query_id", "qtext")
    Search.bm25TopK(Tables.documents(s, d), queries, k = 10)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Benchmark decontamination: the eval set is the first 12 words of
    * every 19th document (planted overlap by construction); flag corpus
    * docs sharing >= 3 distinct 8-grams with an eval prompt. */
  def contamOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val evals = docs.filter(col("doc_id") % 19 === 3)
      .select(col("doc_id").as("eval_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 12)).as("etext"))
    Search.contaminationPairs(docs, evals, n = 8, minCommon = 3)
      .orderBy(col("eval_id"), col("doc_id"))
  }

  /** Context-window chunking: 16-token windows every 12 tokens (overlap
    * 4) — the LM-pretraining prep step, one chunk row per window. */
  def textChunk(s: SparkSession, d: String): DataFrame =
    Curation.chunkDocs(Tables.documents(s, d), maxTokens = 16, stride = 12)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Decontamination: the corpus minus every document overlapping an
    * eval prompt by >= 3 contiguous 8-grams (eval docs flag themselves —
    * the realistic removal includes them). */
  def pipelineDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val evals = docs.filter(col("doc_id") % 19 === 3)
      .select(col("doc_id").as("eval_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 12)).as("etext"))
    Search.decontaminate(docs, evals, n = 8, minCommon = 3)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture sampling: rebalance the 20 sources toward fixed
    * target weights at a 10% token budget (src0's fraction caps at 1.0 —
    * the cap path is exercised on purpose). */
  def mixDomains(s: SparkSession, d: String): DataFrame =
    Curation.mixDomains(Tables.documents(s, d),
      TextFunctions.wsTokenCount(col("text")),
      weights = Map("src0" -> 0.6, "src1" -> 0.3, "src2" -> 0.15,
        "src3" -> 0.1, "src4" -> 0.05),
      budgetFrac = 0.1)
      .select(col("doc_id"), col("source"), col("tokens"))
      .orderBy(col("doc_id"))

  /** Temperature (alpha = 0.5) domain re-weighting at a 25% token budget:
    * tail sources up-sample toward sqrt-share, head sources down-sample. */
  def mixTemperature(s: SparkSession, d: String): DataFrame =
    Curation.mixTemperature(Tables.documents(s, d),
      TextFunctions.wsTokenCount(col("text")), alpha = 0.5, budgetFrac = 0.25)
      .select(col("doc_id"), col("source"), col("tokens"))
      .orderBy(col("doc_id"))

  /** Hard per-source token budgets in a deterministic md5 shuffle order:
    * three sources with budgets that bite at different depths; every other
    * source drops (explicit mix). n_chars stands in for the token count so
    * the oracle needs no text processing. */
  def mixTokenBudget(s: SparkSession, d: String): DataFrame =
    Curation.mixTokenBudget(Tables.documents(s, d), col("n_chars"),
      budgets = Map("src1" -> 5000L, "src2" -> 2000L, "src3" -> 800L))
      .select(col("doc_id"), col("source"), col("tokens"))
      .orderBy(col("doc_id"))

  /** URL-level dedup through full canonicalization: synthetic URLs derive
    * deterministically from (source, doc_id) with a mixed-case authority,
    * default port, utm_ tracking param, unsorted params and a fragment —
    * the canonical form collides across docs and the lowest id survives.
    * Path case is PRESERVED (RFC 3986: only scheme+authority fold). */
  def dedupUrl(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).withColumn("url",
      concat(lit("HTTPS://"), upper(col("source")), lit(".Example.COM:443/Docs/"),
        (col("doc_id") % 10).cast("string"),
        lit("?utm_campaign=x&b="), (col("doc_id") % 2).cast("string"),
        lit("&a="), (col("doc_id") % 3).cast("string"),
        lit("#s"), col("doc_id").cast("string")))
    Dedup.byUrl(docs, col("url"))
      .select(col("doc_id"), col("url_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Near-exact dedup: case/punctuation/whitespace variants collapse via
    * ASCII-safe normalization before hashing (planted: each doc re-appears
    * with extra punctuation + padding and must dedup away). */
  def dedupExactNormalized(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val variants = docs.withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(lit("  "), col("text"), lit(" ... !!")))
    Dedup.exactNormalized(docs.unionByName(variants))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition signals per document. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    Curation.repetitionSignals(Tables.documents(s, d), col("text"))
      .orderBy(col("doc_id"))

  /** Unigram-LM surprisal (perplexity-filter shape) in integer
    * micro-nats. */
  def textPerplexity(s: SparkSession, d: String): DataFrame =
    Curation.unigramSurprisal(Tables.documents(s, d), col("text"))
      .orderBy(col("doc_id"))

  /** Bigram-LM surprisal with add-one smoothing, integer micro-nats. */
  def textPerplexityBigram(s: SparkSession, d: String): DataFrame =
    Curation.bigramSurprisal(Tables.documents(s, d), col("text"))
      .orderBy(col("doc_id"))

  /** Line-level boilerplate removal: plant two universal lines + one
    * doc-unique line, then strip lines present in > 50% of docs. */
  def dedupParagraph(s: SparkSession, d: String): DataFrame =
    Curation.stripBoilerplate(
      Tables.documents(s, d).withColumn("ptext", concat(col("text"),
        lit("\nsubscribe to our newsletter\ncopyright example corp\ndoc tail "),
        col("doc_id").cast("string"))),
      col("ptext"), maxDocFrac = 0.5)
      .select(col("doc_id"), col("n_units"), col("n_kept"), col("clean"))
      .orderBy(col("doc_id"))

  /** SemDeDup: coarse k-means clusters, near-dup pairs within clusters
    * only. Rows-only (centroid training is impl-specific); the ScalaTest
    * oracle checks planted-duplicate recovery and pair-subset soundness
    * against brute force. */
  def dedupSemantic(s: SparkSession, d: String): DataFrame =
    Dedup.semanticPairs(vecsWithDups(s, d), tau = 0.95, nlist = 8)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))

  /** Pairwise near-dup hits → dedup decisions: connected components over
    * the n-gram Jaccard pairs, one canonical doc kept per cluster.
    * Inherits jaccardPairs' default hot-shingle cap (maxDocFrac = 0.1) and
    * its recall caveat: docs whose ONLY overlap is corpus-wide boilerplate
    * never pair, so they land in separate clusters. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = docsWithNearDups(s, d)
    val pairs = Dedup.jaccardPairs(docs, n = 3, tau = 0.5)
    Curation.dupClusters(docs, pairs, idCol = "doc_id")
      .select(col("id").as("doc_id"), col("cluster_id"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic hash-Bernoulli sample, per-language fractions. */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    Curation.stratifiedSample(Tables.documents(s, d), "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.125))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Token-budget shard packing in doc_id order (distributed prefix sum). */
  def packTokenShards(s: SparkSession, d: String): DataFrame =
    Curation.packTokenShards(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      TextFunctions.wsTokenCount(col("text")), budget = 2000L, orderCol = "doc_id")
      .select(col("doc_id"), col("tokens"), col("shard"))
      .orderBy(col("doc_id"))

  /** Best-fit context-window packing (documents stay whole — compare
    * pack_token_shards' mid-document shard cuts). */
  def packBestfit(s: SparkSession, d: String): DataFrame =
    Curation.packBestFit(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      TextFunctions.wsTokenCount(col("text")), budget = 2000L,
      idCol = "doc_id", orderCol = "doc_id", numPartitions = 8)
      .select(col("id").cast("long").as("doc_id"), col("tokens"), col("bin"))
      .orderBy(col("doc_id"))

  /** Char-level Shannon entropy quality signal (bits/char) with the usual
    * "looks like text" gate: noise/boilerplate fall outside [2.0, 5.5]. */
  def textEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        CharEntropy(col("text")).as("entropy"))
      .withColumn("keep",
        (col("entropy") >= 2.0 && col("entropy") <= 5.5).cast("int"))
      .orderBy(col("doc_id"))

  /** PCA projection of the embedding corpus to 8 components
    * (sign-canonicalized basis; see Pca.project). The gate-facing shape is
    * scalar: the projected array is exploded to one (vec_id, component,
    * value_micro) row per coordinate — the raw array column would defeat
    * the driver's row canonicalization. Library callers use Pca.project
    * directly for the array-typed API. */
  def embedPca(s: SparkSession, d: String): DataFrame =
    Pca.project(Tables.embeddings(s, d), k = 8)
      .select(col("vec_id"), posexplode(col("projected")).as(Seq("component", "v")))
      .select(col("vec_id"), col("component"),
        round(col("v") * 1e6).cast("long").as("value_micro"))
      .orderBy(col("vec_id"), col("component"))

  /** BPE tokenizer TRAINING over the document corpus (Bpe.train): one
    * distributed word-count pass, capped vocab, deterministic driver merge
    * loop. Output = the ordered merge table (all scalar columns). */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Bpe.train(Tables.documents(s, d), "text", numMerges = 200)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "merge_left", "merge_right", "pair_count")
      .orderBy("rank")
  }

  /** BPE ENCODE with merges trained on the same corpus: per-document word
    * and BPE-token counts (Bpe.encodeCounts — the per-word merge kernel
    * runs once per distinct word, never per occurrence). */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = Bpe.train(docs, "text", numMerges = 100)
    Bpe.encodeCounts(s, docs, "doc_id", "text", merges).orderBy("doc_id")
  }

  def annIvfTopk(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") % 50 === 0), k = 5,
      nlist = 16, nprobe = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Int8 scalar quantization of the embedding corpus, pinned by exact
    * integer digests (sum and index-weighted sum of the codes). */
  def embedQuantize(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d)
    val calib = Quantize.calibrate(vecs)
    Quantize.quantizeInt8(vecs, calib)
      .select(col("vec_id"), size(col("codes")).as("n_dims"),
        aggregate(col("codes"), lit(0L), (acc, x) => acc + x.cast("long")).as("q_sum"),
        aggregate(transform(col("codes"), (q, i) => q.cast("long") * (i + 1)),
          lit(0L), (acc, x) => acc + x).as("q_dot"))
      .orderBy(col("vec_id"))
  }

  /** The operators COMPOSED as one curation pipeline — quality gate →
    * exact dedup → stratified sample → token-shard packing — the shape a
    * real training-data job chains, end-to-end oracle-checked. */
  def pipelineCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keep = TextFunctions.qualityColumns(col("text")).toMap.apply("keep")
    val quality = docs.filter(keep === 1)
    val deduped = Dedup.exact(quality)
    val sampled = Curation.stratifiedSample(deduped, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.5, "zh" -> 0.5))
    Curation.packTokenShards(
      sampled.select(col("doc_id"), col("lang"), col("text")),
      TextFunctions.wsTokenCount(col("text")), budget = 2000L, orderCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("tokens"), col("shard"))
      .orderBy(col("doc_id"))
  }

  /** The round-7 operators COMPOSED: blocklist filter → classifier quality
    * gate → normalized exact dedup → token-shard packing — the
    * C4/DCLM-shaped sibling of [[pipelineCurate]] (rules swapped for the
    * classifier, exact dedup for the normalized first pass). */
  def pipelineCurate2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val noBad = Curation.badwordFilter(docs, col("text"), Seq("slow", "dup"))
    val keepIds = Curation.qualityClassifier(noBad, col("text"))
      .filter(col("keep") === 1).select("doc_id")
    val kept = noBad.join(keepIds, Seq("doc_id"), "left_semi")
    val deduped = Dedup.exactNormalized(kept)
    Curation.packTokenShards(
      deduped.select(col("doc_id"), col("lang"), col("text")),
      TextFunctions.wsTokenCount(col("text")), budget = 1500L, orderCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("tokens"), col("shard"))
      .orderBy(col("doc_id"))
  }

  def mmBinaryMeta(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.decodeMeta(Multimodal.attachPayload(Tables.documents(s, d)))
      .toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling over "video" payloads: every 64th byte offset. */
  def mmFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.attachPayload(Tables.documents(s, d)), stride = 64)
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Batched per-partition feature extraction (stubbed encoder). */
  def mmFeatures(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.extractFeatures(Multimodal.attachPayload(Tables.documents(s, d)))
      .orderBy(col("doc_id"))
  }

  /** C4-style blocklist filter: drop docs containing a blocklisted token. */
  def filterBadwords(s: SparkSession, d: String): DataFrame =
    Curation.badwordFilter(Tables.documents(s, d), col("text"),
      blocklist = Seq("slow", "dup"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Linear quality classifier in integer micro-logits. */
  def qualityClassifier(s: SparkSession, d: String): DataFrame =
    Curation.qualityClassifier(Tables.documents(s, d), col("text"))
      .orderBy(col("doc_id"))

  /** Tokenizer-vocab coverage: OOV rate against the top-100 corpus vocab. */
  def textOovRate(s: SparkSession, d: String): DataFrame =
    Curation.vocabCoverage(Tables.documents(s, d), col("text"), k = 100)
      .orderBy(col("doc_id"))

  /** Gopher-rules heuristic filter (Rae et al. 2021) over line-ified
    * documents; every fifth doc gets planted bullet/ellipsis lines so the
    * line-shape rules have real work. Exact integer arithmetic throughout
    * (see TextFunctions.gopherColumns). */
  def filterGopher(s: SparkSession, d: String): DataFrame = {
    val cols = TextFunctions.gopherColumns(col("gtext")).map { case (n, c) => c.as(n) }
    Tables.documents(s, d)
      .withColumn("gtext", concat(
        regexp_replace(col("text"), "\\. ", ".\n"),
        when(col("doc_id") % 5 === 0, lit("\n- item one\n- item two..."))
          .otherwise(lit(""))))
      .select(col("doc_id") +: cols: _*)
      .orderBy(col("doc_id"))
  }

  /** Incremental (snapshot-over-snapshot) dedup: two new crawl batches —
    * every doc duplicated across them — against a curated corpus holding
    * half the content. Within-batch dedup keeps the lower id; the
    * anti-join keeps only content the corpus has never seen. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val existing = docs.filter(col("doc_id") < 250)
    val incoming = docs.withColumn("doc_id", col("doc_id") + 10000)
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 20000))
    Dedup.incremental(existing, incoming)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Johnson-Lindenstrauss sign projection of the embedding corpus to 16
    * exact-integer components (see Projection.signProject). */
  def embedProject(s: SparkSession, d: String): DataFrame =
    Projection.signProject(Tables.embeddings(s, d), k = 16)
      .orderBy(col("vec_id"), col("j"))

  /** Exact-substring duplication signal (Lee et al. 2022) over the
    * near-dup corpus: 10-token windows shared across documents. All five
    * substring queries run the `hashed` at-scale mode: the window hash is
    * purely the INTERNAL shuffle key — counts and rebuilt text are
    * bit-identical to the string mode (spec-pinned), so the DuckDB oracle
    * (which states string semantics) still hash-matches while the benched
    * plan is the one a cluster would run. */
  def dedupSubstring(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupSignal(docsWithNearDups(s, d), n = 10, hashed = true)
      .orderBy(col("doc_id"))

  /** Exact-substring span REMOVAL (Lee et al. 2022's transformation, not
    * just the signal): duplicated 10-token windows are dropped at every
    * occurrence but the globally first, docs reassembled from surviving
    * tokens — the planted near-dup copies lose their duplicated body and
    * keep only the windows touching their unique tail. */
  def dedupSubstringRemoval(s: SparkSession, d: String): DataFrame =
    Dedup.substringRemove(docsWithNearDups(s, d), n = 10, hashed = true)
      .orderBy(col("doc_id"))

  /** Incremental span removal: a crawl batch (near-copies of curated docs
    * plus novel docs) rewritten against the immutable corpus — corpus
    * windows always win, within-batch first occurrence wins; the corpus
    * collapses to distinct window keys, never re-shuffled as text. */
  def dedupSubstringIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" fresh tail piece")).as("text"))
      .unionByName(docs.filter(col("doc_id") >= 250)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
    Dedup.substringRemoveIncremental(corpus, batch, n = 10, hashed = true)
      .orderBy(col("doc_id"))
  }

  /** Round-11 curation composed end-to-end: exact-substring span removal →
    * retention gate (docs keeping ≥ half their tokens) → token shard
    * packing of the REWRITTEN text. The removal-then-pack shape is the
    * Lee-et-al. pipeline's tail: train on deduplicated spans, not
    * duplicated ones. */
  def pipelineCurate4(s: SparkSession, d: String): DataFrame =
    Curation.packTokenShards(
      Dedup.substringRemove(docsWithNearDups(s, d), n = 10, hashed = true)
        .filter((col("n_tokens") - col("n_removed")) * 2 >= col("n_tokens"))
        .select(col("doc_id"), col("clean"),
          (col("n_tokens") - col("n_removed")).as("kept_tokens")),
      col("kept_tokens"), budget = 1500L, orderCol = "doc_id")
      .select(col("doc_id"), col("tokens"), col("shard"))
      .orderBy(col("doc_id"))

  /** Round-7 curation composed end-to-end: Gopher rules gate →
    * exact-substring duplication gate (≤10% duplicated 10-token windows,
    * the Lee-et-al. removal-threshold shape) → within-doc line dedup →
    * token shard packing. Every third doc gets a planted near-dup copy so
    * the substring gate has real work. */
  def pipelineCurate3(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    def linify(c: Column): Column = regexp_replace(c, "\\. ", ".\n")
    // spread BEFORE the regex/gopher kernels: this lineage is recomputed
    // by several consumers (dup-signal, the semi-join, line dedup, pack),
    // and a small corpus arrives as ~one scan split — without the
    // parallelism floor every recompute runs its regexes on 1-2 cores
    val corpus = Dedup.spread(
      base.select(col("doc_id"), linify(col("text")).as("gtext"))
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            linify(concat(col("text"), lit(" graft extra"))).as("gtext"))),
      "doc_id")
    val keep = TextFunctions.gopherColumns(col("gtext")).toMap.apply("keep")
    // the gopher-kept corpus is consumed by FOUR actions (the dup-signal's
    // explode + its id projection, the semi-join, line dedup, packing) —
    // pinned so the linify regex + gopher rules run once, not per action
    val g = corpus.filter(keep === 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleanIds = Dedup.substringDupSignal(g, n = 10, textCol = "gtext",
      hashed = true)
      .filter(col("dup_windows") * 10L <= col("n_windows")).select("doc_id")
    val kept = g.join(cleanIds, Seq("doc_id"), "left_semi")
    val lines = Curation.dedupLinesWithin(kept, col("gtext"))
    val packed = Curation.packTokenShards(lines.select(col("doc_id"), col("clean")),
      TextFunctions.wsTokenCount(col("clean")), budget = 1500L, orderCol = "doc_id")
      .select(col("doc_id"), col("tokens"), col("shard"))
    // materialize the (tiny) result, then release the corpus pin
    val out = packed.localCheckpoint(eager = true)
    g.unpersist(blocking = false)
    out.orderBy(col("doc_id"))
  }

  /** Corpus curation report: per-source doc counts, exact-duplicate doc
    * counts, token totals and quality-keep counts — the operability
    * summary a curation run logs after each snapshot. One hash aggregate,
    * one equi-join, one groupBy(source); every fourth doc gets a planted
    * exact copy so the dup counter has real work. */
  def corpusReport(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    val corpus = base.unionByName(base.filter(col("doc_id") % 4 === 0)
      .withColumn("doc_id", col("doc_id") + 10000))
    val qual = TextFunctions.qualityColumns(col("text")).toMap
    val withDup = corpus.withColumn("_h", md5(col("text")))
    val dupHash = withDup.groupBy("_h").agg(count(lit(1)).as("_c"))
    withDup.join(dupHash, Seq("_h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("_c") > 1L).cast("long")).as("n_dup_docs"),
        sum(TextFunctions.wsTokenCount(col("text"))).as("total_tokens"),
        sum(qual.apply("keep").cast("long")).as("n_keep"))
      .orderBy(col("source"))
  }

  /** Within-document repeated-line removal over line-ified docs with a
    * planted repeated line (first occurrence wins, order preserved). */
  def dedupLinesWithinQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).withColumn("ptext",
      concat(regexp_replace(col("text"), "\\. ", ".\n"),
        lit("\nrepeat line\nrepeat line\ntail "), col("doc_id").cast("string")))
    Curation.dedupLinesWithin(docs, col("ptext")).orderBy(col("doc_id"))
  }

  val all: Map[String, Q] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_minhash_incremental" -> (dedupMinhashIncremental _),
    "dedup_minhash_persisted" -> (dedupMinhashPersisted _),
    "dedup_minhash_gate" -> (dedupMinhashGate _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_clusters" -> (dedupClusters _),
    "sample_stratified" -> (sampleStratified _),
    "pack_token_shards" -> (packTokenShards _),
    "pack_bestfit" -> (packBestfit _),
    "text_entropy" -> (textEntropy _),
    "embed_pca" -> (embedPca _),
    "ann_cosine_topk" -> (annCosineTopk _),
    "ann_lsh_topk" -> (annLshTopk _),
    "ann_pq_topk" -> (annPqTopk _),
    "ann_ivfpq_topk" -> (annIvfPqTopk _),
    "ann_ivfpq_persisted" -> (annIvfPqPersisted _),
    "ann_ivfpq_rebuilt" -> (annIvfPqRebuilt _),
    "ann_lsh_persisted" -> (annLshPersisted _),
    "ann_ivf_topk" -> (annIvfTopk _),
    "embed_quantize" -> (embedQuantize _),
    "pipeline_curate" -> (pipelineCurate _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_redact" -> (textRedact _),
    "text_vocab" -> (textVocab _),
    "search_bm25" -> (searchBm25 _),
    "contam_overlap" -> (contamOverlap _),
    "pipeline_decontaminate" -> (pipelineDecontaminate _),
    "text_chunk" -> (textChunk _),
    "mix_domains" -> (mixDomains _),
    "mix_temperature" -> (mixTemperature _),
    "mix_token_budget" -> (mixTokenBudget _),
    "dedup_url" -> (dedupUrl _),
    "dedup_exact_normalized" -> (dedupExactNormalized _),
    "text_repetition" -> (textRepetition _),
    "text_perplexity" -> (textPerplexity _),
    "text_perplexity_bigram" -> (textPerplexityBigram _),
    "dedup_paragraph" -> (dedupParagraph _),
    "dedup_semantic" -> (dedupSemantic _),
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_features" -> (mmFeatures _),
    "filter_badwords" -> (filterBadwords _),
    "quality_classifier" -> (qualityClassifier _),
    "text_oov_rate" -> (textOovRate _),
    "pipeline_curate2" -> (pipelineCurate2 _),
    "filter_gopher" -> (filterGopher _),
    "dedup_incremental" -> (dedupIncremental _),
    "embed_project" -> (embedProject _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_removal" -> (dedupSubstringRemoval _),
    "dedup_substring_incremental" -> (dedupSubstringIncremental _),
    "pipeline_curate4" -> (pipelineCurate4 _),
    "dedup_lines_within" -> (dedupLinesWithinQ _),
    "pipeline_curate3" -> (pipelineCurate3 _),
    "corpus_report" -> (corpusReport _),
    "bpe_train" -> (bpeTrain _),
    "bpe_encode" -> (bpeEncode _)
  )

  import TextFunctions.{sql => T}

  /** Double-precision cosine in DuckDB (bit-compatible with
    * VectorFunctions.cosine's sequential double fold). */
  private def duckCosine(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), x -> x[1]::DOUBLE * x[2]::DOUBLE)) /
       | (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE))) *
       |  sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE))))""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id, text, lang, source FROM documents
        |        UNION ALL
        |        SELECT doc_id + 10000, text, lang, source FROM documents))
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text || ' graft extra' FROM documents),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM all_docs),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |       FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text || ' graft extra' FROM documents),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM all_docs),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |       FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE c::DOUBLE / (sa.sz + sb.sz - c)::DOUBLE >= 0.5),
        |pairs AS (SELECT id_a AS src, id_b AS dst FROM scored
        |          UNION ALL
        |          SELECT id_b AS src, id_a AS dst FROM scored),
        |reach(node, root) AS (
        |  SELECT doc_id, doc_id FROM all_docs
        |  UNION
        |  SELECT p.dst, r.root FROM reach r JOIN pairs p ON p.src = r.node)
        |SELECT node AS doc_id, min(root) AS cluster_id,
        |       (min(root) = node) AS keep
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "embed_quantize" ->
      """WITH dims AS (
        |  SELECT i, min(embedding[i]::DOUBLE) AS mn, max(embedding[i]::DOUBLE) AS mx
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  GROUP BY i),
        |codes AS (
        |  SELECT e.vec_id, u.i,
        |    CASE WHEN d.mx = d.mn THEN 0
        |         ELSE CAST(round((e.embedding[u.i]::DOUBLE - d.mn) * 255.0
        |                         / (d.mx - d.mn)) AS INTEGER) END AS q
        |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS u(i)
        |  JOIN dims d ON d.i = u.i)
        |SELECT vec_id, CAST(count(*) AS INTEGER) AS n_dims,
        |       CAST(sum(q) AS BIGINT) AS q_sum,
        |       CAST(sum(q * i) AS BIGINT) AS q_dot
        |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "pipeline_curate" ->
      s"""WITH q AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang, ${T.wsTokens} AS n_words,
         |      length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
         |        / greatest(${T.wsTokens}, 1)::DOUBLE AS mwl,
         |      (${T.punct})::DOUBLE / greatest(length(text), 1)::DOUBLE AS pr
         |    FROM documents)
         |  WHERE n_words >= 10 AND n_words <= 100000
         |    AND mwl >= 2.0 AND mwl <= 12.0 AND pr <= 0.2),
         |d AS (SELECT doc_id, text, lang FROM (
         |    SELECT q.*, row_number() OVER (PARTITION BY md5(text)
         |                                   ORDER BY doc_id) AS rn FROM q)
         |  WHERE rn = 1),
         |s AS (SELECT doc_id, text, lang FROM d
         |  WHERE md5(CAST(doc_id AS VARCHAR)) < CASE lang
         |    WHEN 'en' THEN '80000000' WHEN 'de' THEN '80000000'
         |    WHEN 'fr' THEN '80000000' WHEN 'es' THEN '80000000'
         |    WHEN 'zh' THEN '80000000' ELSE '' END),
         |p AS (SELECT doc_id, lang, CAST(${T.wsTokens} AS BIGINT) AS tokens FROM s)
         |SELECT doc_id, lang, tokens,
         |  CAST(floor((sum(tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
         |    / 2000.0) AS BIGINT) AS shard
         |FROM p ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN '80000000'
        |            WHEN 'fr' THEN '40000000' WHEN 'es' THEN '40000000'
        |            WHEN 'zh' THEN '20000000' ELSE '' END
        |ORDER BY doc_id""".stripMargin,
    "pack_token_shards" ->
      s"""SELECT doc_id, tokens, CAST(floor((cum - tokens) / 2000.0) AS BIGINT) AS shard
         |FROM (
         |  SELECT doc_id, CAST(${T.wsTokens} AS BIGINT) AS tokens,
         |    sum(CAST(${T.wsTokens} AS BIGINT)) OVER (
         |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "dedup_embedding" ->
      s"""WITH all_vecs AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, embedding FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.95
         |ORDER BY id_a, id_b""".stripMargin,
    "ann_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |sims AS (
         |  SELECT query_id, neighbor_id, ${duckCosine("qv", "cv")} AS sim
         |  FROM q JOIN c ON query_id <> neighbor_id)
         |SELECT query_id, neighbor_id, rnk FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id) AS rnk
         |  FROM sims)
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id, ${T.wsTokens} AS ws_tokens, ${T.bpeTokens} AS bpe_tokens,
         |  ${T.punct} AS punct_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, n_chars, n_words, mean_word_len, stop_ratio, punct_ratio,
         |  CASE WHEN n_words >= 10 AND n_words <= 100000
         |        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
         |        AND punct_ratio <= 0.2 THEN 1 ELSE 0 END AS keep
         |FROM (
         |  SELECT doc_id, length(text) AS n_chars, ${T.wsTokens} AS n_words,
         |    length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
         |      / greatest(${T.wsTokens}, 1)::DOUBLE AS mean_word_len,
         |    (${T.stop})::DOUBLE / greatest(${T.wsTokens}, 1)::DOUBLE AS stop_ratio,
         |    (${T.punct})::DOUBLE / greatest(length(text), 1)::DOUBLE AS punct_ratio
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
         |  CASE WHEN s_zh > 0 THEN 'zh'
         |       WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
         |       WHEN s_es > s_en THEN 'es'
         |       WHEN s_en > 0 THEN 'en'
         |       ELSE 'unknown' END AS pred_lang
         |FROM (
         |  SELECT doc_id,
         |    ${T.cnt("lower(text)", "\\b(the|and|of|is|was)\\b")} AS s_en,
         |    ${T.cnt("lower(text)", "\\b(der|die|das|und|ist)\\b")} AS s_de,
         |    ${T.cnt("lower(text)", "\\b(le|la|les|et|est)\\b")} AS s_fr,
         |    ${T.cnt("lower(text)", "\\b(el|los|las|es|y)\\b")} AS s_es,
         |    ${T.cnt("text", "[\\x{4e00}-\\x{9fff}]")} AS s_zh
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, byte_len, format,
        |  CAST(64 + crc % 448 AS INTEGER) AS width,
        |  CAST(64 + (crc // 65536) % 448 AS INTEGER) AS height,
        |  3 AS channels, crc AS checksum
        |FROM (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    'img/' || source AS format,
        |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS crc
        |  FROM documents WHERE text IS NOT NULL)
        |ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      s"""SELECT doc_id, ${TextFunctions.sql.redacted("pii")} AS redacted
         |FROM (
         |  SELECT doc_id, text || ' contact user' || doc_id ||
         |    '@example.com from 10.0.' || (doc_id % 256) ||
         |    '.7 or call +1 555-01' || doc_id AS pii
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "text_vocab" ->
      """SELECT term, cnt FROM (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
        |    FROM documents)
        |  WHERE term <> '' GROUP BY term)
        |ORDER BY cnt DESC, term ASC LIMIT 200""".stripMargin,
    // BM25 with the same FIXED-op-order formula as Search.bm25TopK; scores
    // become integer micro-points BEFORE the per-(query, doc) sum, so
    // ranking is exact integer arithmetic in both engines.
    "search_bm25" ->
      """WITH q(query_id, qtext) AS (VALUES
        |    ('q1', 'spark window merge'),
        |    ('q2', 'customer batch join'),
        |    ('q3', 'slow query scan')),
        |qt AS (SELECT DISTINCT query_id, term FROM (
        |    SELECT query_id, unnest(regexp_split_to_array(lower(qtext), '[^a-z0-9]+')) AS term
        |    FROM q) WHERE term <> ''),
        |dtok AS (SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |    FROM documents) WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM dtok GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |          FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM dtok
        |       WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (SELECT qt.query_id, tf.doc_id,
        |         CAST(round(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |           ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
        |           * 1000000.0) AS BIGINT) AS u
        |       FROM qt JOIN tf USING (term) JOIN df USING (term)
        |       JOIN dl ON dl.doc_id = tf.doc_id, stats),
        |tot AS (SELECT query_id, doc_id, CAST(sum(u) AS BIGINT) AS score_u
        |        FROM sc GROUP BY 1, 2)
        |SELECT query_id, doc_id, rnk, score_u FROM (
        |  SELECT query_id, doc_id, score_u,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score_u DESC, doc_id) AS BIGINT) AS rnk
        |  FROM tot)
        |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "contam_overlap" ->
      """WITH ev AS (
        |  SELECT doc_id AS eval_id,
        |    array_to_string(regexp_split_to_array(trim(text), '\s+')[1:12], ' ') AS etext
        |  FROM documents WHERE doc_id % 19 = 3),
        |et AS (SELECT eval_id, regexp_split_to_array(etext, ' ') AS t FROM ev),
        |esh AS (SELECT DISTINCT eval_id, array_to_string(t[i:i+7], ' ') AS shingle
        |        FROM et, unnest(range(1, len(t) - 6)) AS u(i) WHERE len(t) >= 8),
        |dt AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |dsh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
        |        FROM dt, unnest(range(1, len(t) - 6)) AS u(i) WHERE len(t) >= 8)
        |SELECT eval_id, doc_id, count(*) AS n_common
        |FROM esh JOIN dsh USING (shingle)
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY eval_id, doc_id""".stripMargin,
    "pipeline_decontaminate" ->
      """WITH ev AS (
        |  SELECT doc_id AS eval_id,
        |    array_to_string(regexp_split_to_array(trim(text), '\s+')[1:12], ' ') AS etext
        |  FROM documents WHERE doc_id % 19 = 3),
        |et AS (SELECT eval_id, regexp_split_to_array(etext, ' ') AS t FROM ev),
        |esh AS (SELECT DISTINCT eval_id, array_to_string(t[i:i+7], ' ') AS shingle
        |        FROM et, unnest(range(1, len(t) - 6)) AS u(i) WHERE len(t) >= 8),
        |dt AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |dsh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
        |        FROM dt, unnest(range(1, len(t) - 6)) AS u(i) WHERE len(t) >= 8),
        |bad AS (SELECT DISTINCT doc_id FROM (
        |  SELECT eval_id, doc_id FROM esh JOIN dsh USING (shingle)
        |  GROUP BY 1, 2 HAVING count(*) >= 3))
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH dt AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |ch AS (
        |  SELECT doc_id, CAST((s - 1) // 12 AS BIGINT) AS chunk_id,
        |         t[s : s + 15] AS c
        |  FROM dt, unnest(range(1, len(t) + 1, 12)) AS u(s))
        |SELECT doc_id, chunk_id, CAST(len(c) AS BIGINT) AS n_tokens,
        |       array_to_string(c, ' ') AS chunk
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // thresholds derive from runtime per-source token totals; the SAME
    // double op order ((w * budgetFrac) * total) / t and the same
    // md5-threshold encoding reproduce them bit-for-bit
    "mix_domains" ->
      s"""WITH tok AS (SELECT doc_id, source, CAST(${T.wsTokens} AS BIGINT) AS tokens
         |            FROM documents),
         |tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM tok),
         |per AS (SELECT source, CAST(sum(tokens) AS DOUBLE) AS t FROM tok GROUP BY source),
         |w(source, wt) AS (VALUES
         |    ('src0', CAST(0.6 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
         |    ('src2', CAST(0.15 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE)),
         |    ('src4', CAST(0.05 AS DOUBLE))),
         |th AS (SELECT w.source,
         |         printf('%08x', least(CAST(round(
         |           least(1.0, wt * 0.1 * tot.total / per.t) * 4294967296.0)
         |           AS BIGINT), 4294967295)) AS thr
         |       FROM w JOIN per USING (source), tot)
         |SELECT doc_id, source, tokens FROM tok JOIN th USING (source)
         |WHERE md5(CAST(doc_id AS VARCHAR)) < thr
         |ORDER BY doc_id""".stripMargin,
    "mix_temperature" ->
      s"""WITH tok AS (SELECT doc_id, source, CAST(${T.wsTokens} AS BIGINT) AS tokens
         |            FROM documents),
         |tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM tok),
         |per AS (SELECT source, CAST(sum(tokens) AS DOUBLE) AS t FROM tok GROUP BY source),
         |pw AS (SELECT source, t, sqrt(t / tot.total) AS p FROM per, tot),
         |z AS (SELECT list_sum(list(p ORDER BY source)) AS z FROM pw),
         |th AS (SELECT pw.source,
         |         printf('%08x', least(CAST(round(
         |           least(1.0, 0.25 * tot.total * (p / z.z) / t) * 4294967296.0)
         |           AS BIGINT), 4294967295)) AS thr
         |       FROM pw, z, tot)
         |SELECT doc_id, source, tokens FROM tok JOIN th USING (source)
         |WHERE md5(CAST(doc_id AS VARCHAR)) < thr
         |ORDER BY doc_id""".stripMargin,
    "mix_token_budget" ->
      """SELECT doc_id, source, tokens FROM (
        |  SELECT doc_id, source, n_chars AS tokens,
        |    sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents WHERE source IN ('src1', 'src2', 'src3'))
        |WHERE cum <= CASE source WHEN 'src1' THEN 5000
        |                         WHEN 'src2' THEN 2000 ELSE 800 END
        |ORDER BY doc_id""".stripMargin,
    "dedup_url" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    'HTTPS://' || upper(source) || '.Example.COM:443/Docs/' ||
        |    CAST(doc_id % 10 AS VARCHAR) ||
        |    '?utm_campaign=x&b=' || CAST(doc_id % 2 AS VARCHAR) ||
        |    '&a=' || CAST(doc_id % 3 AS VARCHAR) ||
        |    '#s' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM urls),
        |c2 AS (SELECT doc_id,
        |         lower(regexp_extract(u, '^([^/?#]*//[^/?]*)', 1)) ||
        |         substr(u, length(regexp_extract(u, '^([^/?#]*//[^/?]*)', 1)) + 1) AS u
        |       FROM c1),
        |c3 AS (SELECT doc_id,
        |         regexp_replace(regexp_replace(u,
        |           '^(https://[^/:]*):443(/|\?|$)', '\1\2'),
        |           '^(http://[^/:]*):80(/|\?|$)', '\1\2') AS u FROM c2),
        |c4 AS (SELECT doc_id, split_part(u, '?', 1) AS path,
        |         CASE WHEN length(u) > length(split_part(u, '?', 1))
        |              THEN split_part(u, '?', 2) ELSE '' END AS q FROM c3),
        |c5 AS (SELECT doc_id, path ||
        |         CASE WHEN len(ps) > 0
        |              THEN '?' || array_to_string(list_sort(ps), '&')
        |              ELSE '' END AS url_canonical
        |       FROM (SELECT doc_id, path,
        |               list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '') AS ps
        |             FROM c4))
        |SELECT doc_id, url_canonical FROM (
        |  SELECT doc_id, url_canonical,
        |    row_number() OVER (PARTITION BY url_canonical ORDER BY doc_id) AS rn
        |  FROM c5)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_exact_normalized" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (
        |      PARTITION BY lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id, text, lang, source FROM documents
        |        UNION ALL
        |        SELECT doc_id + 10000, '  ' || text || ' ... !!', lang, source
        |        FROM documents))
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |words AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
        |          FROM t),
        |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        |       FROM t, unnest(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
        |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        |bga AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgc GROUP BY 1)
        |SELECT wo.doc_id, n_words,
        |  round((n_words - n_distinct)::DOUBLE / greatest(n_words, 1)::DOUBLE, 4)
        |    AS dup_word_frac,
        |  round(coalesce(top_bg, 0)::DOUBLE / greatest(coalesce(n_bg, 0), 1)::DOUBLE, 4)
        |    AS top_bigram_frac
        |FROM words wo LEFT JOIN bga USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_perplexity" ->
      """WITH tok AS (SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |    FROM documents) WHERE term <> ''),
        |freq AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
        |stats AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
        |u AS (SELECT doc_id,
        |        CAST(round(-ln(CAST(cnt AS DOUBLE) / stats.total) * 1000000.0) AS BIGINT) AS u
        |      FROM tok JOIN freq USING (term), stats)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(u) AS BIGINT) AS nats_u
        |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_perplexity_bigram" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |v AS (SELECT count(DISTINCT term) AS vocab
        |      FROM (SELECT unnest(w) AS term FROM t)),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |       FROM t, unnest(range(1, len(w))) AS r(i) WHERE len(w) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |u AS (SELECT doc_id,
        |        CAST(round(-ln((CAST(c2 AS DOUBLE) + 1.0) /
        |                       CAST(c1 + vocab AS DOUBLE)) * 1000000.0)
        |             AS BIGINT) AS u
        |      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |               CAST(sum(u) AS BIGINT) AS nats2_u
        |        FROM u GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(nats2_u, 0) AS BIGINT) AS nats2_u
        |FROM t LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(bo // 64 AS INTEGER) AS frame_idx,
        |       CAST(bo AS INTEGER) AS byte_offset
        |FROM (SELECT doc_id, octet_length(encode(text)) AS blen FROM documents),
        |     unnest(range(0, blen, 64)) AS u(bo)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 4)) AS INTEGER) AS f0,
        |  CAST(concat('0x', substr(md5(text), 5, 4)) AS INTEGER) AS f1,
        |  CAST(concat('0x', substr(md5(text), 9, 4)) AS INTEGER) AS f2,
        |  CAST(concat('0x', substr(md5(text), 13, 4)) AS INTEGER) AS f3
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "filter_badwords" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE len(list_intersect(
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                    x -> x <> ''),
        |        ['slow', 'dup'])) = 0
        |ORDER BY doc_id""".stripMargin,
    "pipeline_curate2" ->
      s"""WITH nb AS (
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE len(list_intersect(
         |          list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |                      x -> x <> ''),
         |          ['slow', 'dup'])) = 0),
         |q AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang,
         |      CAST(round((-2.5 + 0.5 * ln(greatest(n_words, 1)::DOUBLE)
         |        + 3.0 * stop_ratio + -8.0 * punct_ratio
         |        + 1.5 * distinct_ratio) * 1000000.0) AS BIGINT) AS logit_u
         |    FROM (
         |      SELECT doc_id, text, lang, ${T.wsTokens} AS n_words,
         |        (${T.stop})::DOUBLE / greatest(${T.wsTokens}, 1)::DOUBLE AS stop_ratio,
         |        (${T.punct})::DOUBLE / greatest(length(text), 1)::DOUBLE AS punct_ratio,
         |        len(list_distinct(list_filter(
         |          regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |          x -> x <> '')))::DOUBLE
         |          / greatest(${T.wsTokens}, 1)::DOUBLE AS distinct_ratio
         |      FROM nb))
         |  WHERE logit_u >= 0),
         |d AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT q.*, row_number() OVER (
         |      PARTITION BY lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))
         |      ORDER BY doc_id) AS rn FROM q)
         |  WHERE rn = 1),
         |p AS (SELECT doc_id, lang, CAST(${T.wsTokens} AS BIGINT) AS tokens FROM d)
         |SELECT doc_id, lang, tokens,
         |  CAST(floor((sum(tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
         |    / 1500.0) AS BIGINT) AS shard
         |FROM p ORDER BY doc_id""".stripMargin,
    "text_oov_rate" ->
      """WITH tok AS (SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |    FROM documents) WHERE term <> ''),
        |vocab AS (SELECT term FROM (
        |    SELECT term, count(*) AS cnt FROM tok GROUP BY term)
        |  ORDER BY cnt DESC, term ASC LIMIT 100)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::DOUBLE
        |        / greatest(count(*), 1)::DOUBLE, 4) AS oov_frac
        |FROM tok LEFT JOIN vocab v ON tok.term = v.term
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "quality_classifier" ->
      s"""SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, logit_u,
         |  CASE WHEN logit_u >= 0 THEN 1 ELSE 0 END AS keep
         |FROM (
         |  SELECT doc_id, n_words,
         |    CAST(round((-2.5 + 0.5 * ln(greatest(n_words, 1)::DOUBLE)
         |      + 3.0 * stop_ratio + -8.0 * punct_ratio
         |      + 1.5 * distinct_ratio) * 1000000.0) AS BIGINT) AS logit_u
         |  FROM (
         |    SELECT doc_id, ${T.wsTokens} AS n_words,
         |      (${T.stop})::DOUBLE / greatest(${T.wsTokens}, 1)::DOUBLE AS stop_ratio,
         |      (${T.punct})::DOUBLE / greatest(length(text), 1)::DOUBLE AS punct_ratio,
         |      len(list_distinct(list_filter(
         |        regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |        x -> x <> '')))::DOUBLE
         |        / greatest(${T.wsTokens}, 1)::DOUBLE AS distinct_ratio
         |    FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "dedup_paragraph" ->
      """WITH p AS (SELECT doc_id,
        |    text || chr(10) || 'subscribe to our newsletter' || chr(10) ||
        |    'copyright example corp' || chr(10) || 'doc tail ' || doc_id AS ptext
        |  FROM documents),
        |s AS (SELECT doc_id, string_split(ptext, chr(10)) AS u FROM p),
        |un AS (SELECT doc_id, i AS pos, u[i] AS unit
        |       FROM s, unnest(range(1, len(u) + 1)) AS r(i)),
        |df AS (SELECT unit, count(DISTINCT doc_id) AS df FROM un GROUP BY unit),
        |n AS (SELECT count(*) AS n FROM p),
        |kept AS (SELECT un.doc_id, un.pos, un.unit
        |         FROM un JOIN df USING (unit), n WHERE df.df <= 0.5 * n.n),
        |res AS (SELECT doc_id, count(*) AS n_kept,
        |               string_agg(unit, chr(10) ORDER BY pos) AS clean
        |        FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_units FROM un GROUP BY doc_id)
        |SELECT doc_id, n_units, n_kept, clean FROM tot JOIN res USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "filter_gopher" ->
      s"""SELECT doc_id, n_words, non_ws, n_symbols, n_lines, bullet_lines,
         |  ellipsis_lines, alpha_words, stop_hits,
         |  ${T.gopherKeep} AS keep
         |FROM (
         |  SELECT doc_id, ${T.gopher}
         |  FROM (SELECT doc_id,
         |          regexp_replace(text, '\\. ', '.' || chr(10), 'g') ||
         |          CASE WHEN doc_id % 5 = 0
         |               THEN chr(10) || '- item one' || chr(10) || '- item two...'
         |               ELSE '' END AS gtext
         |        FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      """WITH incoming AS (
        |  SELECT doc_id + 10000 AS doc_id, text, lang, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000 AS doc_id, text, lang, source FROM documents),
        |batch AS (
        |  SELECT doc_id, text, lang, source FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM incoming) WHERE rn = 1)
        |SELECT b.doc_id, b.lang, b.source FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM documents d
        |                  WHERE d.doc_id < 250 AND md5(d.text) = md5(b.text))
        |ORDER BY doc_id""".stripMargin,
    "embed_project" ->
      """WITH e AS (
        |  SELECT vec_id, i - 1 AS i,
        |    CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS qv
        |  FROM (SELECT vec_id, unnest(embedding) AS v,
        |          generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |s AS (
        |  SELECT d.i, js.j,
        |    CASE WHEN substr(md5(d.i || '_' || js.j), 1, 1)
        |           IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT DISTINCT i FROM e) d
        |  CROSS JOIN (SELECT unnest(range(16)) AS j) js)
        |SELECT vec_id, CAST(s.j AS INT) AS j, CAST(sum(sgn * qv) AS BIGINT) AS proj
        |FROM e JOIN s ON e.i = s.i
        |GROUP BY vec_id, s.j ORDER BY vec_id, j""".stripMargin,
    "dedup_substring" -> {
      val w10 = (0 until 10).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' graft extra' FROM documents),
         |toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
         |         FROM all_docs),
         |w AS (SELECT doc_id, $w10 AS sh
         |      FROM toks, unnest(range(1, len(t) - 8)) AS u(i) WHERE len(t) >= 10),
         |dfc AS (SELECT sh, count(DISTINCT doc_id) AS df FROM w GROUP BY sh),
         |per AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |          CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
         |        FROM w JOIN dfc USING (sh) GROUP BY w.doc_id)
         |SELECT d.doc_id, CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(dup_windows, 0) AS BIGINT) AS dup_windows
         |FROM all_docs d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "dedup_substring_removal" -> {
      val w10 = (0 until 10).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' graft extra' FROM documents),
         |toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
         |         FROM all_docs),
         |occ AS (SELECT doc_id, i AS pos, $w10 AS sh
         |        FROM toks, unnest(range(1, len(t) - 8)) AS u(i) WHERE len(t) >= 10),
         |marked AS (SELECT doc_id, pos,
         |             row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn,
         |             count(*) OVER (PARTITION BY sh) AS cnt
         |           FROM occ),
         |cov AS (SELECT DISTINCT doc_id, pos + j AS cpos
         |        FROM marked, unnest(range(0, 10)) AS r(j)
         |        WHERE cnt >= 2 AND rn > 1),
         |tokens AS (SELECT doc_id, i AS pos, t[i] AS tok
         |           FROM toks, unnest(range(1, len(t) + 1)) AS r(i)),
         |kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tokens tk
         |         WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                           WHERE c.doc_id = tk.doc_id AND c.cpos = tk.pos)),
         |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |          string_agg(tok, ' ' ORDER BY pos) AS clean
         |        FROM kept GROUP BY doc_id),
         |sz AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
         |SELECT sz.doc_id, sz.n_tokens,
         |  CAST(sz.n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(clean, '') AS clean
         |FROM sz LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "dedup_substring_incremental" -> {
      val w10 = (0 until 10).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
         |batch AS (
         |  SELECT doc_id + 10000 AS doc_id, text || ' fresh tail piece' AS text
         |  FROM documents WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 20000, text FROM documents WHERE doc_id >= 250),
         |ctoks AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t FROM corpus),
         |csh AS (SELECT DISTINCT $w10 AS sh
         |        FROM ctoks, unnest(range(1, len(t) - 8)) AS u(i) WHERE len(t) >= 10),
         |toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
         |         FROM batch),
         |occ AS (SELECT doc_id, i AS pos, $w10 AS sh
         |        FROM toks, unnest(range(1, len(t) - 8)) AS u(i) WHERE len(t) >= 10),
         |marked AS (SELECT doc_id, pos, sh,
         |             row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn,
         |             count(*) OVER (PARTITION BY sh) AS cnt
         |           FROM occ),
         |rem AS (SELECT doc_id, pos FROM marked
         |        WHERE sh IN (SELECT sh FROM csh) OR (cnt >= 2 AND rn > 1)),
         |cov AS (SELECT DISTINCT doc_id, pos + j AS cpos
         |        FROM rem, unnest(range(0, 10)) AS r(j)),
         |tokens AS (SELECT doc_id, i AS pos, t[i] AS tok
         |           FROM toks, unnest(range(1, len(t) + 1)) AS r(i)),
         |kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tokens tk
         |         WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                           WHERE c.doc_id = tk.doc_id AND c.cpos = tk.pos)),
         |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |          string_agg(tok, ' ' ORDER BY pos) AS clean
         |        FROM kept GROUP BY doc_id),
         |sz AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
         |SELECT sz.doc_id, sz.n_tokens,
         |  CAST(sz.n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(clean, '') AS clean
         |FROM sz LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin
    },
    "pipeline_curate4" -> {
      val w10 = (0 until 10).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' graft extra' FROM documents),
         |toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
         |         FROM all_docs),
         |occ AS (SELECT doc_id, i AS pos, $w10 AS sh
         |        FROM toks, unnest(range(1, len(t) - 8)) AS u(i) WHERE len(t) >= 10),
         |marked AS (SELECT doc_id, pos,
         |             row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn,
         |             count(*) OVER (PARTITION BY sh) AS cnt
         |           FROM occ),
         |cov AS (SELECT DISTINCT doc_id, pos + j AS cpos
         |        FROM marked, unnest(range(0, 10)) AS r(j)
         |        WHERE cnt >= 2 AND rn > 1),
         |tokens AS (SELECT doc_id, i AS pos, t[i] AS tok
         |           FROM toks, unnest(range(1, len(t) + 1)) AS r(i)),
         |kept AS (SELECT tk.doc_id, tk.pos FROM tokens tk
         |         WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                           WHERE c.doc_id = tk.doc_id AND c.cpos = tk.pos)),
         |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept
         |        FROM kept GROUP BY doc_id),
         |sz AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
         |gated AS (SELECT sz.doc_id,
         |            coalesce(n_kept, 0) AS tokens
         |          FROM sz LEFT JOIN reb USING (doc_id)
         |          WHERE coalesce(n_kept, 0) * 2 >= sz.n_tokens)
         |SELECT doc_id, CAST(tokens AS BIGINT) AS tokens,
         |  CAST(floor((sum(tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
         |    / 1500.0) AS BIGINT) AS shard
         |FROM gated ORDER BY doc_id""".stripMargin
    },
    "dedup_lines_within" ->
      """WITH p AS (SELECT doc_id,
        |    regexp_replace(text, '\. ', '.' || chr(10), 'g') || chr(10) ||
        |    'repeat line' || chr(10) || 'repeat line' || chr(10) || 'tail ' || doc_id AS ptext
        |  FROM documents),
        |s AS (SELECT doc_id, string_split(ptext, chr(10)) AS u FROM p),
        |un AS (SELECT doc_id, i AS pos, u[i] AS line
        |       FROM s, unnest(range(1, len(u) + 1)) AS r(i)),
        |fst AS (SELECT doc_id, pos, line FROM (
        |          SELECT doc_id, pos, line,
        |            row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
        |          FROM un) WHERE rn = 1),
        |sz AS (SELECT doc_id, CAST(len(u) AS BIGINT) AS n_lines FROM s)
        |SELECT f.doc_id, sz.n_lines, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(line, chr(10) ORDER BY pos) AS clean
        |FROM fst f JOIN sz USING (doc_id)
        |GROUP BY f.doc_id, sz.n_lines ORDER BY doc_id""".stripMargin,
    "pipeline_curate3" -> {
      val w10 = (0 until 10).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH corpus AS (
         |  SELECT doc_id,
         |    regexp_replace(text, '\\. ', '.' || chr(10), 'g') AS gtext
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000,
         |    regexp_replace(text || ' graft extra', '\\. ', '.' || chr(10), 'g') AS gtext
         |  FROM documents WHERE doc_id % 3 = 0),
         |g AS (
         |  SELECT doc_id, gtext FROM (
         |    SELECT doc_id, gtext, ${T.gopher}
         |    FROM corpus)
         |  WHERE ${T.gopherKeep} = 1),
         |toks AS (SELECT doc_id, regexp_split_to_array(trim(gtext), '\\s+') AS t FROM g),
         |w AS (SELECT doc_id, $w10 AS sh
         |      FROM toks, unnest(range(1, len(t) - 8)) AS u(i) WHERE len(t) >= 10),
         |dfc AS (SELECT sh, count(DISTINCT doc_id) AS df FROM w GROUP BY sh),
         |sig AS (SELECT w.doc_id, count(*) AS n_windows,
         |          sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS dup_windows
         |        FROM w JOIN dfc USING (sh) GROUP BY w.doc_id),
         |kept AS (
         |  SELECT g.doc_id, g.gtext FROM g LEFT JOIN sig USING (doc_id)
         |  WHERE coalesce(dup_windows, 0) * 10 <= coalesce(n_windows, 0)),
         |s AS (SELECT doc_id, string_split(gtext, chr(10)) AS u FROM kept),
         |un AS (SELECT doc_id, i AS pos, u[i] AS line
         |       FROM s, unnest(range(1, len(u) + 1)) AS r(i)),
         |fst AS (SELECT doc_id, pos, line FROM (
         |          SELECT doc_id, pos, line,
         |            row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
         |          FROM un) WHERE rn = 1),
         |cleaned AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean
         |            FROM fst GROUP BY doc_id),
         |p AS (SELECT doc_id,
         |        CAST(${T.wsTokens.replace("text", "clean")} AS BIGINT) AS tokens
         |      FROM cleaned)
         |SELECT doc_id, tokens,
         |  CAST(floor((sum(tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens)
         |    / 1500.0) AS BIGINT) AS shard
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "corpus_report" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text, source FROM documents WHERE doc_id % 4 = 0),
         |h AS (SELECT doc_id, text, source, md5(text) AS _h FROM corpus),
         |c AS (SELECT _h, count(*) AS _c FROM h GROUP BY _h),
         |scored AS (
         |  SELECT h.source, _c, ${T.wsTokens} AS n_words,
         |    length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
         |      / greatest(${T.wsTokens}, 1)::DOUBLE AS mean_word_len,
         |    (${T.punct})::DOUBLE / greatest(length(text), 1)::DOUBLE AS punct_ratio
         |  FROM h JOIN c USING (_h))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN _c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |  CAST(sum(n_words) AS BIGINT) AS total_tokens,
         |  CAST(sum(CASE WHEN n_words >= 10 AND n_words <= 100000
         |        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
         |        AND punct_ratio <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |FROM scored GROUP BY source ORDER BY source""".stripMargin
  )
}
