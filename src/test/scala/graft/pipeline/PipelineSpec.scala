package graft.pipeline

import graft.{Tables, TestSpark}
import graft.functions.RollingFingerprint
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracles for the non-SQL-expressible pipeline operators: LSH recall
  * against brute force, minhash/simhash candidate quality vs exact
  * Jaccard, fingerprint stability, multimodal decode plumbing. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def nearDupDocs = {
    val docs = Tables.documents(spark, sf)
    docs.unionByName(docs
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra"))))
  }

  test("exact dedup dirty-id contract: every row carrying the minimal id survives") {
    import TestSpark.spark.implicits._
    // the corpus contract is unique ids; this pins the DOCUMENTED failure
    // mode on dirty input (duplicate ids): the skew-safe agg+semi-join
    // keeps all rows with the minimal id, not exactly one row
    val docs = Seq((1L, "same text"), (1L, "same text"), (2L, "same text"),
      (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(docs)
    assert(out.filter(col("doc_id") === 1L).count() === 2)
    assert(out.filter(col("doc_id") === 2L).count() === 0)
    assert(out.filter(col("doc_id") === 3L).count() === 1)
    // clean input: exactly one keeper per distinct content
    val clean = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    assert(Dedup.exact(clean).select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("minhash-LSH finds the same pairs as exact jaccard at tau=0.5") {
    // verification step makes LSH precision exact; recall depends on banding.
    val exact = Dedup.jaccardPairs(nearDupDocs, n = 3, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(nearDupDocs, n = 3, numHashes = 32, bands = 8, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must not produce false positives after verification")
    // planted near-dups have jaccard ~0.95+ -> banding must catch nearly all
    val planted = exact.filter { case (a, b) => b == a + 10000 }
    val recalled = planted.intersect(lsh)
    assert(recalled.size >= (planted.size * 0.95).toInt,
      s"recall ${recalled.size}/${planted.size} too low")
  }

  test("minhash incremental gate: planted corpus near-copies gated, novel docs survive") {
    val docs = Tables.documents(spark, sf)
    val existing = docs.filter(col("doc_id") < 250)
    val nearCopies = existing
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra")))
    // docs with too few words have no 3-word shingles -> no signature ->
    // invisible to the LSH gate; keep the fixture on shingled docs
    val novel = docs.filter(col("doc_id") >= 250 && col("doc_id") < 300)
      .filter(size(split(col("text"), "\\s+")) >= 5)
      .withColumn("doc_id", col("doc_id") + 20000)
    val batch = nearCopies.unionByName(novel)
    val out = Dedup.minhashIncremental(existing, batch, n = 3,
      numHashes = 32, bands = 8, tau = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val copies = nearCopies.select("doc_id").collect().map(_.getLong(0)).toSet
    val novelIds = novel.select("doc_id").collect().map(_.getLong(0)).toSet
    // near-copies of corpus docs are gated (>=95%: banding recall)
    val leaked = out.intersect(copies)
    assert(leaked.size <= (copies.size * 0.05).toInt + 1,
      s"${leaked.size}/${copies.size} corpus near-copies slipped through")
    // genuinely new docs survive — unless they near-dup ANOTHER corpus doc
    // or an earlier batch doc (verified against exact jaccard, no guess)
    val exactVsCorpus = Dedup.jaccardPairs(
        existing.unionByName(novel), n = 3, tau = 0.5)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    novelIds.filterNot(exactVsCorpus).foreach { id =>
      assert(out.contains(id), s"novel doc $id wrongly gated")
    }
    // within-batch near-dups: adding a second copy of a novel doc keeps
    // exactly one of the pair
    val twin = novel.withColumn("doc_id", col("doc_id") + 5000)
    val out2 = Dedup.minhashIncremental(existing,
      batch.unionByName(twin), n = 3, numHashes = 32, bands = 8, tau = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    novelIds.filterNot(exactVsCorpus).foreach { id =>
      assert(out2.contains(id) && !out2.contains(id + 5000),
        s"within-batch pair ($id, ${id + 5000}) mishandled: kept ${out2.intersect(Set(id, id + 5000))}")
    }
  }

  test("hot-shingle cap still finds planted near-dups through rare shingles") {
    val exact = Dedup.jaccardPairs(nearDupDocs, n = 3, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(nearDupDocs, n = 3, tau = 0.5, maxDocFrac = 0.05)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = exact.filter { case (a, b) => b == a + 10000 }
    val kept = planted.intersect(capped)
    assert(kept.size >= (planted.size * 0.95).toInt,
      s"df cap lost planted pairs: ${kept.size}/${planted.size}")
  }

  test("default hot-shingle cap: corpus-wide boilerplate never enters the pair join, jaccard stays exact") {
    import spark.implicits._
    // 100 docs, each with unique content plus ONE boilerplate sentence
    // shared by every doc; odd docs near-dup their predecessor
    val docs = (0 until 100).map { i =>
      val base = s"alpha$i beta$i gamma$i delta$i eps$i zeta$i eta$i " +
        "common boiler plate sentence here"
      val text = if (i % 2 == 1) s"alpha${i - 1} beta${i - 1} gamma${i - 1} " +
        s"delta${i - 1} eps${i - 1} zeta${i - 1} tail$i " +
        "common boiler plate sentence here" else base
      (i.toLong, text)
    }.toDF("doc_id", "text")
    // capped-by-default output must EQUAL the exhaustive exact one — the
    // hot boilerplate shingles are counted back in via the per-doc hot
    // array, so both pairs and values match bit-for-bit
    def runs(frac: Double) = Dedup.jaccardPairs(docs, n = 3, tau = 0.3,
        maxDocFrac = frac).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = runs(1.0)
    val capped = runs(0.1) // the default
    assert(exact.nonEmpty, "fixture must produce near-dup pairs")
    assert(capped === exact,
      s"capped diverged: missing=${(exact.keySet -- capped.keySet).take(3)} " +
        s"extra=${(capped.keySet -- exact.keySet).take(3)}")
    // pin the candidate-join bound: Σ df² over join-eligible shingles.
    // The three interior boilerplate shingles have df=100 each (3·10⁴
    // joined rows uncapped); with the default cap (maxDf=10) they are
    // hot and excluded, leaving only rare shingles (df ≤ 10)
    val dfs = Dedup.shingleHashes(docs, 3).groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
    val maxDf = 10L // max(2, 100 * 0.1)
    val hotRows = dfs.filter(col("df") > maxDf)
      .agg(coalesce(sum(col("df") * col("df")), lit(0L))).collect()(0).getLong(0)
    val cappedRows = dfs.filter(col("df") <= maxDf)
      .agg(coalesce(sum(col("df") * col("df")), lit(0L))).collect()(0).getLong(0)
    assert(hotRows >= 3L * 100 * 100,
      s"fixture lost its hot shingles (hotRows=$hotRows)")
    assert(cappedRows < 3000,
      s"capped join not bounded: $cappedRows candidate rows")
  }

  test("hot-shingle cap short-circuits to the single-phase plan on a clean corpus") {
    import spark.implicits._
    // the cap is on by default; when the hot set comes back EMPTY (clean
    // corpus — the common case) the plan must be the single-phase
    // exhaustive one: pair join + two sizes joins, NO hot-recount joins
    def joinCount(docs: org.apache.spark.sql.DataFrame): Int = {
      val (out, cached) =
        Dedup.jaccardPairsPlan(docs, 3, 0.3, "doc_id", "text", 0.1)
      try out.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
      finally cached.unpersist(blocking = false)
    }
    val clean = (0 until 50)
      .map(i => (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e"))
      .toDF("doc_id", "text")
    assert(joinCount(clean) === 3,
      "clean corpus must short-circuit to the single-phase plan")
    // one corpus-wide boilerplate shingle -> hot set non-empty -> the two
    // hot-recount joins appear (and only then)
    val dirty = (0 until 50)
      .map(i => (i.toLong, s"hot boiler plate u${i}a u${i}b"))
      .toDF("doc_id", "text")
    assert(joinCount(dirty) === 5,
      "hot corpus must add exactly the two hot-recount joins")
  }

  test("hot-shingle cap overflowing the inline limit falls back to join exclusion") {
    import spark.implicits._
    // a hot set larger than hotInlineCap must never be collected/inlined:
    // exclusion switches to anti/semi joins against the hot frame, and the
    // output stays bit-identical to the inline path
    val docs = (0 until 50)
      .map(i => (i.toLong, s"hot boiler plate page u${i}a u${i}b"))
      .toDF("doc_id", "text")
    def run(cap: Int) = {
      val (out, cached) =
        Dedup.jaccardPairsPlan(docs, 3, 0.3, "doc_id", "text", 0.1, cap)
      try out.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      finally cached.unpersist(blocking = false)
    }
    def joins(cap: Int) = {
      val (out, cached) =
        Dedup.jaccardPairsPlan(docs, 3, 0.3, "doc_id", "text", 0.1, cap)
      try out.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.map(_.joinType.toString).sorted
      finally cached.unpersist(blocking = false)
    }
    val inline = run(Dedup.HotInlineCap)
    val fallback = run(0) // every hot set overflows a zero cap
    assert(inline === fallback, "fallback path diverged from inline path")
    // fallback plan carries the anti + semi exclusion joins the inline
    // InSet predicate replaces
    val fb = joins(0)
    assert(fb.contains("LeftAnti") && fb.contains("LeftSemi"),
      s"expected anti+semi exclusion joins in fallback plan, got $fb")
    assert(!joins(Dedup.HotInlineCap).exists(j => j == "LeftAnti"),
      "inline path must not anti-join")
  }

  test("substringRemove: first occurrence wins, spans drop, within-doc repeats collapse") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),        // owns the first "a b c" / "b c d"
      (2L, "a b c d x y"),        // duplicated head -> only unique tail kept
      (3L, "z a b c d w"),        // duplicated middle -> edges kept
      (4L, "p q r p q r p q r"),  // within-doc repeat collapses to first
      (5L, "a b")                 // shorter than n: untouched
    ).toDF("doc_id", "text")
    def run(hashed: Boolean) = Dedup.substringRemove(docs, n = 3, hashed = hashed)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val got = run(hashed = false)
    assert(got(1L) === ((6L, 0L, "a b c d e f")))
    assert(got(2L) === ((6L, 4L, "x y")))
    assert(got(3L) === ((6L, 4L, "z w")))
    assert(got(4L) === ((9L, 6L, "p q r")))
    assert(got(5L) === ((2L, 0L, "a b")))
    // the at-scale hashed mode is pinned equal
    assert(run(hashed = true) === got)
    // a fully-duplicated doc reassembles to the empty string, not null
    val twins = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val t2 = Dedup.substringRemove(twins, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(t2(1L) === ((0L, "a b c d")))
    assert(t2(2L) === ((4L, "")))
  }

  test("substringRemoveIncremental: corpus wins, within-batch first wins, novel docs untouched") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c x y"),  // head window in the corpus -> only tail kept
      (11L, "p q r s"),    // novel, first in batch -> untouched
      (12L, "p q r s"),    // within-batch copy of 11 -> fully removed
      (13L, "c d e z w")   // corpus-tail window -> only unique tail kept
    ).toDF("doc_id", "text")
    def run(hashed: Boolean) =
      Dedup.substringRemoveIncremental(corpus, batch, n = 3, hashed = hashed)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val got = run(hashed = false)
    assert(got(10L) === ((5L, 3L, "x y")))
    assert(got(11L) === ((4L, 0L, "p q r s")))
    assert(got(12L) === ((4L, 4L, "")))
    assert(got(13L) === ((5L, 3L, "z w")))
    assert(run(hashed = true) === got)
  }

  test("substringRemove: planted corpus-wide hot window stays correct at volume") {
    import spark.implicits._
    // one boilerplate window in EVERY doc — the crawl shape the operator
    // exists for; a row_number window plan funnels all of these through
    // one sorting reducer, the agg+join plan map-side-combines the hot key
    val nDocs = 2000
    val docs = (0 until nDocs)
      .map(i => (i.toLong, s"hot win dow u${i}a u${i}b")).toDF("doc_id", "text")
    val got = Dedup.substringRemove(docs, n = 3, hashed = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got.size === nDocs)
    assert(got(0L) === ((0L, "hot win dow u0a u0b")))
    (1 until nDocs).foreach { i =>
      assert(got(i.toLong) === ((3L, s"u${i}a u${i}b")), s"doc $i")
    }
  }

  test("substringRemove: hashed and exact modes share one tokenization on hostile whitespace") {
    import spark.implicits._
    // leading tab/newline (trim strips spaces only) used to shift every
    // hashed-mode position by one; U+3000 (ideographic space) splits under
    // Character.isWhitespace but not Java \s — both sides now tokenize
    // identically (ASCII \s+ with empties dropped), so U+3000 stays INSIDE
    // its token in both modes and leading whitespace shifts nothing
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "\ta b c d e"),     // leading tab: token-identical to doc 1
      (3L, "\n a b c d e"),    // leading newline + space
      (4L, "x　y a b c z"), // U+3000 inside the first token, both modes
      // trailing whitespace: Spark's split (limit -1) KEEPS trailing empty
      // strings, so an un-stripped tail would add a phantom empty token —
      // n_tokens inflated, string mode emitting a window the hashed kernel
      // never sees. Both docs must be token-identical to doc 1.
      (5L, "a b c d e "),
      (6L, "a b c d e\t\n")
    ).toDF("doc_id", "text")
    def run(hashed: Boolean) = Dedup.substringRemove(docs, n = 3, hashed = hashed)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val got = run(hashed = false)
    assert(got(1L) === ((5L, 0L, "a b c d e")))
    assert(got(2L) === ((5L, 5L, "")))
    assert(got(3L) === ((5L, 5L, "")))
    // doc 4's "a b c" duplicates doc 1's first window: positions 1-3 drop
    assert(got(4L) === ((5L, 3L, "x　y z")))
    // trailing-whitespace docs are full duplicates of doc 1's token stream
    assert(got(5L) === ((5L, 5L, "")))
    assert(got(6L) === ((5L, 5L, "")))
    assert(run(hashed = true) === got)
    // the incremental variant shares the tokenization
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq((10L, "\tz w a b c")).toDF("doc_id", "text")
    def runInc(hashed: Boolean) =
      Dedup.substringRemoveIncremental(corpus, batch, n = 3, hashed = hashed)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val gotInc = runInc(hashed = false)
    assert(gotInc(10L) === ((5L, 3L, "z w")))
    assert(runInc(hashed = true) === gotInc)
  }

  test("simhash: near-identical docs collide within small hamming distance") {
    val pairs = Dedup.simhashPairs(nearDupDocs, maxHamming = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docsCount = Tables.documents(spark, sf).count()
    val planted = (0L until docsCount).map(i => (i, i + 10000)).toSet
    val found = planted.intersect(pairs)
    assert(found.size >= (planted.size * 0.9).toInt,
      s"simhash found only ${found.size}/${planted.size} planted near-dups")
  }

  test("lsh ANN recall@5 against brute force") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, f"ANN recall@5 $recall%.2f below floor")
  }

  test("lsh ANN auto-params scale with corpus size and keep recall") {
    // buckets stay ~target-sized as the corpus grows: per-query candidate
    // work is flat at 10^9 vectors instead of scanning n/2^planes
    val (p1, t1) = Similarity.autoParams(1000L)
    val (p2, t2) = Similarity.autoParams(1000L * 1000)
    val (p3, t3) = Similarity.autoParams(1000L * 1000 * 1000)
    assert(p1 < p2 && p2 < p3, s"planes must grow: $p1 $p2 $p3")
    assert(t1 <= t2 && t2 <= t3, s"tables must not shrink: $t1 $t2 $t3")
    assert(p3 >= 20, s"at 1e9 vectors buckets must stay small (planes=$p3)")
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopKAuto(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, f"auto-param ANN recall@5 $recall%.2f below floor")
  }

  test("PQ ANN: recall@5 vs brute force, planted exact dup in top-k, deterministic codes") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, f"PQ recall@5 $recall%.2f below floor")
    // a planted exact duplicate shares the query's codes — ADC must put it
    // in the top-k for nearly every query
    val dup = vecs.unionByName(vecs.withColumn("vec_id", col("vec_id") + 100000))
    val hits = Similarity.pqTopK(dup, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (q, n) => n == q + 100000 }.map(_._1).toSet
    val nq = queries.count()
    assert(hits.size >= (nq * 0.8).toInt,
      s"planted dups recalled for only ${hits.size}/$nq queries")
    // deterministic: training + encoding twice yields identical codes
    val books = Similarity.trainPqCodebooks(vecs, m = 8, ksub = 16)
    val c1 = Similarity.pqEncode(vecs, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val books2 = Similarity.trainPqCodebooks(vecs, m = 8, ksub = 16)
    val c2 = Similarity.pqEncode(vecs, books2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c1 === c2, "PQ training/encoding must be deterministic")
    // index compression: m codes per vector, every code < ksub
    assert(c1.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
  }

  test("IVF-PQ ANN: nprobe=nlist reproduces pure PQ exactly; pruned probes keep recall") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    // candidate set with every cell probed == the PQ full scan -> identical
    // (raw encoding: flat PQ has no coarse centroids to take residuals
    // against, so the shared-kernel identity is pinned in raw mode)
    val full = Similarity.ivfPqTopK(vecs, queries, 5, nlist = 8, nprobe = 8,
      residual = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === pq, "nprobe=nlist must reproduce the un-pruned PQ ranking")
    // real pruning still clears the recall floor vs brute force
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Similarity.ivfPqTopK(vecs, queries, 5, nlist = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(pruned).size.toDouble / exact.size
    assert(recall >= 0.25, f"IVF-PQ recall@5 $recall%.2f below floor")
  }

  test("residual PQ: recall at the same (m, ksub) is >= raw encoding; formats versioned") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(residual: Boolean): Double = {
      val got = Similarity.ivfPqTopK(vecs, queries, 5, nlist = 16,
        nprobe = 6, residual = residual)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val (rRes, rRaw) = (recallOf(true), recallOf(false))
    assert(rRes >= rRaw,
      f"residual encoding must not lose recall: residual=$rRes%.3f raw=$rRaw%.3f")
    // persisted format versioning: a v2 build queries residual; stripping
    // the meta file makes the SAME tables load as the v1 raw format (old
    // indexes keep working), matching an in-memory raw search over the
    // persisted raw codes only when the codes ARE raw
    val dir = java.nio.file.Files.createTempDirectory("graft_respq_").toString
    try {
      AnnIndex.buildIvfPq(vecs, dir, nlist = 16, residual = false)
      // raw build + meta stripped == pre-residual index layout (both the
      // timeline commit and the legacy cache file must go — the timeline
      // is the commit point now, the file just a shim)
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir, "ivfpq_meta.json"))
      graft.table.Fs.walk(java.nio.file.Paths.get(dir, ".graft"))
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      val v1 = AnnIndex.queryIvfPq(dir, vecs, queries, k = 5, nprobe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val inMemoryRaw = Similarity.ivfPqTopK(vecs, queries, 5, nlist = 16,
        nprobe = 6, residual = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(v1 === inMemoryRaw, "meta-less index must load as v1 raw")
    } finally graft.table.GraftTable.drop(dir)
  }

  test("persisted IVF-PQ index: query result is bit-identical to the in-memory path") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_").toString
    try {
      val n = AnnIndex.buildIvfPq(vecs, dir, nlist = 16)
      assert(n === vecs.count(), "every corpus vector must be indexed")
      // the three index tables are real graft tables; codes partition by cid
      val codes = graft.table.GraftTable.load(spark, s"$dir/codes")
      assert(codes.snapshot().select("cid").distinct().count() > 1,
        "codes must land in multiple cid partitions")
      val persisted = AnnIndex.queryIvfPq(dir, vecs, queries, k = 5, nprobe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val inMemory = Similarity.ivfPqTopK(vecs, queries, k = 5,
        nlist = 16, nprobe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(persisted === inMemory,
        "persisted-index query diverged from the in-memory build")
    } finally graft.table.GraftTable.drop(dir)
  }

  test("persisted LSH index: query result is bit-identical to the in-memory path") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_").toString
    try {
      val n = AnnIndex.buildLsh(vecs, dir, planes = 4, tables = 8)
      assert(n === vecs.count() * 8, "one index row per (vector, table)")
      val persisted = AnnIndex.queryLsh(dir, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val inMemory = Similarity.lshTopK(vecs, queries, k = 5,
        planes = 4, tables = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(persisted === inMemory,
        "persisted-LSH query diverged from the in-memory path")
      // size-aware branch (shared with lshTopK): a corpus-sized query
      // frame shuffle-joins — bit-identical, and no broadcast under a
      // tight threshold stand-in for 100 TB
      val forced = AnnIndex.queryLsh(dir, queries, k = 5,
        broadcastQueries = Some(false))
      assert(forced.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === inMemory,
        "persisted-LSH shuffle fallback diverged")
      val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        assert(!AnnIndex.queryLsh(dir, vecs, k = 3).queryExecution
          .executedPlan.toString.contains("BroadcastExchange"),
          "corpus-sized query frame broadcast in persisted-LSH query")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
    } finally graft.table.GraftTable.drop(dir)
  }

  test("persisted IVF-PQ: incremental upsert adds and moves vectors without retraining") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
    val n = vecs.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_annupd_").toString
    try {
      AnnIndex.buildIvfPq(vecs, dir, nlist = 16)
      // each read loads fresh: the refresh commits through its own writer
      // instance, the reader pattern is load-then-snapshot
      def codes() = graft.table.GraftTable.load(spark, s"$dir/codes")
      // ADD: a brand-new vector that exactly duplicates query 0's
      // embedding — after the refresh it must surface as its top neighbor
      val q0 = vecs.filter(col("vec_id") === 0L)
      val newId = n + 1000L
      val added = q0.select(lit(newId).as("vec_id"), col("embedding"))
      AnnIndex.upsertIvfPq(dir, added)
      assert(codes().snapshot().count() === n + 1)
      val corpusNow = vecs.select(col("vec_id"), col("embedding"))
        .unionByName(added.select(col("vec_id"), col("embedding")))
      val top = AnnIndex.queryIvfPq(dir, corpusNow, q0, k = 1, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(top === Set((0L, newId)),
        s"exact-duplicate vector must be the top neighbor, got $top")
      // MOVE: re-point vector 1's embedding at a vector from a DIFFERENT
      // cell; the global-index upsert must move its codes row to the new
      // cid partition without duplicating the key
      val cidOf = codes().snapshot().select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val donor = cidOf.find { case (id, c) =>
        id != 1L && id != newId && c != cidOf(1L) }.get._1
      val moved = vecs.filter(col("vec_id") === donor)
        .select(lit(1L).as("vec_id"), col("embedding"))
      AnnIndex.upsertIvfPq(dir, moved)
      val after = codes().snapshot().select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getInt(1))
      assert(after.length === n + 1, "partition move duplicated or lost a row")
      assert(after.toMap.apply(1L) === cidOf(donor),
        "moved vector must land in its donor's cell")
    } finally graft.table.GraftTable.drop(dir)
  }

  test("driftStats: training corpus scores at baseline, off-distribution delta climbs") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_").toString
    try {
      AnnIndex.buildIvfPq(vecs, dir, nlist = 16)
      // the exact training corpus IS the baseline: same vectors, same
      // persisted codebooks, same statistic — ratio 1 up to fp summation
      // order across partitions
      val onTrain = AnnIndex.driftStats(dir, vecs)
      assert(onTrain.n === vecs.count())
      assert(onTrain.trainMeanSqError.exists(_ > 0),
        "build must persist a positive baseline")
      assert(onTrain.ratio.exists(r => math.abs(r - 1.0) < 1e-6),
        s"training corpus must score at baseline, got ${onTrain.ratio}")
      // off-distribution delta: one-hot basis vectors — unit norm like the
      // corpus but maximally concentrated where the training cloud is
      // diffuse; the persisted quantizer must reconstruct them worse
      val dim = 64
      val drifted = (0L until 256L).map { i =>
        (i + 900000L, Array.tabulate(dim)(d =>
          if (d == (i % dim).toInt) 1.0f else 0.0f))
      }.toDF("vec_id", "embedding")
      val onDrift = AnnIndex.driftStats(dir, drifted)
      assert(onDrift.n === 256)
      assert(onDrift.ratio.exists(_ > 1.1),
        s"off-distribution delta must read above baseline, got ${onDrift.ratio}")
    } finally graft.table.GraftTable.drop(dir)
  }

  test("driftStats zero baseline still signals: ratio reads infinite, not None") {
    // a legitimately-zero recorded baseline (PQ reconstructed the build
    // corpus exactly) must not read as "no baseline": nonzero delta error
    // over it is an INFINITE ratio (rebuild now). The interpretation is
    // what's under test, so the meta file is rewritten with the zero —
    // training a genuinely zero-error index is fixture-hostile (duplicate
    // k-means seeds keep cells merged).
    val vecs = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_drift0_").toString
    try {
      AnnIndex.buildIvfPq(vecs, dir, nlist = 16)
      val meta = java.nio.file.Paths.get(dir, "ivfpq_meta.json")
      // rewrite through the LEGACY path: drop the timeline commit so the
      // doctored file is what readers resolve (this doubles as coverage
      // of the pre-timeline-index fallback)
      graft.table.Fs.walk(java.nio.file.Paths.get(dir, ".graft"))
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      val zeroed = new String(java.nio.file.Files.readAllBytes(meta), "UTF-8")
        .replaceAll(""""train_err":[0-9.Ee+-]+""", "\"train_err\":0.0")
      java.nio.file.Files.write(meta, zeroed.getBytes("UTF-8"))
      val on = AnnIndex.driftStats(dir, vecs)
      assert(on.trainMeanSqError.contains(0.0))
      assert(on.meanSqError > 0)
      assert(on.ratio.contains(Double.PositiveInfinity),
        s"zero baseline + nonzero error must read infinite, got ${on.ratio}")
      // and a baseline-less meta (the non-finite-mean build path) is the
      // only shape that reads None
      val noBase = zeroed.replaceAll(""","train_err":0.0""", "")
      java.nio.file.Files.write(meta, noBase.getBytes("UTF-8"))
      val pre = AnnIndex.driftStats(dir, vecs)
      assert(pre.trainMeanSqError.isEmpty && pre.ratio.isEmpty)
    } finally graft.table.GraftTable.drop(dir)
  }

  test("persisted IVF-PQ: delete is the takedown path — removed vectors never surface") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_anndel_").toString
    try {
      AnnIndex.buildIvfPq(vecs, dir, nlist = 16)
      def ranked(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(t => (t._1, t._3)).toSeq
      val baseline = ranked(AnnIndex.queryIvfPq(dir, vecs, queries,
        k = 5, nprobe = 6))
      // take down the top neighbor of the first query
      val firstQ = baseline.head._1
      val doomed = baseline.find(t => t._1 == firstQ && t._3 == 1).get._2
      AnnIndex.deleteIvfPq(dir, Seq(doomed).toDF("vec_id"))
      val n = vecs.count()
      def liveCodes() = graft.table.GraftTable.load(spark, s"$dir/codes")
        .snapshot()
      assert(liveCodes().count() === n - 1, "delete must tombstone one row")
      assert(liveCodes().filter(col("vec_id") === doomed).isEmpty)
      val corpusAfter = vecs.filter(col("vec_id") =!= doomed)
      val after = ranked(AnnIndex.queryIvfPq(dir, corpusAfter, queries,
        k = 5, nprobe = 6))
      assert(!after.exists(_._2 == doomed),
        "deleted vector surfaced as a neighbor")
      // per query: surviving baseline candidates keep their relative order
      // (ADC scores of the others are untouched by the removal); queries
      // that never saw the doomed id are bit-identical
      val affected = baseline.filter(_._2 == doomed).map(_._1).toSet
      assert(affected.nonEmpty, "fixture must plant an affected query")
      for (q <- baseline.map(_._1).distinct) {
        val b = baseline.filter(_._1 == q)
        val a = after.filter(_._1 == q)
        if (!affected(q)) assert(a === b, s"unaffected query $q changed")
        else {
          val survivors = b.filter(_._2 != doomed).map(_._2)
          assert(a.map(_._2).filter(b.map(_._2).toSet) === survivors,
            s"query $q: survivor order changed after delete")
        }
      }
      // replay: same-key tombstone, idempotent
      AnnIndex.deleteIvfPq(dir, Seq(doomed).toDF("vec_id"))
      assert(liveCodes().count() === n - 1)
    } finally graft.table.GraftTable.drop(dir)
  }

  test("persisted LSH: upsert adds, delete removes, refresh leaves no stale buckets") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
    val n = vecs.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_lshmnt_").toString
    try {
      AnnIndex.buildLsh(vecs, dir, planes = 4, tables = 8)
      def buckets() = graft.table.GraftTable.load(spark, s"$dir/buckets")
        .snapshot()
      // ADD: a new exact duplicate of query 0 must collide in every table
      // and surface as its top neighbor
      val q0 = vecs.filter(col("vec_id") === 0L)
      val newId = n + 1000L
      AnnIndex.upsertLsh(dir, q0.select(lit(newId).as("vec_id"),
        col("embedding")))
      assert(buckets().count() === (n + 1) * 8)
      val top1 = AnnIndex.queryLsh(dir, q0, k = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(top1 === Set((0L, newId)),
        "added exact duplicate must be the top LSH neighbor")
      // REFRESH: re-point the duplicate at vector 37's embedding — its old
      // bucket rows are DIFFERENT keys; refresh must delete them (a bare
      // upsert leaves up to 16 rows for the id)
      val donor = vecs.filter(col("vec_id") === 37L)
      AnnIndex.refreshLsh(dir, donor.select(lit(newId).as("vec_id"),
        col("embedding")))
      assert(buckets().filter(col("vec_id") === newId).count() === 8,
        "refresh left stale bucket rows for the changed vector")
      val donorBuckets = buckets().filter(col("vec_id") === 37L)
        .select("table", "bucket").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val refreshed = buckets().filter(col("vec_id") === newId)
        .select("table", "bucket").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(refreshed === donorBuckets,
        "refreshed vector must hash to its donor's buckets")
      // DELETE: takedown of the duplicate reopens query 0's neighborhood
      AnnIndex.deleteLsh(dir, Seq(newId).toDF("vec_id"))
      assert(buckets().filter(col("vec_id") === newId).isEmpty)
      assert(buckets().count() === n * 8)
      assert(!AnnIndex.queryLsh(dir, q0, k = 5).collect()
        .exists(_.getLong(1) == newId), "deleted vector surfaced")
      // replay: idempotent
      AnnIndex.deleteLsh(dir, Seq(newId).toDF("vec_id"))
      assert(buckets().count() === n * 8)
    } finally graft.table.GraftTable.drop(dir)
  }

  test("index tables are lake citizens: clustering re-layout keeps queries bit-identical") {
    // the LSH probe prunes files via the build's global-sort key ranges and
    // the IVF probe via cid partitions — both are ADVISORY physics, not
    // correctness dependencies. Fragment each index with an upsert, then
    // cluster on a sort that DESTROYS the write-time bucket-range layout:
    // results must not move by a bit.
    val vecs = Tables.embeddings(spark, sf)
    val half = vecs.filter(col("vec_id") % 2 === 0)
    val rest = vecs.filter(col("vec_id") % 2 === 1)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    val lshDir = java.nio.file.Files.createTempDirectory("graft_lshcl_").toString
    val pqDir = java.nio.file.Files.createTempDirectory("graft_pqcl_").toString
    try {
      AnnIndex.buildLsh(half, lshDir, planes = 4, tables = 8)
      AnnIndex.upsertLsh(lshDir, rest)
      AnnIndex.buildIvfPq(half, pqDir, nlist = 16)
      AnnIndex.upsertIvfPq(pqDir, rest)
      def lshRes() = AnnIndex.queryLsh(lshDir, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def pqRes() = AnnIndex.queryIvfPq(pqDir, vecs, queries, k = 5, nprobe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val (lsh0, pq0) = (lshRes(), pqRes())
      assert(graft.table.GraftTable.load(spark, s"$lshDir/buckets")
        .cluster(Seq("vec_id")).nonEmpty, "clustering must rewrite the index")
      assert(graft.table.GraftTable.load(spark, s"$pqDir/codes")
        .cluster(Seq("vec_id")).nonEmpty, "clustering must rewrite the codes")
      assert(lshRes() === lsh0, "LSH query moved after clustering re-layout")
      assert(pqRes() === pq0, "IVF-PQ query moved after clustering re-layout")
    } finally {
      graft.table.GraftTable.drop(lshDir)
      graft.table.GraftTable.drop(pqDir)
    }
  }

  test("rolling fingerprint: stable, content-sensitive, codegen-compatible") {
    val docs = Tables.documents(spark, sf).limit(50)
    val fp1 = docs.select(col("doc_id"), RollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fp2 = docs.select(col("doc_id"), RollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp1 === fp2)
    // identical content -> identical fingerprint even with different ids
    val dupFp = docs.withColumn("doc_id", col("doc_id") + 500)
      .select(col("doc_id"), RollingFingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0) - 500) -> r.getLong(1)).toMap
    assert(dupFp === fp1)
    // direct eval matches the codegen'd path
    val s = "the quick brown fox jumps over the lazy dog"
    import spark.implicits._
    val viaSpark = Seq(s).toDF("text")
      .select(RollingFingerprint(col("text"), 16)).collect()(0).getLong(0)
    assert(viaSpark === graft.functions.RollingFingerprint.eval(s, 16))
  }

  test("multimodal: binary payload decodes to deterministic typed metadata") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.documents(spark, sf)
    val meta = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
    val rows = meta.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(m => m.width >= 64 && m.width < 512))
    assert(rows.forall(m => m.height >= 64 && m.height < 512))
    assert(rows.forall(m => m.byte_len > 0 && m.channels == 3))
    assert(rows.forall(m => m.format.startsWith("img/")))
    // byte_len equals utf-8 length of the text it came from
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(m => m.byte_len === lens(m.doc_id)))
    // frame sampling explodes deterministically
    val frames = Multimodal.sampleFrames(Multimodal.attachPayload(docs), 64)
    assert(frames.count() > docs.count())
  }

  test("quality flags make sense on the corpus") {
    val q = PipelineQueries.textQuality(spark, sf)
    assert(q.filter(col("keep") === 1).count() > 0)
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() === 0)
  }

  test("simhashPairs without corpusSize evaluates the input lineage once") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("evals")
    val tick = udf { (s: String) => acc.add(1); s }
    val docs = (1 to 200).map(i => (i.toLong, s"doc body number $i with words"))
      .toDF("doc_id", "text")
      .withColumn("text", tick(col("text")))
    val n = Dedup.simhashPairs(docs, maxHamming = 3).count()
    assert(n >= 0)
    // the sizing count pins the input before materializing: the pipeline
    // reads the cached rows, so the lineage (and the udf) ran exactly once
    assert(acc.value === 200L,
      s"input lineage evaluated ${acc.value / 200.0} times, expected once")
    docs.unpersist()
  }

  test("simhashAutoParams: corpus-sized chunks, tractable bound enforced") {
    // a web-scale corpus must take 32-bit chunks: 8/16-bit chunk joins are
    // O(n^2/2^w) random collisions — the round-3 scale-killer
    assert(Dedup.simhashAutoParams(100000000L, 3) === ((32, 1)))
    assert(Dedup.simhashAutoParams(1000000000L, 3) === ((32, 1)))
    // small corpora may prefer narrower chunks (fewer probes), never w=8
    // at meaningful sizes with the default threshold
    val (wSmall, _) = Dedup.simhashAutoParams(100000L, 3)
    assert(wSmall >= 16, s"100k docs picked w=$wSmall")
    // the pigeonhole cap: 8 chunks x radius 3 covers hamming <= 23
    Dedup.simhashAutoParams(1000L, 23) // must not throw
    intercept[IllegalArgumentException] { Dedup.simhashAutoParams(1000L, 24) }
  }

  test("simhash candidate volume is ~O(n), not O(n^2), on a synthetic corpus") {
    import spark.implicits._
    val n = 30000
    val rnd = new scala.util.Random(42)
    // planted near-dup pairs: id and id+n within hamming <= 3
    val base = (0 until n).map(_ => rnd.nextLong())
    val planted = (0 until 200).map { i =>
      (i + n).toLong -> (base(i) ^ (1L << (i % 64)) ^ (1L << ((i * 7 + 13) % 64)))
    }
    val sh = (base.zipWithIndex.map { case (h, i) => (i.toLong, h) } ++ planted)
      .toDF("doc_id", "simhash")
    val (w, r) = Dedup.simhashAutoParams(n.toLong, 3)
    val cands = Dedup.simhashCandidates(sh, w, r, "doc_id")
    val total = cands.count()
    // O(n^2) would be ~4.5e8 pairs; the chunk-LSH emission must stay within
    // a small multiple of n (random chunk collisions + planted dups)
    assert(total < 20L * n, s"candidate volume $total suggests an all-pairs join")
    // the pigeonhole guarantee: every planted pair (hamming <= 2 here) is
    // among the candidates
    val found = cands.filter(col("hamming") <= 3)
      .select("id_a", "id_b").collect()
      .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    val expected = (0 until 200).map(i => (i.toLong, (i + n).toLong)).toSet
    assert(expected.subsetOf(found),
      s"missing ${(expected -- found).size}/200 planted pairs")
  }

  test("lshTopK join strategy: corpus-sized query frame must not broadcast") {
    val vecs = Tables.embeddings(spark, sf)
    def hasBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastExchange")
    // small query frame: broadcast (corpus never shuffles for the join)
    val small = vecs.filter(col("vec_id") < 5)
    assert(hasBroadcast(Similarity.lshTopK(vecs, small, 3)),
      "small query frame should broadcast")
    // corpus-vs-corpus with a tight threshold (stands in for a 100 TB
    // corpus against the default 10 MB threshold): shuffle join, or the
    // driver OOMs collecting the broadcast — the round-3 scale-killer
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      assert(!hasBroadcast(Similarity.lshTopK(vecs, vecs, 3)),
        "corpus-sized query frame was broadcast")
      // explicit override still wins
      assert(hasBroadcast(
        Similarity.lshTopK(vecs, vecs, 3, broadcastQueries = Some(true))))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
  }

  test("ADC + persisted query sides share the size-aware broadcast branch") {
    // round-12 verdict: ivfPqSearch / pqTopK / queryLsh force-broadcast
    // the query frame — a corpus-vs-corpus query set (SemDeDup-over-PQ)
    // OOMs the driver where lshTopK/ivfTopK already fall back. The
    // fallback must be bit-identical and must actually shuffle.
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def noBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      !df.queryExecution.executedPlan.toString.contains("BroadcastExchange")
    // forced-shuffle results ≡ broadcast results, per operator
    assert(rows(Similarity.ivfPqTopK(vecs, queries, 5, nlist = 16, nprobe = 6,
      broadcastQueries = Some(false))) ===
      rows(Similarity.ivfPqTopK(vecs, queries, 5, nlist = 16, nprobe = 6)),
      "ivfPqTopK shuffle fallback diverged")
    assert(rows(Similarity.pqTopK(vecs, queries, 5,
      broadcastQueries = Some(false))) ===
      rows(Similarity.pqTopK(vecs, queries, 5)),
      "pqTopK shuffle fallback diverged")
    assert(rows(Similarity.bruteForceTopK(vecs, queries, 5,
      broadcastQueries = Some(false))) ===
      rows(Similarity.bruteForceTopK(vecs, queries, 5)),
      "bruteForceTopK cross-join fallback diverged")
    // a tight threshold stands in for a 100 TB corpus vs the default
    // 10 MB: the AUTO estimate must pick the shuffle join on its own
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      assert(noBroadcast(Similarity.ivfPqTopK(vecs, vecs, 3,
        nlist = 4, nprobe = 2)),
        "corpus-sized query frame broadcast in ivfPqTopK")
      assert(noBroadcast(Similarity.pqTopK(vecs, vecs, 3)),
        "corpus-sized query frame broadcast in pqTopK")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
  }

  test("text_redact scrubs every planted PII token") {
    val out = PipelineQueries.textRedact(spark, sf).cache()
    val total = out.count()
    assert(total > 0)
    // the planted email / IP / phone must never survive
    assert(out.filter(col("redacted").contains("@example.com")).count() === 0L)
    assert(out.filter(col("redacted").rlike(
      graft.functions.TextFunctions.ipv4Pat)).count() === 0L)
    assert(out.filter(col("redacted").contains("555-01")).count() === 0L)
    // and every row carries all three placeholders
    assert(out.filter(col("redacted").contains("<EMAIL>") &&
      col("redacted").contains("<IP>") &&
      col("redacted").contains("<PHONE>")).count() === total)
    out.unpersist()
  }

  test("vocabTopK is a deterministic total order: counts desc, term asc") {
    val rows = Curation.vocabTopK(
      Tables.documents(spark, sf), col("text"), 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sliding(2).forall { case Array((c1, t1), (c2, t2)) =>
      c1 > c2 || (c1 == c2 && t1 < t2) })
  }

  test("bm25: per-query scores are ranked, bounded to k, and query-term docs only") {
    val out = PipelineQueries.searchBm25(spark, sf).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getString(0))
    assert(byQuery.keySet === Set("q1", "q2", "q3"))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 10)
      val ranked = rows.sortBy(_.getLong(2))
      // scores non-increasing in rank order, ranks 1..n dense
      assert(ranked.map(_.getLong(2)).toSeq === (1L to ranked.length).toSeq)
      assert(ranked.sliding(2).forall {
        case Array(a, b) => a.getLong(3) >= b.getLong(3); case _ => true })
    }
  }

  test("contamination check recovers every planted eval prefix") {
    val out = PipelineQueries.contamOverlap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evalIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 19 === 3).select("doc_id")
      .collect().map(_.getLong(0))
    assert(evalIds.nonEmpty)
    // each eval prompt is a verbatim prefix of its source doc -> 5 shared
    // 8-grams >= minCommon, so the (eval, source) pair must always surface
    evalIds.foreach { id => assert(out.contains((id, id)),
      s"eval $id did not flag its own source document") }
  }

  test("mix_domains keeps only weighted sources and respects the cap") {
    val docs = Tables.documents(spark, sf)
    val out = PipelineQueries.mixDomains(spark, sf).cache()
    val sources = out.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(sources.subsetOf(Set("src0", "src1", "src2", "src3", "src4")))
    // src0's fraction caps at 1.0 -> every src0 doc is kept
    val src0All = docs.filter(col("source") === "src0").count()
    assert(out.filter(col("source") === "src0").count() === src0All)
    // lower-weight sources are strictly downsampled
    val src4All = docs.filter(col("source") === "src4").count()
    assert(out.filter(col("source") === "src4").count() < src4All)
    out.unpersist()
  }

  test("repetition signals are ratios in [0,1] and spike on degenerate text") {
    import spark.implicits._
    val out = PipelineQueries.textRepetition(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // a degenerate all-same-word doc maxes both signals
    val degen = Seq((1L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    val sig = Curation.repetitionSignals(degen, col("text")).head()
    assert(sig.getDouble(2) > 0.8 && sig.getDouble(3) === 1.0)
  }

  test("unigram surprisal: rare tokens score higher, exact micro-nat arithmetic") {
    import spark.implicits._
    val docs = Seq((1L, "common common common common"), (2L, "common rare"))
      .toDF("doc_id", "text")
    val out = Curation.unigramSurprisal(docs, col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // p(common)=5/6, p(rare)=1/6; per-token micro-nats round(-ln(p)*1e6)
    val uCommon = math.round(-math.log(5.0 / 6.0) * 1e6)
    val uRare = math.round(-math.log(1.0 / 6.0) * 1e6)
    assert(out(1L) === ((4L, 4 * uCommon)))
    assert(out(2L) === ((2L, uCommon + uRare)))
    // per-token average: the rare-token doc is more surprising
    assert(out(2L)._2.toDouble / 2 > out(1L)._2.toDouble / 4)
    // corpus-level invariants
    val corpus = PipelineQueries.textPerplexity(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach(r => assert(r.getLong(1) > 0 && r.getLong(2) > 0))
  }

  test("boilerplate strip removes planted universal lines, keeps unique tails") {
    val out = PipelineQueries.dedupParagraph(spark, sf).cache()
    val total = out.count()
    assert(total > 0)
    assert(out.filter(col("clean").contains("subscribe to our newsletter") ||
      col("clean").contains("copyright example corp")).count() === 0L)
    // doc-unique tail line always survives; exactly the 2 planted
    // boilerplate lines are dropped
    assert(out.filter(col("clean").contains("doc tail")).count() === total)
    assert(out.filter(col("n_kept") =!= col("n_units") - 2).count() === 0L)
    out.unpersist()
  }

  test("semantic dedup recovers all planted duplicate vectors, no false positives") {
    val vecs = Tables.embeddings(spark, sf)
    val withDups = vecs.unionByName(vecs.withColumn("vec_id", col("vec_id") + 100000))
    val pairs = Dedup.semanticPairs(withDups, tau = 0.95, nlist = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingPairs(withDups, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors share a nearest centroid -> every planted pair found
    val planted = vecs.select("vec_id").collect().map(_.getLong(0))
      .map(i => (i, i + 100000)).toSet
    assert(planted.subsetOf(pairs),
      s"semantic dedup missed ${(planted -- pairs).size} planted duplicate pairs")
    // within-cluster pairs are exact-cosine-verified -> sound vs brute force
    assert(pairs.subsetOf(exact), "semantic dedup produced a non-near-dup pair")
  }
}
