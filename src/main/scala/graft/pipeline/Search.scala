package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Keyword search over the corpus (SURVEY.md §2.3): BM25 top-k ranking —
 * the retrieval stage of a dedup/decontamination/eval tooling pipeline.
 *
 * Shaped like an inverted index the way Spark wants it: the corpus is
 * tokenized ONCE, immediately semi-joined against the (tiny, broadcast)
 * query-term set — so every downstream shuffle carries only postings for
 * query terms, a vanishing fraction of the corpus. Document lengths and
 * corpus stats (N, avgdl) are one partial-aggregated pass; the final
 * per-(query, doc) sum + top-k window shuffles only scored candidates.
 *
 * Scores are computed per term as IEEE doubles with a FIXED operation
 * order, then rounded to integer micro-points (×10⁶) BEFORE the final
 * sum — integer addition is associative, so the ranking is bit-stable at
 * any parallelism (a double sum's order would not be) and an external
 * oracle stating the same formula reproduces it exactly.
 */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** BM25 top-k: queries is a (query_id, qtext) frame, k results per
    * query. Returns (query_id, doc_id, rnk, score_u) with score_u the
    * integer micro-score. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    // per-doc lengths over ALL terms (BM25's |D|), plus corpus stats —
    // two scalars to the driver, metadata-sized at any corpus size
    val docLen = terms.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = docLen.agg(count(lit(1)), sum(col("dl"))).head()
    val nDocs = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    val qTerms = queries.select(col("query_id"),
      explode(split(lower(col("qtext")), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "").distinct()
    // semi-join FIRST: only query-term postings survive into the shuffle
    val tf = terms.join(broadcast(qTerms.select("term").distinct()), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // FIXED op order, mirrored verbatim by the SQL oracle:
    //   idf   = ln((N - df + 0.5) / (df + 0.5) + 1)
    //   tfn   = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl / avgdl))
    //   score = round(idf * tfn * 1e6)  — integer micro-points
    // literals appear VERBATIM (2.2, 0.25), never as computed K1+1 / 1-B:
    // the oracle states the same decimal literals, and a Scala-side double
    // sum could differ from the parsed literal in the last ulp
    val idf = log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf") * lit(2.2)) /
      (col("tf") + lit(K1) * (lit(0.25) + lit(B) * col("dl") / lit(avgdl)))
    val perTerm = tf
      .join(broadcast(df), Seq("term"))
      .join(docLen, Seq(idCol))
      .join(broadcast(qTerms), Seq("term"))
      .withColumn("u", round(idf * tfn * lit(1e6)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score_u").desc, col(idCol))
    val out = perTerm
      .groupBy(col("query_id"), col(idCol)).agg(sum(col("u")).as("score_u"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col(idCol), col("rnk"), col("score_u"))
    val materialized = out.localCheckpoint(eager = true)
    docLen.unpersist(blocking = false)
    materialized
  }

  /** Benchmark-contamination check: which corpus documents contain a
    * contiguous `n`-gram overlap with an eval-set prompt? Both sides are
    * shingled with the native hash kernel and meet on an equi-join — at
    * 100 TB the eval side is tiny (benchmarks are small), so only shingles
    * matching eval shingles ever shuffle. Returns (eval_id, doc_id,
    * n_common) for pairs sharing >= minCommon distinct n-grams. */
  def contaminationPairs(docs: DataFrame, evalSet: DataFrame, n: Int = 8,
      minCommon: Long = 3,
      idCol: String = "doc_id", textCol: String = "text",
      evalIdCol: String = "eval_id", evalTextCol: String = "etext"): DataFrame = {
    val dsh = Dedup.shingleHashes(docs, n, idCol, textCol)
    val esh = Dedup.shingleHashes(evalSet, n, evalIdCol, evalTextCol)
    dsh.join(broadcast(esh), Seq("shingle"))
      .groupBy(col(evalIdCol), col(idCol))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
  }

  /** Decontamination (the GPT-3 / Pile training-set shape): DROP every
    * corpus document sharing ≥ minCommon contiguous n-grams with any
    * eval-set prompt — the removal step [[contaminationPairs]] only
    * reports. Same scale posture: the eval side broadcasts, only
    * eval-matching shingles shuffle, and the flagged-id set (tiny by
    * construction) anti-joins the corpus without re-reading text. */
  def decontaminate(docs: DataFrame, evalSet: DataFrame, n: Int = 8,
      minCommon: Long = 3,
      idCol: String = "doc_id", textCol: String = "text",
      evalIdCol: String = "eval_id", evalTextCol: String = "etext"): DataFrame = {
    val bad = contaminationPairs(docs, evalSet, n, minCommon,
      idCol, textCol, evalIdCol, evalTextCol)
      .select(col(idCol)).distinct()
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
