package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer: distributed corpus statistics, classic
 * Sennrich merge training, distributed encoding — the missing member of
 * the engine's tokenizer family (text_tokens counts, text_vocab,
 * text_oov_rate, text_perplexity operate on fixed tokenizations; this
 * TRAINS one).
 *
 * Scale shape (the same split every production BPE trainer uses — train
 * on word counts, not the corpus):
 *  - The corpus collapses to a (word, count) table in ONE distributed
 *    aggregation — the only pass over the text.
 *  - The vocabulary is CAPPED to the top `vocabCap` words by
 *    (count desc, word asc): zipf makes the tail irrelevant to pair
 *    statistics, and the cap bounds driver state no matter how noisy a
 *    100 TB crawl's long tail is.
 *  - The merge loop runs on the driver over the capped vocab —
 *    O(numMerges × Σ|word|) on metadata-sized state, deterministic
 *    (ties break lexicographically), no Spark job per iteration.
 *  - Encoding touches each DISTINCT word once (mapPartitions kernel over
 *    the distinct-word table — the justified stateful-kernel pattern),
 *    then joins token counts back to documents; the expensive per-word
 *    merge loop never runs once per occurrence.
 *
 * Pre-tokenization matches text_vocab: lowercase maximal `[a-z]+` runs.
 * Symbols use the end-of-word marker convention: "low" → l, o, w</w> —
 * merges crossing the marker can never join two words.
 */
object Bpe {

  /** One learned merge: at `rank`, adjacent symbols (left, right) fuse;
    * `pairCount` is the weighted pair frequency when chosen. */
  case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  private val EndOfWord = "</w>"

  /** Word → initial symbol sequence (chars, marker appended to the last). */
  private[pipeline] def symbols(word: String): Vector[String] = {
    val cs = word.map(_.toString).toVector
    cs.init :+ (cs.last + EndOfWord)
  }

  /** The distributed half of training: corpus → capped (word, count)
    * vocabulary. One shuffle of (word, count) pairs, never documents. */
  def wordCounts(docs: DataFrame, textCol: String, vocabCap: Int)
      : Seq[(String, Long)] = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabCap)
    words.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The driver half: Sennrich merge training over the capped vocab (ref
    * algorithm: Sennrich, Haddow & Birch, "Neural Machine Translation of
    * Rare Words with Subword Units", ACL 2016, fig. 1). Deterministic:
    * best pair by (count desc, (left, right) lexicographic asc). */
  def trainOnCounts(vocab: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    var words: Array[(Vector[String], Long)] =
      vocab.toArray.map { case (w, n) => (symbols(w), n) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, l, r, n)
        val fused = l + r
        words = words.map { case (syms, cnt) =>
          if (!syms.indices.init.exists(i => syms(i) == l && syms(i + 1) == r))
            (syms, cnt)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), cnt)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Full training: one distributed word count + the driver merge loop. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 100000): Seq[Merge] =
    trainOnCounts(wordCounts(docs, textCol, vocabCap), numMerges)

  /** Encode one word with trained merge ranks: repeatedly fuse the
    * adjacent pair with the LOWEST rank (the standard BPE encode loop —
    * greedy by rank reproduces the training merge order). */
  private[pipeline] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = symbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = i }
        }
        i += 1
      }
      if (best < 0) continue = false
      else syms = (syms.take(best) :+ (syms(best) + syms(best + 1))) ++
        syms.drop(best + 2)
    }
    syms
  }

  /** Distributed encode: per-document word and BPE-token counts.
    *
    * The merge loop runs once per DISTINCT word (mapPartitions over the
    * distinct-word table, merge ranks broadcast once per executor), then
    * a hash join on the word carries (word → token count) back to the
    * exploded documents and a per-doc aggregation finishes — so at
    * 100 TB the per-word kernel cost is O(distinct words), the joins
    * shuffle (word, count) pairs, and nothing quadratic or driver-side
    * touches the corpus. */
  def encodeCounts(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val docWords = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
    val perWord = docWords.select("w").distinct().as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map(w => (w, encodeWord(w, r).length))
      }.toDF("w", "w_bpe")
    docWords.join(perWord, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("w_bpe").as("n_bpe_tokens"))
  }
}
