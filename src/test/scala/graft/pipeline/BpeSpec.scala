package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE train/encode against a hand-computed Sennrich-algorithm oracle —
  * independent of the implementation: every merge and token sequence below
  * was derived by hand from the published algorithm. */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // low×5 lower×2 newest×6 widest×3 — the classic worked example
  private val vocab = Seq[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainOnCounts reproduces the hand-computed merge sequence") {
    val merges = Bpe.trainOnCounts(vocab, numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) === Seq(
      ("e", "s", 9L),         // tie with (s,t</w>) at 9 — lexicographic
      ("es", "t</w>", 9L),
      ("l", "o", 7L),
      ("e", "w", 6L),         // tie at 6 with (n,ew),(w,est</w>)
      ("ew", "est</w>", 6L)))
    assert(merges.map(_.rank) === Seq(0, 1, 2, 3, 4))
  }

  test("training stops early when no pairs remain") {
    val merges = Bpe.trainOnCounts(Seq(("ab", 3L)), numMerges = 10)
    // "ab" → [a, b</w>] → one merge exhausts every pair
    assert(merges === Seq(Bpe.Merge(0, "a", "b</w>", 3L)))
  }

  test("encodeWord replays merges greedily by rank") {
    val ranks = Bpe.trainOnCounts(vocab, 5)
      .map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("newest", ranks) === Vector("n", "ewest</w>"))
    assert(Bpe.encodeWord("lowest", ranks) === Vector("lo", "w", "est</w>"))
    assert(Bpe.encodeWord("low", ranks) === Vector("lo", "w</w>"))
    assert(Bpe.encodeWord("widest", ranks) === Vector("w", "i", "d", "est</w>"))
    // out-of-vocabulary word falls back to characters
    assert(Bpe.encodeWord("xyz", ranks) === Vector("x", "y", "z</w>"))
    assert(Bpe.encodeWord("a", ranks) === Vector("a</w>"))
  }

  test("distributed train + encode matches the driver replay end-to-end") {
    val corpus = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val docs = Seq((1L, corpus), (2L, "low lowest newest"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5)
    // distributed counts include doc 2's words: low 6, lower 2, newest 7,
    // widest 3, lowest 1 → (e,s)=(s,t</w>)=11, (w,e)=10, (l,o)=9 — the
    // leading merge ORDER is unchanged from the worked example
    assert(merges.take(3).map(m => (m.left, m.right)) ===
      Seq(("e", "s"), ("es", "t</w>"), ("l", "o")))
    val counts = Bpe.encodeCounts(spark, docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2: low(2 tokens: lo,w</w>) + lowest + newest — exact driver replay
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val doc2 = Seq("low", "lowest", "newest")
      .map(w => Bpe.encodeWord(w, ranks).length).sum
    assert(counts(1) === ((2L, 3L, doc2.toLong)))
    // doc 1: 16 words; per-word token counts replayed exactly
    val doc1 = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => Bpe.encodeWord(w, ranks).length).sum
    assert(counts(0) === ((1L, 16L, doc1.toLong)))
  }

  test("vocab cap keeps training bounded and deterministic") {
    val docs = (0 until 50).map(i => (i.toLong, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    // cap excludes the singleton tail: only alpha/beta survive
    val wc = Bpe.wordCounts(docs, "text", vocabCap = 2)
    assert(wc === Seq(("alpha", 50L), ("beta", 50L)))
    val m1 = Bpe.trainOnCounts(wc, 3)
    val m2 = Bpe.trainOnCounts(wc, 3)
    assert(m1 === m2)
  }
}
