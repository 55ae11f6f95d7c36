package graft.pipeline

import graft.{Tables, TestSpark}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 curation additions: JL sign projection, incremental dedup
  * against a curated corpus, Gopher-rules filter semantics. */
class ProjectionSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("sign matrix is the documented md5-parity rule") {
    // first hex digit of md5("0_0") = '9' (odd) -> -1; md5("1_0") = 'b' -> -1
    def hex(s: String): Char = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    for (i <- 0 until 8; j <- 0 until 4) {
      val expected = if ("02468ace".contains(hex(s"${i}_${j}"))) 1L else -1L
      assert(Projection.sign(i, j) === expected, s"sign($i,$j)")
    }
  }

  test("signProject: identical vectors project identically; shape is rows*k") {
    val vecs = Tables.embeddings(spark, sf).limit(50)
    val dup = vecs.unionByName(vecs.withColumn("vec_id", col("vec_id") + 100000))
    val out = Projection.signProject(dup, k = 8)
    assert(out.count() === 100 * 8)
    val byId = out.groupBy("vec_id")
      .agg(concat_ws(",", collect_list(col("proj").cast("string"))).as("sig"))
    val pairs = byId.as("a").join(byId.as("b"),
      col("a.vec_id") + 100000 === col("b.vec_id"))
      .select(col("a.sig") === col("b.sig")).as[Boolean].collect()
    assert(pairs.length === 50 && pairs.forall(identity),
      "a duplicated vector must produce the identical integer projection")
  }

  test("signProject is 1e6-Lipschitz per perturbed dimension (locality for near-dups)") {
    // perturbing ONE input dimension by eps moves every component by at
    // most round(|eps|*1e6)+1 — the deterministic locality bound that
    // makes the projection usable for near-dup bucketing
    val vecs = Tables.embeddings(spark, sf).limit(20)
    val bumped = vecs.withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding", expr(
        "transform(embedding, (v, i) -> CASE WHEN i = 0 THEN v + CAST(0.001 AS FLOAT) ELSE v END)"))
    val out = Projection.signProject(vecs.unionByName(bumped), k = 16)
      .groupBy("vec_id").agg(expr(
        "transform(array_sort(collect_list(struct(j, proj))), x -> x.proj)").as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    for (id <- 0L until 20L; j <- 0 until 16)
      assert(math.abs(out(id)(j) - out(id + 100000)(j)) <= 1001L,
        s"vec $id component $j moved too far")
  }

  test("incremental dedup: novel content survives, known and within-batch dups collapse") {
    val existing = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha text"),   // known -> dropped
      (11L, "gamma text"),   // novel -> kept
      (12L, "gamma text"),   // within-batch dup -> dropped (11 wins)
      (13L, null.asInstanceOf[String]), // null text -> kept (never equal)
      (14L, null.asInstanceOf[String])  // second null -> also kept
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(existing, incoming)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(11L, 13L, 14L))
  }

  test("substring dup signal: hashed (at-scale) mode matches exact strings") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.unionByName(docs
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" graft extra"))))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = toMap(Dedup.substringDupSignal(corpus, n = 10))
    val fast = toMap(Dedup.substringDupSignal(corpus, n = 10, hashed = true))
    assert(exact === fast,
      "8-byte hashed shuffle keys must reproduce the exact-string counts")
  }

  test("gopher rules: each violation flips keep off exactly as documented") {
    val good = (Seq.fill(30)("the quick brown fox jumps over") :+ "of that have with").mkString(" ")
    val cases = Seq(
      ("good", good, 1),
      ("too_short", "the of words here", 0),
      ("symbol_heavy", good + " " + Seq.fill(40)("#tag").mkString(" "), 0),
      ("no_stopwords", Seq.fill(60)("lorem ipsum dolor").mkString(" "), 0),
      ("bullets", (1 to 40).map(i => s"- item $i").mkString("\n") +
        "\nthe of that have with", 0),
      ("ellipses", (1 to 30).map(i => s"the line $i goes on...").mkString("\n"), 0))
    val df = cases.map { case (n, t, k) => (n, t, k) }.toDF("name", "gtext", "expected")
    val keep = TextFunctions.gopherColumns(col("gtext")).toMap.apply("keep")
    val got = df.select(col("name"), keep.as("keep"), col("expected"))
      .as[(String, Int, Int)].collect()
    for ((name, k, expected) <- got)
      assert(k === expected, s"case $name")
  }
}
