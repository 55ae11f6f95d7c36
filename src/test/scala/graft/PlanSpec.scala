package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-quality gates (SURVEY.md §6): these assertions pin the physical
 * plans we want at 100 TB — filters pushed into the parquet scan, column
 * pruning, dimension joins broadcast, partial aggregation before the
 * exchange, whole-stage codegen on the hot paths. A regression that turns
 * a broadcast join into a shuffle join or loses pushdown fails here even
 * though results stay correct.
 */
class PlanSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** "Found N WholeStageCodegen subtrees" + the generated code itself. */
  private def codegenPlan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("codegen"))

  test("stratified sample is a shuffle-free codegen'd filter over a pruned scan") {
    import org.apache.spark.sql.functions.col
    val sampled = pipeline.Curation.stratifiedSample(
      Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
      "lang", "doc_id", Map("en" -> 0.5))
    val p = plan(sampled)
    assert(!p.contains("Exchange"), "sampling must not shuffle:\n" + p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "column pruning lost:\n" + p)
  }

  test("substring span removal: no window function keyed on the window value") {
    import org.apache.spark.sql.functions.col
    // first-occurrence selection must be the partial-aggregatable
    // groupBy(sh).agg(min(struct), count) + join-back — a
    // row_number().over(partitionBy(sh)) ships every occurrence of a hot
    // boilerplate window to ONE sorting reducer at corpus scale
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val (out, cached) =
      pipeline.Dedup.substringRemovePlan(docs, 10, "doc_id", "text", hashed = true)
    try {
      val windows = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.isEmpty,
        s"span removal regressed to a window function:\n${windows.mkString("\n")}")
    } finally cached.foreach(_.unpersist(blocking = false))
  }

  test("exact/url dedup keepers: aggregate + semi-join, never a window on the content key") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // a boilerplate page duplicated 10^8 times is the hot key these
    // operators exist to collapse — keeper selection must stay the
    // map-side-combinable groupBy(min) + semi-join, not row_number()
    def windows(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    assert(windows(pipeline.Dedup.exact(docs)).isEmpty,
      "exact dedup regressed to a window")
    assert(windows(pipeline.Dedup.exactNormalized(docs)).isEmpty,
      "normalized dedup regressed to a window")
    val withUrl = docs.withColumn("url",
      concat(lit("https://ex.com/p/"), col("doc_id")))
    assert(windows(pipeline.Dedup.byUrl(withUrl, col("url"))).isEmpty,
      "url dedup regressed to a window")
    // pin the documented id-uniqueness contract: the semi-join keeper
    // keeps EVERY row sharing the minimal id within a hash group, so
    // duplicate ids survive dedup (silent on dirty input by design —
    // callers own id uniqueness)
    import spark.implicits._
    val dirty = Seq((1L, "same"), (1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("doc_id", "text")
    assert(pipeline.Dedup.exact(dirty).count() === 3,
      "documented contract changed: duplicate ids no longer survive")
  }

  test("ANN brute-force top-k is the two-phase per-query shape") {
    import org.apache.spark.sql.functions.col
    // one window keyed on query_id alone would sort the WHOLE corpus per
    // query on one reducer; the two-phase plan shows exactly two Window
    // nodes (partition-local rank + survivor re-rank)
    val vecs = Tables.embeddings(spark, sf)
    val q = pipeline.Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") % 50 === 0), 5)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 2,
      s"expected local + global windows, got ${windows.size}")
  }

  test("top-k per segment is the salted two-phase shape") {
    // 5 segments → a single segment-keyed window sorts a fifth of all
    // customers on one reducer; the two-phase plan shows exactly two
    // Window nodes (salted pass + survivor re-rank)
    val q = operators.AnalyticsQueries.qTopCustomers(spark, sf)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 2,
      s"expected salted + final windows, got ${windows.size}")
  }

  test("token-shard packing: no single-partition global window") {
    import org.apache.spark.sql.functions.col
    val packed = pipeline.Curation.packTokenShards(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")),
      functions.TextFunctions.wsTokenCount(col("text")), budget = 2000L,
      orderCol = "doc_id")
    val p = plan(packed)
    // the degenerate plan is Window over Exchange SinglePartition — the
    // distributed prefix sum must partition by _pid instead
    assert(!p.contains("Exchange SinglePartition"),
      "global window collapsed to one partition:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "offset join must broadcast:\n" + p)
  }

  test("ivf ANN: corpus-sized query frame does not broadcast") {
    val vecs = Tables.embeddings(spark, sf)
    val small = pipeline.Similarity.ivfTopK(vecs, vecs.filter(
      org.apache.spark.sql.functions.col("vec_id") % 50 === 0), k = 3,
      nlist = 4, nprobe = 2, broadcastQueries = Some(true))
    assert(plan(small).contains("BroadcastHashJoin"))
    // a tight threshold stands in for a 100 TB corpus vs the default 10 MB:
    // without it Spark would auto-broadcast the tiny test frame anyway
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val big = pipeline.Similarity.ivfTopK(vecs, vecs, k = 3,
        nlist = 4, nprobe = 2)
      assert(!big.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "corpus-vs-corpus IVF must not broadcast the query side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
  }

  test("as-of join is corpus-linear: no join, no row multiplication") {
    val df = operators.EventQueries.qAsofJoin(spark, sf)
    val p = plan(df)
    // the degenerate shape is events⋈orders-per-user then rank-1: row count
    // multiplies by per-user order count before the filter. The linear
    // shape is union + carry-forward window — no join operator at all.
    assert(!p.toLowerCase.contains("join"), "as-of must not plan a join:\n" + p)
    assert(p.contains("Window"), "carry-forward window missing:\n" + p)
    assert(df.count() > 0)
  }

  test("text_chunk: corpus-linear explode, no shuffle") {
    import org.apache.spark.sql.functions.col
    val df = pipeline.Curation.chunkDocs(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val p = plan(df)
    assert(!p.contains("Exchange"), "chunking must not shuffle:\n" + p)
    assert(df.count() > 0)
  }

  test("q6: selective filters are pushed to the parquet scan") {
    val p = plan(operators.AnalyticsQueries.q6ForecastRevenue(spark, sf))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_discount"), "discount filter not pushed")
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate filter not pushed:\n" + p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("q6: column pruning — scan reads only the columns the query needs") {
    val p = plan(operators.AnalyticsQueries.q6ForecastRevenue(spark, sf))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_returnflag"), s"scan reads unneeded column: $readSchema")
    assert(readSchema.contains("l_extendedprice"))
  }

  test("q5: dimension joins are broadcast, not shuffled") {
    val p = plan(operators.AnalyticsQueries.q5LocalSupplier(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for dimensions")
    // only the lineitem⋈orders join may shuffle
    val shuffleJoins = p.linesIterator.count(_.contains("SortMergeJoin"))
    assert(shuffleJoins <= 1, s"too many shuffle joins ($shuffleJoins):\n$p")
  }

  test("q1: partial aggregation before the exchange, inside codegen") {
    val df = operators.AnalyticsQueries.q1PricingSummary(spark, sf)
    val p = plan(df)
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
    assert(codegenPlan(df).contains("WholeStageCodegen"), "aggregation fell out of codegen")
  }

  test("graft snapshot read is a plain pushdown-capable parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan_").toString
    val t = table.GraftTable.create(spark, dir, table.TableConfig("p", table.CopyOnWrite,
      Seq("o_orderkey"), Some("o_totalprice"),
      table.PartitionByColumns(Seq("o_orderstatus"))))
    t.bulkInsert(Tables.orders(spark, sf))
    val q = t.snapshot().filter(org.apache.spark.sql.functions.col("o_orderkey") === 42)
    val p = plan(q)
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(o_orderkey,42)"),
      "key filter must reach the parquet scan of a graft table:\n" +
        p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    // a COW snapshot with no logs must not shuffle at all
    assert(!p.contains("Exchange"), "COW snapshot read introduced a shuffle:\n" + p)
    table.GraftTable.drop(dir)
  }

  test("native vector kernels stay in whole-stage codegen") {
    // the similarity plan uses the native expression, not zip_with HOFs
    val q = pipeline.PipelineQueries.annCosineTopk(spark, sf)
    val p = plan(q).toLowerCase
    assert(p.contains("floatdotexpr"), "similarity should use the native FloatDot kernel")
    assert(!p.contains("zip_with"))
    // and the kernel itself compiles into a whole-stage-codegen loop
    import org.apache.spark.sql.functions.col
    val simple = Tables.embeddings(spark, sf).select(
      graft.functions.VectorExprs.dotF(col("embedding"), col("embedding")).as("d"))
    val cg = codegenPlan(simple)
    assert(cg.contains("WholeStageCodegen"), cg.take(500))
    assert(cg.contains(".getFloat("), "FloatDot loop not inlined:\n" + cg.take(1000))
  }

  test("gopher filter is a single pruned scan, no shuffle, no join") {
    import org.apache.spark.sql.functions.col
    val cols = functions.TextFunctions.gopherColumns(col("text"))
      .map { case (n, c) => c.as(n) }
    val scored = Tables.documents(spark, sf).select(col("doc_id") +: cols: _*)
    val p = plan(scored)
    assert(!p.contains("Exchange"), "gopher scoring must not shuffle:\n" + p)
    assert(!p.contains("Join"), "gopher scoring must not join:\n" + p)
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!rs.contains("lang") && !rs.contains("source"),
      s"column pruning lost: $rs")
  }

  test("JL sign projection: one scan, no join, signs inlined in codegen") {
    import org.apache.spark.sql.functions.col
    val out = pipeline.Projection.signProject(
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")), k = 4)
    val p = plan(out)
    assert(!p.contains("Join"), "projection must not join:\n" + p)
    // the only acceptable exchange would come from a caller's orderBy;
    // the raw operator has none
    assert(!p.contains("Exchange"), "projection must not shuffle:\n" + p)
    val cg = codegenPlan(out)
    assert(cg.contains("WholeStageCodegen"), cg.take(400))
  }

  test("incremental dedup: existing side projects to hashes before any join") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val out = pipeline.Dedup.incremental(
      docs.filter(col("doc_id") < 250), docs)
    val p = plan(out)
    // the curated corpus must reach the anti-join as md5 hashes only —
    // its text column read but never carried past the projection
    val leftAnti = p.linesIterator.filter(_.contains("LeftAnti")).mkString
    assert(leftAnti.nonEmpty, "expected a left-anti join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("native kernels are callable from spark.sql once registered") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash64('the quick brown fox') AS sh,
        |  graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  graft_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nrm,
        |  size(graft_shingle_hashes('a b c d', 3)) AS n_shingles,
        |  graft_fingerprint('some document text here', 16) AS fp
        |""".stripMargin).collect()(0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getInt(3) == 2)
    // SQL results match the typed-Column API on the same inputs
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(graft.functions.Simhash64(col("t"))).collect()(0).getLong(0)
    assert(r.getLong(0) == viaCol)
  }
}
