package graft.table

import java.nio.file.{Files, Paths}
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-path styles (ref: hoodie.datasource.write
  * .hive_style_partitioning / .partitionpath.urlencode): bare-value
  * segments, percent-encoded values, and the full read/upsert/partition-DDL
  * surface over both. */
class PartitionStyleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_pstyle_").toString

  private def rows = Seq(
    (1L, "us east", 10L), (2L, "eu/west", 20L), (3L, "us east", 30L),
    (4L, "ap=south", 40L)).toDF("id", "region", "v")

  test("hive_style_partitioning=false lays out bare-value directories") {
    val dir = tmp()
    rows.filter(col("region") === "us east").write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "region")
      .option("graft.hive.style.partitioning", "false")
      .mode("append").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.slices(None).map(_.partition).distinct === Seq("us east"))
    assert(Files.isDirectory(Paths.get(dir, "us east")),
      "partition dir must be the bare value")
    assert(!Files.exists(Paths.get(dir, "region=us east")))
    // round trip + upsert tagging over the bare-style path
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 2)
    t.upsert(Seq((1L, "us east", 99L)).toDF("id", "region", "v"))
    assert(t.snapshot().filter(col("id") === 1).select("v")
      .collect()(0).getLong(0) === 99L)
    GraftTable.drop(dir)
  }

  test("partitionpath.urlencode survives / and = in partition values") {
    val dir = tmp()
    rows.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "region")
      .option("graft.partitionpath.urlencode", "true")
      .mode("append").save(dir)
    val t = GraftTable.load(spark, dir)
    val parts = t.slices(None).map(_.partition).distinct.sorted
    // '/' and '=' and ' ' are all percent-encoded; each value is ONE segment
    assert(parts === Seq("region=ap%3Dsouth", "region=eu%2Fwest", "region=us%20east"))
    assert(Files.isDirectory(Paths.get(dir, "region=eu%2Fwest")),
      "encoded value must be a single directory level")
    val back = spark.read.format("graft").load(dir)
    assert(back.count() === 4)
    // the data column itself is untouched by path encoding
    assert(back.filter(col("region") === "eu/west").count() === 1)
    // upsert into an encoded partition tags correctly (no duplicate)
    t.upsert(Seq((2L, "eu/west", 77L)).toDF("id", "region", "v"))
    val got = t.snapshot().filter(col("id") === 2).select("v").as[Long].collect()
    assert(got.toSeq === Seq(77L))
    GraftTable.drop(dir)
  }

  test("SHOW PARTITIONS decodes url-encoded and bare-style idents") {
    val wh = Files.createTempDirectory("graft_pstyle_wh_").toString
    spark.conf.set("spark.sql.catalog.pstyle", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pstyle.warehouse", wh)
    try {
      val dir = s"$wh/default/enc_t"
      rows.write.format("graft")
        .option("graft.recordkey.field", "id")
        .option("graft.precombine.field", "v")
        .option("graft.partitionpath.field", "region")
        .option("graft.partitionpath.urlencode", "true")
        .option("graft.table.name", "enc_t")
        .mode("append").save(dir)
      val shown = spark.sql(s"SHOW PARTITIONS pstyle.default.enc_t")
        .collect().map(_.getString(0)).sorted
      // idents surface DECODED typed values (Spark renders them re-escaped
      // per its own ident rules, but the raw values round-trip)
      assert(shown.length === 3, shown.mkString(","))
      assert(shown.exists(_.contains("us east")) || shown.exists(_.contains("us%20east")))
    } finally {
      spark.conf.unset("spark.sql.catalog.pstyle")
      spark.conf.unset("spark.sql.catalog.pstyle.warehouse")
    }
  }

  test("CustomKeyGenerator-style mixed partitioning: simple + timestamp segments") {
    val dir = tmp()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, "us", ts("2024-01-30 10:00:00"), 1L),
      (2L, "eu", ts("2024-02-02 11:00:00"), 2L)).toDF("id", "region", "ts", "v")
    df.write.format("graft")
      .option("graft.recordkey.field", "id")
      .option("graft.precombine.field", "v")
      .option("graft.partitionpath.field", "region:simple,ts:timestamp")
      .mode("append").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.config.partitioning === PartitionByMixed(Seq(
      PartitionSegment("region"), PartitionSegment("ts", "timestamp"))))
    val parts = t.slices(None).map(_.partition).distinct.sorted
    assert(parts === Seq("region=eu/ts=2024-02-02", "region=us/ts=2024-01-30"))
    // upsert tags back into the composed partition — update, not duplicate
    t.upsert(Seq((1L, "us", ts("2024-01-30 10:00:00"), 9L))
      .toDF("id", "region", "ts", "v"))
    val snap = t.snapshot()
    assert(snap.count() === 2)
    assert(snap.filter(col("id") === 1).select("v").as[Long].collect()
      .toSeq === Seq(9L))
    GraftTable.drop(dir)
  }

  test("timestamp keygen input types: epoch_millis / epoch_seconds / date_string") {
    def check(tpe: String, df: org.apache.spark.sql.DataFrame,
        extra: Map[String, String] = Map.empty): Unit = {
      val dir = tmp()
      val w = df.write.format("graft")
        .option("graft.recordkey.field", "id")
        .option("graft.partition.timestamp.col", "ts")
        .option("graft.partition.timestamp.type", tpe)
        .mode("append")
      extra.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.save(dir)
      val parts = GraftTable.load(spark, dir).slices(None).map(_.partition).distinct
      assert(parts === Seq("dt=2024-01-30"), s"$tpe -> $parts")
      GraftTable.drop(dir)
    }
    // 2024-01-30T12:00:00Z in each encoding (session tz is UTC)
    check("epoch_millis", Seq((1L, 1706616000000L)).toDF("id", "ts"))
    check("epoch_seconds", Seq((1L, 1706616000L)).toDF("id", "ts"))
    check("date_string", Seq((1L, "30/01/2024")).toDF("id", "ts"),
      Map("graft.partition.timestamp.input.format" -> "dd/MM/yyyy"))
  }

  test("style fields persist through table.json round trip") {
    val dir = tmp()
    GraftTable.create(spark, dir, TableConfig("t", CopyOnWrite,
      keyFields = Seq("id"),
      partitioning = PartitionByColumns(Seq("region"), hiveStyle = false,
        urlEncode = true)))
    val cfg = GraftTable.load(spark, dir).config
    assert(cfg.partitioning ===
      PartitionByColumns(Seq("region"), hiveStyle = false, urlEncode = true))
    GraftTable.drop(dir)
  }
}
