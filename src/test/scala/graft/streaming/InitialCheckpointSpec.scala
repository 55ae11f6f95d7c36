package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.TestSpark
import graft.table.{CopyOnWrite, GraftTable, TableConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Initial-checkpoint provider (ref: hudi-utilities checkpointing/
  * InitialCheckPointProvider.java + InitialCheckpointFromAnotherHoodie
  * TimelineProvider.java): a NEW table's first pull seeds its resume token
  * from another table's timeline, then runs on its own checkpoints. */
class InitialCheckpointSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_initck_").toString

  private def drop(inbox: String, name: String, ids: Range): Unit = {
    val stage = s"$inbox/.stage_$name"
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val f = Files.list(Paths.get(stage)).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(f, Paths.get(inbox, s"$name.parquet"))
  }

  test("dfs: a fresh table seeded from another timeline skips already-ingested files") {
    val inbox = Files.createTempDirectory("graft_initck_inbox_").toString
    val oldDir = tmp()
    val old = GraftTable.create(spark, oldDir, TableConfig("ick_old",
      CopyOnWrite, keyFields = Seq("id")))
    drop(inbox, "f001", 0 until 5)
    drop(inbox, "f002", 5 until 8)
    val src = new DfsSource(spark, inbox)
    val ci = new ContinuousIngest(old, src.forTable(old),
      operation = "insert", compactEvery = 0)
    try assert(ci.drain() === 1) finally ci.close()
    assert(old.snapshot().count() === 8)

    // migrate the pipeline to a FRESH table: the seed resumes above the
    // old table's watermark — f001/f002 are never re-read
    val seed = ContinuousIngest.initialCheckpointFromTimeline(old, "dfs")
    assert(seed === Some("f002.parquet"))
    val newDir = tmp()
    val nt = GraftTable.create(spark, newDir, TableConfig("ick_new",
      CopyOnWrite, keyFields = Seq("id")))
    val ciSeeded = new ContinuousIngest(nt, src.forTable(nt, initial = seed),
      operation = "insert", compactEvery = 0)
    try assert(ciSeeded.drain() === 0) finally ciSeeded.close() // caught up
    drop(inbox, "f003", 8 until 10)
    val ci2 = new ContinuousIngest(nt, src.forTable(nt, initial = seed),
      operation = "insert", compactEvery = 0)
    try assert(ci2.drain() === 1) finally ci2.close()
    assert(nt.snapshot().count() === 2) // only f003's rows
    // the seed is only a SEED: the table's own checkpoint now rules, even
    // if the provider's value goes backwards later
    assert(ContinuousIngest.lastCheckpointFor(nt, "dfs") ===
      Some("f003.parquet"))
    val ci3 = new ContinuousIngest(nt,
      src.forTable(nt, initial = Some("")), // would re-read everything
      operation = "insert", compactEvery = 0)
    try assert(ci3.drain() === 0) finally ci3.close()
    assert(nt.snapshot().count() === 2)
    GraftTable.drop(oldDir); GraftTable.drop(newDir)
    GraftTable.drop(inbox)
  }

  test("kafka: seeded offsets resume mid-topic; a foreign topic's value is ignored") {
    val events = (0 until 20).map(i => (i.toLong, s"e$i"))
    val puller = new OffsetRangePuller {
      def latestOffsets(): Map[Int, Long] = Map(0 -> events.size.toLong)
      def earliestOffsets(): Map[Int, Long] = Map(0 -> 0L)
      def fetch(ranges: Map[Int, (Long, Long)]) = {
        val (from, until) = ranges(0)
        events.slice(from.toInt, until.toInt).toDF("id", "v")
      }
    }
    val oldDir = tmp()
    val old = GraftTable.create(spark, oldDir, TableConfig("ick_kold",
      CopyOnWrite, keyFields = Seq("id")))
    val srcOld = new KafkaLikeSource(puller,
      maxEventsPerPull = 12, topic = Some("t1"))
    val ciOld = new ContinuousIngest(old, srcOld.forTable(old),
      operation = "insert", compactEvery = 0)
    try assert(ciOld.step().isDefined) finally ciOld.close()
    assert(old.snapshot().count() === 12)

    val seed = ContinuousIngest.initialCheckpointFromTimeline(old, "kafka",
      v => KafkaLikeSource.topicOf(v).contains("t1"))
    assert(seed === Some("t1,0:12"))
    val newDir = tmp()
    val nt = GraftTable.create(spark, newDir, TableConfig("ick_knew",
      CopyOnWrite, keyFields = Seq("id")))
    val srcNew = new KafkaLikeSource(puller,
      maxEventsPerPull = 100, topic = Some("t1"))
    val ciNew = new ContinuousIngest(nt, srcNew.forTable(nt, initial = seed),
      operation = "insert", compactEvery = 0)
    try assert(ciNew.drain() === 1) finally ciNew.close()
    assert(nt.snapshot().count() === 8) // offsets 12..20 only

    // a seed recorded by a DIFFERENT topic never applies: the new lane
    // starts from earliest instead of adopting a foreign offset map
    val otherDir = tmp()
    val ot = GraftTable.create(spark, otherDir, TableConfig("ick_kother",
      CopyOnWrite, keyFields = Seq("id")))
    val srcOther = new KafkaLikeSource(puller,
      maxEventsPerPull = 100, topic = Some("t2"))
    val ciOther = new ContinuousIngest(ot,
      srcOther.forTable(ot, initial = seed),
      operation = "insert", compactEvery = 0)
    try assert(ciOther.drain() === 1) finally ciOther.close()
    assert(ot.snapshot().count() === 20)
    GraftTable.drop(oldDir); GraftTable.drop(newDir); GraftTable.drop(otherDir)
  }

  test("kafka-connect: checkpoint derived from a connect-HDFS tree, wired as the seed") {
    val root = Files.createTempDirectory("graft_connect_")
    // connect layout: name=value partition dirs; files
    // topic+partition+lower+upper.ext; checkpoint/tmp noise ignored
    def put(rel: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, Array[Byte](1)); ()
    }
    put("dt=2024-01-01/clicks+0+0+99.parquet")
    put("dt=2024-01-01/clicks+1+0+49.parquet")
    put("dt=2024-01-02/clicks+0+100+149.parquet")
    put("dt=2024-01-02/_tmp.12345")         // rejected by the file pattern
    put("logs/ignored+9+0+5.parquet")       // non-"=" dir: never recursed
    val ck = ContinuousIngest.initialCheckpointFromKafkaConnect(root)
    // per-partition MAX upper offset, topic-prefixed — the reference's
    // exact checkpoint string (re-reads one record per partition,
    // at-least-once, deduped by the upsert key)
    assert(ck === "clicks,0:149,1:49")

    // the derived string seeds a KafkaLikeSource: the first pull resumes
    // from the connect offsets, not 0
    val b = new FakeBroker
    b.append(0, (0 to 151).map(i => s"r0_$i"): _*) // offsets 0..151
    b.append(1, (0 to 50).map(i => s"r1_$i"): _*)  // offsets 0..50
    val dir = Files.createTempDirectory("graft_connect_t_").toString
    val t = GraftTable.create(spark, dir, TableConfig("ck_conn",
      CopyOnWrite, keyFields = Seq("v")))
    val src = new KafkaLikeSource(b.puller, topic = Some("clicks"))
    var pulled: Seq[String] = Nil
    val ci = new ContinuousIngest(t,
      () => src.forTable(t, initial = Some(ck))().map { case (c, df) =>
        val vs = df.select("v")
        pulled = vs.collect().map(_.getString(0)).toSeq; (c, vs)
      },
      operation = "insert", compactEvery = 0)
    try assert(ci.drain() === 1) finally ci.close()
    // partition 0 resumes at 149 (re-reads the last connect record),
    // partition 1 at 49 — nothing below re-ingested
    assert(pulled.toSet === Set("r0_149", "r0_150", "r0_151", "r1_49", "r1_50"))

    // a gapped partition set refuses (missing partition = silent data skip)
    val gap = Files.createTempDirectory("graft_connect_gap_")
    Files.createDirectories(gap.resolve("dt=x"))
    Files.write(gap.resolve("dt=x/t+0+0+9.parquet"), Array[Byte](1))
    Files.write(gap.resolve("dt=x/t+2+0+9.parquet"), Array[Byte](1))
    val e = intercept[IllegalArgumentException](
      ContinuousIngest.initialCheckpointFromKafkaConnect(gap))
    assert(e.getMessage.contains("missing partition"))
    GraftTable.drop(dir)
  }
}
