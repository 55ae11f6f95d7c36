package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import graft.TestSpark
import graft.table._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Config-driven multi-table streamer: per-table JSON configs (the fork's
  * Apollo/config-file surface) hot-reloaded by the sweep loop (ref:
  * HoodieMuiltiTableFlinkStreamer file mode,
  * MultiTableStringToRowDataMapFunction's Apollo change listener). */
class ConfigDrivenIngestSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(): Path = Files.createTempDirectory("graft_cfg_")
  private def write(p: Path, s: String): Unit =
    Files.write(p, s.getBytes(StandardCharsets.UTF_8))

  private def cfg(topic: String, base: String, name: String,
      fields: String = """{"name":"id","type":"bigint"},{"name":"v","type":"varchar(32)"},{"name":"ts","type":"bigint"}""",
      tableType: String = "COPY_ON_WRITE", extraTc: String = ""): String =
    s"""{
       |  "fields": [$fields],
       |  "kafka_config": {"topic": "$topic"},
       |  "table_config": {
       |    "table_type": "$tableType", "base_path": "$base",
       |    "table_name": "$name", "record_key_field": "id",
       |    "precombine_field": "ts"$extraTc
       |  }
       |}""".stripMargin

  test("type strings map per the reference subset") {
    assert(LaneSpec.fieldType("varchar(100)") === StringType)
    assert(LaneSpec.fieldType("string") === StringType)
    assert(LaneSpec.fieldType("decimal(10,2)") === DecimalType(10, 2))
    assert(LaneSpec.fieldType("timestamp(3)") === TimestampType)
    assert(LaneSpec.fieldType("int") === IntegerType)
    assert(LaneSpec.fieldType("bigint") === LongType)
    assert(LaneSpec.fieldType("double") === DoubleType)
    assert(LaneSpec.fieldType("boolean") === BooleanType)
    assert(LaneSpec.fieldType("date") === DateType)
    val e = intercept[RuntimeException](LaneSpec.fieldType("uuid"))
    assert(e.getMessage.contains("unsupported field type"))
  }

  test("two config files, two tables: I/U/D envelopes, exactly-once restart") {
    val dir = tmp()
    val brokers = Map("tA" -> new FakeBroker, "tB" -> new FakeBroker)
    val baseA = s"$dir/tableA"; val baseB = s"$dir/tableB"
    write(dir.resolve("a.json"), cfg("tA", baseA, "cfg_a"))
    write(dir.resolve("b.json"), cfg("tB", baseB, "cfg_b",
      fields = """{"name":"id","type":"bigint"},{"name":"v","type":"varchar(32)"},{"name":"ts","type":"bigint"},{"name":"day","type":"varchar(10)"}""",
      tableType = "MERGE_ON_READ",
      extraTc = """, "partition_field": "day", "payload": "event_time", "compaction_commits": 2"""))

    brokers("tA").append(0,
      """{"id":1,"v":"a1","ts":1,"op":"I"}""",
      """{"id":2,"v":"b1","ts":1,"op":"I"}""")
    brokers("tA").append(0,
      """{"id":1,"v":"a2","ts":2,"op":"U"}""",
      """{"id":2,"v":"b1","ts":3,"op":"D"}""")
    brokers("tB").append(0,
      """{"id":10,"v":"x","ts":1,"day":"2024-01-01","op":"I"}""",
      """{"id":11,"v":"y","ts":1,"day":"2024-01-02","op":"I"}""")

    def files() = Fs.list(dir).filter(_.toString.endsWith(".json"))
    val ing = new ConfigDrivenIngest(spark, () => files(),
      brokers(_).puller, valueCol = "v")
    try {
      assert(ing.drainAll() >= 2)
      assert(ing.laneErrors.isEmpty)
      val a = GraftTable.load(spark, baseA).snapshot()
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(a.toSet === Set((1L, "a2"))) // id2 deleted by op=D
      val b = GraftTable.load(spark, baseB).snapshot()
        .select("id", "day").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(b === Set((10L, "2024-01-01"), (11L, "2024-01-02")))
      // hive-style partition dirs from the config's partition_field
      assert(Files.isDirectory(Paths.get(baseB, "day=2024-01-01")))
    } finally ing.close()

    // restart: FRESH instance from the same files resumes from each
    // table's own kafka:<topic> offset map — no replays, new data lands
    brokers("tA").append(0, """{"id":3,"v":"c","ts":1,"op":"I"}""")
    val ing2 = new ConfigDrivenIngest(spark, () => files(),
      brokers(_).puller, valueCol = "v")
    try {
      assert(ing2.drainAll() === 1) // only lane A has lag
      val a = GraftTable.load(spark, baseA).snapshot()
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(a.toSet === Set((1L, "a2"), (3L, "c")))
    } finally ing2.close()
    GraftTable.drop(baseA); GraftTable.drop(baseB)
  }

  test("parallel sweep: lanes step concurrently with exactly-once across restart") {
    val dir = tmp()
    val brokers = Map("pA" -> new FakeBroker, "pB" -> new FakeBroker)
    val baseA = s"$dir/tableA"; val baseB = s"$dir/tableB"
    write(dir.resolve("a.json"), cfg("pA", baseA, "par_a"))
    write(dir.resolve("b.json"), cfg("pB", baseB, "par_b"))
    brokers("pA").append(0, """{"id":1,"v":"a","ts":1,"op":"I"}""")
    brokers("pB").append(0, """{"id":10,"v":"x","ts":1,"op":"I"}""",
      """{"id":11,"v":"y","ts":1,"op":"I"}""")
    def files() = Fs.list(dir).filter(_.toString.endsWith(".json"))
    val ing = new ConfigDrivenIngest(spark, () => files(),
      brokers(_).puller, valueCol = "v", parallelism = 2)
    try {
      assert(ing.drainAll() === 2)
      assert(ing.laneErrors.isEmpty)
    } finally ing.close()
    assert(GraftTable.load(spark, baseA).snapshot().count() === 1)
    assert(GraftTable.load(spark, baseB).snapshot().count() === 2)
    // fresh instance, still parallel: resumes from each table's offsets
    brokers("pA").append(0, """{"id":2,"v":"b","ts":1,"op":"I"}""")
    val ing2 = new ConfigDrivenIngest(spark, () => files(),
      brokers(_).puller, valueCol = "v", parallelism = 2)
    try assert(ing2.drainAll() === 1) finally ing2.close()
    val a = GraftTable.load(spark, baseA).snapshot()
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === Set(1L, 2L), "replay or loss under parallel sweeps")
    GraftTable.drop(baseA); GraftTable.drop(baseB)
  }

  test("hot reload: schema add, lane add/retire, broken config keeps lane") {
    val dir = tmp()
    val brokers = Map("hA" -> new FakeBroker, "hB" -> new FakeBroker)
    val baseA = s"$dir/tableA"; val baseB = s"$dir/tableB"
    val fileA = dir.resolve("a.json"); val fileB = dir.resolve("b.json")
    write(fileA, cfg("hA", baseA, "hot_a"))
    brokers("hA").append(0, """{"id":1,"v":"a","ts":1,"op":"I"}""")

    def files() = Fs.list(dir).filter(_.toString.endsWith(".json"))
    val ing = new ConfigDrivenIngest(spark, () => files(),
      brokers(_).puller, valueCol = "v")
    try {
      assert(ing.drainAll() === 1)
      assert(ing.running.size === 1)

      // the reference's Apollo-listener path: field list changes on the
      // RUNNING streamer; next sweep rebuilds the lane, schema evolution
      // on write carries the new column, old rows read back null
      write(fileA, cfg("hA", baseA, "hot_a",
        fields = """{"name":"id","type":"bigint"},{"name":"v","type":"varchar(32)"},{"name":"ts","type":"bigint"},{"name":"score","type":"double"}"""))
      brokers("hA").append(0, """{"id":2,"v":"b","ts":1,"score":0.5,"op":"I"}""")
      assert(ing.drainAll() === 1)
      val a = GraftTable.load(spark, baseA).snapshot()
        .select("id", "score").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(a === Map(1L -> None, 2L -> Some(0.5)))

      // a NEW config file starts a lane mid-run
      write(fileB, cfg("hB", baseB, "hot_b"))
      brokers("hB").append(0, """{"id":9,"v":"z","ts":1,"op":"I"}""")
      assert(ing.drainAll() === 1)
      assert(ing.running.size === 2)
      assert(GraftTable.load(spark, baseB).snapshot().count() === 1)

      // a BROKEN rewrite keeps the old lane running (error surfaced)
      write(fileB, "{ not json")
      brokers("hB").append(0, """{"id":10,"v":"z2","ts":1,"op":"I"}""")
      assert(ing.drainAll() === 1)
      assert(ing.laneErrors.keySet === Set(fileB.toString))
      assert(GraftTable.load(spark, baseB).snapshot().count() === 2)

      // deleting the file retires the lane: topic lag no longer drains
      Files.delete(fileB)
      brokers("hB").append(0, """{"id":11,"v":"z3","ts":1,"op":"I"}""")
      assert(ing.drainAll() === 0)
      assert(ing.running.size === 1)
      assert(GraftTable.load(spark, baseB).snapshot().count() === 2)
    } finally ing.close()
    GraftTable.drop(baseA); GraftTable.drop(baseB)
  }

  test("catalog_sync_config registers the lane's table by name") {
    // the fork's hive_sync_config block: sync_db + sync_table
    val dir = tmp()
    val b = new FakeBroker
    val base = s"$dir/tableSync"
    val file = dir.resolve("s.json")
    write(file, s"""{
      |  "fields": [{"name":"id","type":"bigint"},
      |             {"name":"v","type":"varchar(32)"},
      |             {"name":"ts","type":"bigint"}],
      |  "kafka_config": {"topic": "tSync"},
      |  "table_config": {
      |    "table_type": "MERGE_ON_READ", "base_path": "$base",
      |    "table_name": "lane_sync", "record_key_field": "id",
      |    "precombine_field": "ts"
      |  },
      |  "catalog_sync_config": {"sync_db": "streamdb"}
      |}""".stripMargin)
    b.append(0, """{"id":1,"v":"a","ts":1,"op":"I"}""")
    val ing = new ConfigDrivenIngest(spark, () => Seq(file),
      _ => b.puller, valueCol = "v")
    try {
      assert(ing.drainAll() === 1)
      // MOR lane: _rt and _ro registered in the engine catalog
      assert(spark.table("graft.streamdb.lane_sync_rt").count() === 1)
      assert(spark.table("graft.streamdb.lane_sync_ro").count() === 1)
    } finally ing.close()
    GraftTable.drop(base)
  }

  test("timestamp-derived partitions: epoch_millis to dashed-day path") {
    // the fork's TimestampBasedAvroKeyGenerator posture: EPOCHMILLISECONDS
    // input, yyyy-MM-dd partition output (HoodieFlinkStreamerWithApollo)
    val dir = tmp()
    val b = new FakeBroker
    val base = s"$dir/tableTs"
    val file = dir.resolve("ts.json")
    write(file, s"""{
      |  "fields": [{"name":"id","type":"bigint"},
      |             {"name":"v","type":"varchar(32)"},
      |             {"name":"ts","type":"bigint"}],
      |  "kafka_config": {"topic": "tTs"},
      |  "table_config": {
      |    "table_type": "cow", "base_path": "$base",
      |    "table_name": "ts_t", "record_key_field": "id",
      |    "precombine_field": "ts", "partition_field": "ts",
      |    "partition_timestamp_type": "epoch_millis"
      |  }
      |}""".stripMargin)
    // 2024-01-01T12:00:00Z and 2024-01-02T01:00:00Z in epoch millis
    b.append(0,
      """{"id":1,"v":"a","ts":1704110400000,"op":"I"}""",
      """{"id":2,"v":"b","ts":1704157200000,"op":"I"}""")
    val ing = new ConfigDrivenIngest(spark, () => Seq(file),
      _ => b.puller, valueCol = "v")
    try {
      assert(ing.drainAll() === 1)
      assert(Files.isDirectory(Paths.get(base, "dt=2024-01-01")))
      assert(Files.isDirectory(Paths.get(base, "dt=2024-01-02")))
      assert(GraftTable.load(spark, base).snapshot().count() === 2)
    } finally ing.close()
    GraftTable.drop(base)
  }

  test("unknown op and malformed envelope fail the batch, replayable") {
    val dir = tmp()
    val b = new FakeBroker
    val base = s"$dir/tableX"
    val file = dir.resolve("x.json")
    write(file, cfg("tX", base, "strict_x"))
    b.append(0, """{"id":1,"v":"a","ts":1,"op":"Q"}""")
    val ing = new ConfigDrivenIngest(spark, () => Seq(file),
      _ => b.puller, valueCol = "v")
    try {
      intercept[Exception](ing.sweep())
      // nothing committed: the offset map never advanced
      assert(GraftTable.load(spark, base).snapshot().count() === 0)
      // fix arrives upstream as a compacted rewrite of the record
      b.truncate(0, 1L)
      b.append(0, """{"id":1,"v":"a","ts":1,"op":"I"}""")
      assert(ing.drainAll() === 1)
      assert(GraftTable.load(spark, base).snapshot().count() === 1)
    } finally ing.close()
    GraftTable.drop(base)
  }

  test("mixed source kinds in one config dir: kafka + dfs + jdbc + cloud_events, exactly-once each") {
    import spark.implicits._
    val dir = tmp()
    val fieldsJson =
      """{"name":"id","type":"bigint"},{"name":"v","type":"varchar(32)"},{"name":"ts","type":"bigint"}"""
    def tcJson(base: String, name: String) =
      s""""table_config": {"table_type": "COPY_ON_WRITE", "base_path": "$base",
         |  "table_name": "$name", "record_key_field": "id",
         |  "precombine_field": "ts"}""".stripMargin

    // kafka lane
    val broker = new FakeBroker
    broker.append(0, """{"id":1,"v":"k1","ts":1,"op":"I"}""")
    write(dir.resolve("k.json"), cfg("tK", s"$dir/tk", "mix_k"))

    // dfs lane: parquet inbox
    val inbox = Files.createTempDirectory("graft_mix_inbox_")
    Seq((10L, "d1", 1L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$inbox/f1.parquet")
    write(dir.resolve("d.json"),
      s"""{"fields": [$fieldsJson], "source_type": "dfs",
         |  "dfs_config": {"dir": "$inbox", "format": "parquet"},
         |  ${tcJson(s"$dir/td", "mix_d")}}""".stripMargin)

    // jdbc lane: derby in-memory
    val url = "jdbc:derby:memory:graftcfgmix;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE JSRC (id BIGINT, v VARCHAR(32), ts BIGINT)")
    conn.createStatement().execute("INSERT INTO JSRC VALUES (20, 'j1', 1)")
    write(dir.resolve("j.json"),
      s"""{"fields": [$fieldsJson], "source_type": "jdbc",
         |  "jdbc_config": {"url": "$url", "table": "JSRC",
         |    "checkpoint_column": "id",
         |    "options": {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}},
         |  ${tcJson(s"$dir/tj", "mix_j")}}""".stripMargin)

    // cloud-events lane: events table + objects on "storage"
    val objRoot = Files.createTempDirectory("graft_mix_obj_")
    Seq((30L, "c1", 1L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$objRoot/bkt/data/o1.parquet")
    val eventsDir = Files.createTempDirectory("graft_mix_ev_").toString
    val events = GraftTable.create(spark, eventsDir, TableConfig("mix_ev",
      CopyOnWrite, keyFields = Seq("bucket", "key")))
    events.bulkInsert(Seq(("bkt", "data/o1.parquet", 1L))
      .toDF("bucket", "key", "size"))
    write(dir.resolve("c.json"),
      s"""{"fields": [$fieldsJson], "source_type": "cloud_events",
         |  "cloud_events_config": {"events_table": "$eventsDir",
         |    "fs_prefix": "$objRoot/", "key_prefix": "data/"},
         |  ${tcJson(s"$dir/tc", "mix_c")}}""".stripMargin)

    def files() = Fs.list(dir).filter(_.toString.endsWith(".json"))
    def snap(base: String) = GraftTable.load(spark, base).snapshot()
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val ing = new ConfigDrivenIngest(spark, () => files(),
      pullerFor = _ => broker.puller, valueCol = "v")
    try {
      assert(ing.drainAll() === 4, ing.laneErrors.toString)
      assert(ing.laneErrors.isEmpty, ing.laneErrors.toString)
      assert(snap(s"$dir/tk") === Set((1L, "k1")))
      assert(snap(s"$dir/td") === Set((10L, "d1")))
      assert(snap(s"$dir/tj") === Set((20L, "j1")))
      assert(snap(s"$dir/tc") === Set((30L, "c1")))
    } finally ing.close()

    // restart from a FRESH instance: each lane resumes from its own
    // namespaced checkpoint (kafka:/dfs:/jdbc:/incr:) — no replays, and
    // new arrivals on every kind land exactly once
    broker.append(0, """{"id":2,"v":"k2","ts":2,"op":"I"}""")
    Seq((11L, "d2", 2L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$inbox/f2.parquet")
    conn.createStatement().execute("INSERT INTO JSRC VALUES (21, 'j2', 2)")
    Seq((31L, "c2", 2L)).toDF("id", "v", "ts")
      .coalesce(1).write.parquet(s"$objRoot/bkt/data/o2.parquet")
    events.upsert(Seq(("bkt", "data/o2.parquet", 1L))
      .toDF("bucket", "key", "size"))
    val ing2 = new ConfigDrivenIngest(spark, () => files(),
      pullerFor = _ => broker.puller, valueCol = "v")
    try {
      assert(ing2.drainAll() === 4, ing2.laneErrors.toString)
      assert(snap(s"$dir/tk") === Set((1L, "k1"), (2L, "k2")))
      assert(snap(s"$dir/td") === Set((10L, "d1"), (11L, "d2")))
      assert(snap(s"$dir/tj") === Set((20L, "j1"), (21L, "j2")))
      assert(snap(s"$dir/tc") === Set((30L, "c1"), (31L, "c2")))
      // caught up: nothing replays
      assert(ing2.drainAll() === 0)
    } finally ing2.close()
    conn.close()
    Seq(s"$dir/tk", s"$dir/td", s"$dir/tj", s"$dir/tc", eventsDir)
      .foreach(GraftTable.drop)
  }
}
