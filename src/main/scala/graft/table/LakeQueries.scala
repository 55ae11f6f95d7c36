package graft.table

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Oracle-checked queries exercising the Graft lakehouse engine end-to-end:
 * each one physically writes a Graft table to a scratch dir, runs write
 * operations + table services against it, and reads it back. The DuckDB
 * oracle states the same semantics in SQL over the raw input tables, so the
 * whole engine (timeline, staged writes, tagging, merge, compaction) is
 * inside the checked path. SURVEY.md §2.1.
 *
 * All value transforms are exact in IEEE double arithmetic (x*2, x+100) so
 * results are bit-identical to the oracle with no rounding tolerance needed.
 */
object LakeQueries {
  type Q = (SparkSession, String) => DataFrame

  private def scratch(name: String, sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_lake/${name}_$safe"
    GraftTable.drop(p)
    p
  }

  private def ordersCfg(tableType: TableType, pc: String = "o_totalprice") =
    TableConfig("orders_lake", tableType, keyFields = Seq("o_orderkey"),
      precombineField = Some(pc),
      partitioning = PartitionByColumns(Seq("o_orderstatus")),
      targetFileSizeRows = 50000)

  private val outCols: Seq[org.apache.spark.sql.Column] = Seq(
    col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
    col("o_totalprice"),
    date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
    col("o_orderpriority"))

  private def out(df: DataFrame): DataFrame =
    df.select(outCols: _*).orderBy(col("o_orderkey"))

  private val oracleCols =
    """o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority""".stripMargin

  /** COW upsert: updates double the price of every 10th order and add new
    * orders with shifted keys; snapshot must reflect both. */
  def lakeUpsertSnapshot(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("upsert", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("UPDATED"))
    val news = orders.filter(col("o_orderkey") % 100 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    t.upsert(updates.unionByName(news))
    out(t.snapshot())
  }

  /** COW delete by key. */
  def lakeDeleteKeys(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("delete", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.delete(orders.filter(col("o_orderkey") % 7 === 0))
    out(t.snapshot())
  }

  /** Partition-level insert_overwrite via replacecommit. */
  def lakeInsertOverwrite(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("overwrite", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    val replacement = orders.filter(col("o_orderstatus") === "P")
      .withColumn("o_totalprice", col("o_totalprice") + 100)
    t.insertOverwrite(replacement)
    out(t.snapshot())
  }

  /** Incremental pull: only records changed after the first commit. */
  def lakeIncremental(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("incr", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    val c1 = t.bulkInsert(orders.filter(col("o_orderkey") % 10 =!= 0))
    val news = orders.filter(col("o_orderkey") % 10 === 0)
    val updates = orders.filter(col("o_orderkey") % 20 === 5)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.upsert(news.unionByName(updates))
    out(t.incremental(c1))
  }

  /** Time travel: snapshot as of the first commit ignores later changes. */
  def lakeTimeTravel(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("tt", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    val c1 = t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", lit(0.0)))
    t.delete(orders.filter(col("o_orderkey") % 5 === 0))
    out(t.snapshot(asOf = Some(c1)))
  }

  /** MERGE INTO: matched+%5 delete, matched+%2 update, unmatched insert. */
  def lakeMergeInto(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("merge", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    val shifted = orders.filter(col("o_orderkey") % 50 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    val source = orders.unionByName(shifted)
      .withColumn("o_orderpriority", lit("MERGED"))
    t.mergeInto(source,
      updateCond = col("o_orderkey") % 2 === 0,
      deleteCond = col("o_orderkey") % 5 === 0,
      insertCond = lit(true))
    out(t.snapshot())
  }

  /** Metadata-table-served COLD listing end-to-end: sync → delete →
    * archive (manifest-backed checkpoint) → incremental sync → one
    * post-sync upsert (incl. resurrecting deleted keys), then a FRESH
    * table instance snapshot — its listing folds from the MDT parquet
    * segments plus one post-sync JSON meta, never the checkpoint
    * manifest (MdtListingSpec pins the mechanics; this pins the
    * answers). */
  def lakeMdtCold(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("mdtcold", d)
    val t = GraftTable.create(s, dir, ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("MDTUPD")))
    t.syncMetadataTable()
    t.delete(orders.filter(col("o_orderkey") % 7 === 0))
    t.archive(keepLast = 1)
    t.syncMetadataTable() // incremental: covers delete + checkpoint
    t.upsert(orders.filter(col("o_orderkey") % 100 === 3)
      .withColumn("o_orderpriority", lit("POST")))
    out(GraftTable.load(s, dir).snapshot())
  }

  /** Partition-pruned COLD read served through the metadata table: build +
    * update + sync + post-sync update, then a FRESH instance reads ONE
    * partition — slicesPruned folds only that partition's segment rows
    * (pushed-down columnar scan; LargeListingSpec pins the row counts,
    * this pins the answers against the oracle). */
  def lakeMdtPruned(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("mdtpruned", d)
    val t = GraftTable.create(s, dir, ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("PRUNEUPD")))
    t.syncMetadataTable()
    t.upsert(orders.filter(col("o_orderkey") % 100 === 3)
      .withColumn("o_orderpriority", lit("POST")))
    out(GraftTable.load(s, dir)
      .snapshot(partitionPred = _ == "o_orderstatus=F"))
  }

  /** MOR snapshot: two rounds of log updates, latest wins, no compaction. */
  def lakeMorSnapshot(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("mor", d), ordersCfg(MergeOnRead))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    t.upsert(orders.filter(col("o_orderkey") % 6 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 4))
    out(t.snapshot())
  }

  /** MOR skip_merge snapshot: base + log rows UNMERGED (ref:
    * hoodie.datasource.merge.type = realtime_skip_merge) — the result is
    * exactly `orders UNION ALL the logged update batch`, which the oracle
    * states literally. Updated keys appear twice by contract. */
  def lakeSkipMerge(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("skipmerge", d), ordersCfg(MergeOnRead))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("LOGGED")))
    // secondary sort key: duplicate o_orderkeys are the contract here, and
    // (key, priority) is unique (the log copy is always 'LOGGED')
    t.snapshotSkipMerge().select(outCols: _*)
      .orderBy(col("o_orderkey"), col("o_orderpriority"))
  }

  /** Incremental pull pruned by partition-path glob (ref:
    * hoodie.datasource.read.incr.path.glob): only the F-partition slice of
    * the update window is read. */
  def lakeIncrGlob(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("incrglob", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    val c1 = t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("CHANGED")))
    out(t.incremental(c1, pathGlob = Some("*=F")))
  }

  /** MOR read-optimized: log updates invisible until compaction. */
  def lakeReadOptimized(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("ro", d), ordersCfg(MergeOnRead))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", lit(0.0)))
    out(t.readOptimized())
  }

  /** Compaction folds logs into base files; read-optimized then sees the
    * merged data. */
  def lakeCompaction(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("compact", d), ordersCfg(MergeOnRead))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    t.delete(orders.filter(col("o_orderkey") % 11 === 0))
    t.compact()
    out(t.readOptimized())
  }

  /** Within-batch precombine: the row with the later ordering value wins. */
  def lakeDedupPrecombine(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("precombine", d),
      ordersCfg(CopyOnWrite, pc = "o_orderdate"))
    val orders = Tables.orders(s, d)
    val early = orders.withColumn("o_totalprice", lit(1.0))
    val late = orders
      .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      .withColumn("o_totalprice", lit(2.0))
    t.upsert(early.unionByName(late))
    out(t.snapshot())
  }

  /** CDC incremental: per changed key, op (i/u/d) + before/after images. */
  def lakeCdc(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("cdc", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    val c1 = t.bulkInsert(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val news = orders.filter(col("o_orderkey") % 100 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    t.upsert(updates.unionByName(news))
    t.delete(orders.filter(col("o_orderkey") % 13 === 0))
    t.incrementalCDC(c1)
      .select(
        coalesce(col("before.o_orderkey"), col("after.o_orderkey")).as("o_orderkey"),
        col("op"),
        col("before.o_totalprice").as("before_totalprice"),
        col("after.o_totalprice").as("after_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Partial-update upsert: NULL/omitted source columns keep the existing
    * value. Every 10th order gets priority PARTIAL; only every 20th also
    * carries a (doubled) price — the rest inherit theirs. The source omits
    * o_custkey/o_orderdate entirely, so updates inherit them and the
    * inserted (shifted) keys leave them NULL. */
  def lakePartialUpdate(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("partial", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    val narrow = orders.select(
      col("o_orderkey"), col("o_orderstatus"),
      when(col("o_orderkey") % 20 === 0, col("o_totalprice") * 2).as("o_totalprice"),
      col("o_orderpriority"))
    val updates = narrow.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderpriority", lit("PARTIAL"))
    val news = narrow.filter(col("o_orderkey") % 100 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderpriority", lit("NEW"))
    t.upsertPartial(updates.unionByName(news))
    out(t.snapshot())
  }

  /** Global-index upsert: keys are unique table-wide; an incoming record in
    * a NEW partition moves the key (old row tombstoned). Every 10th order
    * moves to status 'X' with doubled price; every 7th (not moved) updates
    * in place; shifted keys insert. */
  def lakeGlobalIndex(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("global", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    val moved = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val bumped = orders.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100)
    val news = orders.filter(col("o_orderkey") % 100 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    t.upsertGlobal(moved.unionByName(bumped).unionByName(news))
    out(t.snapshot())
  }

  /** DataSource round trip: table created and written twice through
    * `df.write.format("graft")` (bulk_insert then upsert), read back through
    * `spark.read.format("graft")` — the reference's front door
    * (ref: hudi-spark-common/.../DefaultSource.scala:45). The read takes the
    * native base-file fast path, so pushdown/stats pruning are also on the
    * checked path. */
  def lakeDsv2Snapshot(s: SparkSession, d: String): DataFrame = {
    val p = scratch("dsv2", d)
    val orders = Tables.orders(s, d)
    orders.write.format("graft")
      .option("graft.recordkey.field", "o_orderkey")
      .option("graft.precombine.field", "o_totalprice")
      .option("graft.partitionpath.field", "o_orderstatus")
      .option("graft.operation", "bulk_insert")
      .option("graft.target.file.rows", "50000")
      .mode("overwrite").save(p)
    val updates = orders.filter(col("o_orderkey") % 9 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
      .withColumn("o_orderpriority", lit("DSV2"))
    val news = orders.filter(col("o_orderkey") % 100 === 11)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    updates.unionByName(news).write.format("graft")
      .option("graft.operation", "upsert")
      .mode("append").save(p)
    out(s.read.format("graft").load(p))
  }

  /** SQL-string DML end to end: the table is created by literal
    * `CREATE TABLE ... AS SELECT` against the graft CATALOG, then mutated
    * by literal MERGE INTO (delete + partial update + conditional insert
    * clauses), UPDATE and DELETE statements, and read back with a SQL
    * SELECT — the reference's Spark-SQL command surface
    * (ref: hudi-spark/.../command/MergeIntoHoodieTableCommand.scala:62,
    * UpdateHoodieTableCommand.scala, DeleteHoodieTableCommand.scala). */
  def lakeSqlMerge(s: SparkSession, d: String): DataFrame = {
    val safe = d.replaceAll("[^A-Za-z0-9]", "_")
    val n = s"sqlmerge_$safe"
    val src = s"orders_src_$safe"
    val orders = Tables.orders(s, d)
    orders.createOrReplaceTempView(src)
    s.sql(s"DROP TABLE IF EXISTS graft.$n")
    s.sql(
      s"""CREATE TABLE graft.$n USING graft
         |PARTITIONED BY (o_orderstatus)
         |TBLPROPERTIES (
         |  'graft.recordkey.field' = 'o_orderkey',
         |  'graft.precombine.field' = 'o_totalprice',
         |  'graft.target.file.rows' = '50000')
         |AS SELECT * FROM $src""".stripMargin)
    val cols = orders.columns
    val shifted = cols.map {
      case "o_orderkey" => "o_orderkey + 10000000 AS o_orderkey"
      case "o_orderpriority" => "'SQLNEW' AS o_orderpriority"
      case c => c
    }.mkString(", ")
    s.sql(
      s"""MERGE INTO graft.$n t
         |USING (SELECT * FROM $src WHERE o_orderkey % 4 = 0
         |       UNION ALL
         |       SELECT $shifted FROM $src WHERE o_orderkey % 50 = 0) s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED AND s.o_orderkey % 20 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET
         |  o_totalprice = s.o_totalprice * 2, o_orderpriority = 'SQLMERGE'
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(s"UPDATE graft.$n SET o_orderpriority = 'URGENT!' WHERE o_orderkey % 10 = 1")
    s.sql(s"DELETE FROM graft.$n WHERE o_orderkey % 25 = 3")
    out(s.sql(s"SELECT * FROM graft.$n"))
  }

  /** Stored-procedure surface end to end: a MOR table is created and
    * mutated through literal SQL, then serviced through literal `CALL`
    * statements — run_compaction folds the update logs, run_clean drops
    * superseded file versions — and read back with a SELECT. The oracle
    * pins that the whole service pipeline preserves query results
    * (ref: hudi-spark/.../command/procedures/RunCompactionProcedure.scala,
    * RunCleanProcedure.scala — Spark 4 makes CALL a native statement, no
    * forked parser needed). */
  def lakeSqlCall(s: SparkSession, d: String): DataFrame = {
    val safe = d.replaceAll("[^A-Za-z0-9]", "_")
    val n = s"sqlcall_$safe"
    val src = s"orders_call_src_$safe"
    Tables.orders(s, d).createOrReplaceTempView(src)
    s.sql(s"DROP TABLE IF EXISTS graft.$n")
    s.sql(
      s"""CREATE TABLE graft.$n USING graft
         |PARTITIONED BY (o_orderstatus)
         |TBLPROPERTIES (
         |  'graft.recordkey.field' = 'o_orderkey',
         |  'graft.precombine.field' = 'o_totalprice',
         |  'graft.table.type' = 'mor',
         |  'graft.target.file.rows' = '50000')
         |AS SELECT * FROM $src""".stripMargin)
    s.sql(s"UPDATE graft.$n SET o_totalprice = o_totalprice * 2 WHERE o_orderkey % 3 = 0")
    s.sql(s"CALL graft.run_compaction(`table` => '$n')")
    s.sql(s"CALL graft.run_clean(`table` => '$n', `policy` => 'commits', `retain` => 1)")
    out(s.sql(s"SELECT * FROM graft.$n"))
  }

  /** Event-time merge payload (ref: DefaultHoodieRecordPayload): a
    * late-arriving STALE batch — ordering value below the stored row's —
    * is ignored; a fresh batch with a higher ordering value wins. Keys
    * divisible by 70 see both: the stale update loses, the fresh one
    * lands. */
  def lakeEventTime(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("eventtime", d),
      ordersCfg(CopyOnWrite).copy(payload = EventTimeOrdered))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 0.5)
      .withColumn("o_orderpriority", lit("STALE")))
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("FRESH")))
    out(t.snapshot())
  }

  /** insert.drop.duplicates: seed every 3rd order, then a drop-dup insert
    * of every 2nd order (transformed) — seeded keys must keep their
    * ORIGINAL rows, only genuinely new keys append. */
  def lakeInsertDedup(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("insdedup", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders.filter(col("o_orderkey") % 3 === 0))
    t.insertDropDuplicates(orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("DUP")))
    out(t.snapshot())
  }

  /** The full schema-evolution machinery in one checked path: a table is
    * created at format VERSION 1 (id-less epochs), loaded with data,
    * upgraded to v2 (ids re-adopted/minted), then RENAME COLUMN + ADD
    * COLUMN as schema-only commits, then upserted through the NEW schema.
    * v1-era files must serve the renamed column via the id bridge and
    * read null for the added one. */
  def lakeSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val path = scratch("schevo", d)
    val t = GraftTable.create(s, path,
      ordersCfg(CopyOnWrite).copy(schemaOnRead = true, version = 1))
    t.bulkInsert(Tables.orders(s, d))
    t.setFormatVersion(2)
    val t2 = GraftTable.load(s, path) // fresh config: version stamp
    val cur = t2.schemaAt(None).get
    t2.alterSchema(StructType(cur.fields.map(f =>
      if (f.name == "o_orderpriority") f.copy(name = "priority") else f)
      :+ StructField("note", StringType)))
    val t3 = GraftTable.load(s, path)
    t3.upsert(Tables.orders(s, d).filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumnRenamed("o_orderpriority", "priority")
      .withColumn("note", lit("noted")))
    t3.snapshot().select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
      col("priority"), col("note"))
      .orderBy(col("o_orderkey"))
  }

  /** AWS DMS Op-column ingest: a full load, an update wave, a delete wave —
    * replayed through applyDms in arrival order. */
  def lakeDms(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("dms", d), ordersCfg(CopyOnWrite))
    val orders = Tables.orders(s, d)
    DebeziumIngest.applyDms(t, orders.withColumn("Op", lit("")))
    DebeziumIngest.applyDms(t, orders.filter(col("o_orderkey") % 6 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100)
      .withColumn("Op", lit("U")))
    DebeziumIngest.applyDms(t, orders.filter(col("o_orderkey") % 9 === 0)
      .withColumn("Op", lit("D")))
    out(t.snapshot())
  }

  /** Scheduled compaction round trip: plan → interleaved upsert → execute.
    * The snapshot must reflect BOTH the folded pre-plan updates and the
    * interleaved post-plan ones — the async-services concurrency model
    * (plan pinning, origInstant layering, OCC tolerance) in one
    * oracle-checked query. */
  def lakeScheduledCompaction(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("schedcomp", d), ordersCfg(MergeOnRead))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("PREPLAN")))
    val plan = t.scheduleCompaction().get
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
      .withColumn("o_orderpriority", lit("POSTPLAN")))
    t.runCompaction(plan)
    out(t.snapshot())
  }

  /** Virtual keys: append-only COW with no materialized meta columns —
    * bulk insert + insert + partition delete, snapshot from meta-free
    * files with key/partition derived on read. */
  def lakeVirtualKeys(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("vkeys", d),
      ordersCfg(CopyOnWrite).copy(populateMetaFields = false))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders.filter(col("o_orderkey") % 2 === 0))
    t.insert(orders.filter(col("o_orderkey") % 2 =!= 0))
    t.deletePartitions(Seq("o_orderstatus=F"))
    out(t.snapshot())
  }

  /** ORC base files: the MOR write/merge/compact path entirely over ORC. */
  def lakeOrc(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("orc", d),
      ordersCfg(MergeOnRead).copy(baseFileFormat = "orc"))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit("ORCUP")))
    t.compact()
    t.delete(orders.filter(col("o_orderkey") % 13 === 0))
    out(t.snapshot())
  }

  /** drop.partition.columns end-to-end: partition values live only in the
    * directory path; the write→upsert→delete→snapshot cycle must restore
    * them (files carry no o_orderstatus — see DropPartitionColsSpec for
    * the physical-schema pin). */
  def lakeDropPartCols(s: SparkSession, d: String): DataFrame = {
    val t = GraftTable.create(s, scratch("dropcols", d),
      ordersCfg(CopyOnWrite).copy(dropPartitionColumns = true))
    val orders = Tables.orders(s, d)
    t.bulkInsert(orders)
    t.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2))
    t.delete(orders.filter(col("o_orderkey") % 13 === 0))
    out(t.snapshot())
  }

  /** Automatic inline compaction on the write door (writer-maintains-the-
    * table mode): the second deltacommit trips the max.delta.commits=2
    * trigger; the snapshot must read identically either side of it. */
  def lakeAutoCompact(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("autocompact", d)
    val orders = Tables.orders(s, d)
    def write(df: DataFrame, op: String): Unit =
      df.write.format("graft")
        .option("graft.recordkey.field", "o_orderkey")
        .option("graft.precombine.field", "o_totalprice")
        .option("graft.partitionpath.field", "o_orderstatus")
        .option("graft.table.type", "mor")
        .option("graft.operation", op)
        .option("graft.compact.inline", "true")
        .option("graft.compact.inline.max.delta.commits", "2")
        .mode("append").save(dir)
    write(orders, "bulk_insert")
    write(orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderpriority", lit("AUTO1")), "upsert")
    write(orders.filter(col("o_orderkey") % 11 === 0)
      .withColumn("o_orderpriority", lit("AUTO2")), "upsert")
    out(s.read.format("graft").load(dir))
  }

  val all: Map[String, Q] = Map(
    "lake_drop_part_cols" -> (lakeDropPartCols _),
    "lake_auto_compact" -> (lakeAutoCompact _),
    "lake_scheduled_compaction" -> (lakeScheduledCompaction _),
    "lake_virtual_keys" -> (lakeVirtualKeys _),
    "lake_orc" -> (lakeOrc _),
    "lake_insert_dedup" -> (lakeInsertDedup _),
    "lake_schema_evolution" -> (lakeSchemaEvolution _),
    "lake_dms" -> (lakeDms _),
    "lake_event_time" -> (lakeEventTime _),
    "lake_sql_call" -> (lakeSqlCall _),
    "lake_sql_merge" -> (lakeSqlMerge _),
    "lake_dsv2_snapshot" -> (lakeDsv2Snapshot _),
    "lake_cdc" -> (lakeCdc _),
    "lake_partial_update" -> (lakePartialUpdate _),
    "lake_global_index" -> (lakeGlobalIndex _),
    "lake_upsert_snapshot" -> (lakeUpsertSnapshot _),
    "lake_delete_keys" -> (lakeDeleteKeys _),
    "lake_insert_overwrite" -> (lakeInsertOverwrite _),
    "lake_incremental" -> (lakeIncremental _),
    "lake_time_travel" -> (lakeTimeTravel _),
    "lake_mdt_cold" -> (lakeMdtCold _),
    "lake_mdt_pruned" -> (lakeMdtPruned _),
    "lake_merge_into" -> (lakeMergeInto _),
    "lake_mor_snapshot" -> (lakeMorSnapshot _),
    "lake_skip_merge" -> (lakeSkipMerge _),
    "lake_incr_glob" -> (lakeIncrGlob _),
    "lake_read_optimized" -> (lakeReadOptimized _),
    "lake_compaction" -> (lakeCompaction _),
    "lake_dedup_precombine" -> (lakeDedupPrecombine _)
  )

  val oracles: Map[String, String] = Map(
    "lake_scheduled_compaction" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice * 3 AS o_totalprice,
         |         o_orderdate, 'POSTPLAN' AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
         |         o_orderdate, 'PREPLAN'
         |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 5 <> 0)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_drop_part_cols" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0)
         |WHERE o_orderkey % 13 <> 0
         |ORDER BY o_orderkey""".stripMargin,
    "lake_auto_compact" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         |    CASE WHEN o_orderkey % 11 = 0 THEN 'AUTO2'
         |         WHEN o_orderkey % 7 = 0 THEN 'AUTO1'
         |         ELSE o_orderpriority END AS o_orderpriority
         |  FROM orders)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_virtual_keys" ->
      s"""SELECT $oracleCols FROM orders
         |WHERE o_orderstatus <> 'F' ORDER BY o_orderkey""".stripMargin,
    "lake_orc" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_totalprice * 2 AS o_totalprice,
         |         o_orderdate, 'ORCUP' AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0)
         |WHERE o_orderkey % 13 <> 0
         |ORDER BY o_orderkey""".stripMargin,
    "lake_insert_dedup" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 3 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
         |         o_orderdate, 'DUP' AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_orderpriority AS priority,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'noted' END AS note
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_dms" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice + 100
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 9 <> 0)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_event_time" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate,
         |         CASE WHEN o_orderkey % 10 = 0 THEN 'FRESH'
         |              ELSE o_orderpriority END AS o_orderpriority
         |  FROM orders)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_sql_call" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_sql_merge" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate,
         |         CASE WHEN o_orderkey % 10 = 1 THEN 'URGENT!'
         |              WHEN o_orderkey % 4 = 0 THEN 'SQLMERGE'
         |              ELSE o_orderpriority END AS o_orderpriority
         |  FROM orders
         |  WHERE o_orderkey % 20 <> 0 AND o_orderkey % 25 <> 3
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
         |         o_totalprice, o_orderdate, 'SQLNEW'
         |  FROM orders WHERE o_orderkey % 50 = 0)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_dsv2_snapshot" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 9 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 3,
         |         o_orderdate, 'DSV2'
         |  FROM orders WHERE o_orderkey % 9 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 100 = 11)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_partial_update" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END,
         |         o_orderdate, 'PARTIAL'
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  -- inserted keys inherit nothing: price is the source's (always
         |  -- NULL here, since k%100=7 implies k%20<>0), custkey/date omitted
         |  SELECT o_orderkey + 10000000, CAST(NULL AS BIGINT), o_orderstatus,
         |         CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP), 'NEW'
         |  FROM orders WHERE o_orderkey % 100 = 7)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_global_index" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, 'X', o_totalprice * 2,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 100,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 100 = 3)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_cdc" ->
      """SELECT o_orderkey, op, before_totalprice, after_totalprice FROM (
        |  SELECT o_orderkey, 'u' AS op, o_totalprice AS before_totalprice,
        |         o_totalprice * 2 AS after_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'i', CAST(NULL AS DOUBLE), o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 7
        |  UNION ALL
        |  SELECT o_orderkey, 'd', o_totalprice, CAST(NULL AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "lake_upsert_snapshot" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
         |         o_orderdate, 'UPDATED'
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 100 = 7)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_delete_keys" ->
      s"""SELECT $oracleCols FROM orders
         |WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey""".stripMargin,
    "lake_insert_overwrite" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus <> 'P'
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 100,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'P')
         |ORDER BY o_orderkey""".stripMargin,
    "lake_incremental" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 20 = 5)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_time_travel" ->
      s"""SELECT $oracleCols FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_mdt_cold" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, 'POST' AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 100 = 3
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate,
         |         CASE WHEN o_orderkey % 10 = 0 THEN 'MDTUPD'
         |              ELSE o_orderpriority END AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 100 <> 3
         |) ORDER BY o_orderkey""".stripMargin,
    "lake_mdt_pruned" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate,
         |         CASE WHEN o_orderkey % 100 = 3 THEN 'POST'
         |              WHEN o_orderkey % 10 = 0 THEN 'PRUNEUPD'
         |              ELSE o_orderpriority END AS o_orderpriority
         |  FROM orders WHERE o_orderstatus = 'F'
         |) ORDER BY o_orderkey""".stripMargin,
    "lake_merge_into" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate,
         |         CASE WHEN o_orderkey % 2 = 0 THEN 'MERGED'
         |              ELSE o_orderpriority END AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 5 <> 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, 'MERGED'
         |  FROM orders WHERE o_orderkey % 50 = 0)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_mor_snapshot" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 4
         |              WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_skip_merge" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
         |         o_orderdate, 'LOGGED' AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 3 = 0)
         |ORDER BY o_orderkey, o_orderpriority""".stripMargin,
    "lake_incr_glob" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2
         |           AS o_totalprice,
         |         o_orderdate, 'CHANGED' AS o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderstatus = 'F')
         |ORDER BY o_orderkey""".stripMargin,
    "lake_read_optimized" ->
      s"""SELECT $oracleCols FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_compaction" ->
      s"""SELECT $oracleCols FROM (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 11 <> 0)
         |ORDER BY o_orderkey""".stripMargin,
    "lake_dedup_precombine" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, 2.0 AS o_totalprice,
         |  strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d') AS orderdate,
         |  o_orderpriority
         |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
