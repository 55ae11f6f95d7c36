package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Debezium-shaped CDC ingest (ref: hudi-common/src/main/java/org/apache/
 * hudi/common/model/debezium/MySqlDebeziumAvroPayload.java,
 * PostgresDebeziumAvroPayload.java, AbstractDebeziumAvroPayload.java): map
 * a change stream of `(op, before, after, <ordering>)` envelopes onto
 * graft upserts/deletes, ordered by the source's change position (Postgres
 * LSN / MySQL binlog pos) so OUT-OF-ORDER application converges to the
 * source state.
 *
 * The ordering contract composes with [[EventTimeOrdered]] exactly as the
 * reference's payloads do (`shouldPickCurrentRecord` compares LSN/pos):
 * the target table must use `payload = EventTimeOrdered` with the ordering
 * column as its precombine field, then
 *  - within a batch, the highest-position change per key wins (precombine);
 *  - across commits, a stored row survives any change with a LOWER
 *    position — stale deletes cannot kill newer rows, and a
 *    delete-then-reinsert replayed in any order lands on the reinsert.
 *
 * Row mapping (ref AbstractDebeziumAvroPayload.handleDeleteOperation):
 * `op` in (c, u, r) take the `after` image as an upsert; `op` = d takes
 * the `before` image as a delete; Kafka-compaction tombstones (both
 * images null) are dropped; any other op fails the batch. The ordering
 * column rides into the written row, so it is both the precombine field
 * and a queryable audit column.
 *
 * Out-of-order robustness around DELETES needs a MergeOnRead table: MOR
 * logs keep tombstones with their position, so a change older than the
 * tombstone still loses after the delete has been applied. COW base files
 * hold no tombstones (same as the reference after compaction), so COW
 * converges only for streams ordered per key at batch granularity.
 * Deletes for keys the table has never seen are dropped, as in the
 * reference.
 */
object DebeziumIngest {

  /** Apply one batch of Debezium envelopes to `t`; returns the commit
    * instant (None when the batch held only compaction tombstones).
    *
    * @param orderCol top-level position column (Postgres `lsn`, MySQL a
    *                 file/pos-derived long) — must equal the table's
    *                 precombine field */
  def apply(t: GraftTable, changes: DataFrame, opCol: String = "op",
      beforeCol: String = "before", afterCol: String = "after",
      orderCol: String = "lsn"): Option[String] = {
    requireDebeziumTable(t, orderCol)
    val live = project(changes, opCol, beforeCol, afterCol, orderCol)
    if (live.isEmpty) return None
    Some(t.writeBatch(live, "upsert"))
  }

  /** The ordering/payload contract [[apply]] enforces, standalone so a
    * composed pipeline (e.g. [[project]] as a [[graft.streaming
    * .ContinuousIngest]] transform) can assert it once at wiring time. */
  def requireDebeziumTable(t: GraftTable, orderCol: String = "lsn"): Unit = {
    require(t.config.payload == EventTimeOrdered,
      "Debezium ingest needs payload = event_time: change position must " +
        "out-rank arrival order, or replays would resurrect stale states")
    require(t.config.precombineField.contains(orderCol),
      s"Debezium ingest orders by '$orderCol', but the table precombines " +
        s"on ${t.config.precombineField.getOrElse("<none>")} — they must match")
  }

  /** The envelope → write-batch projection of [[apply]] as a standalone
    * lazy transform — this is how the reference's DebeziumSource is
    * actually BUILT (hudi-utilities sources/debezium/DebeziumSource.java:
    * a Kafka source subclass whose processDataset applies exactly this
    * mapping); composing it over [[graft.streaming.KafkaLikeSource]] via
    * a ContinuousIngest transform re-creates Debezium-over-Kafka with
    * exactly-once offset checkpoints. Returns rows shaped for
    * `writeBatch(_, "upsert")`: image columns + the ordering column + the
    * tombstone flag; Kafka-compaction tombstones (both images null) are
    * dropped; an unknown op fails the batch from INSIDE the kept column,
    * so column pruning cannot optimize the guard away. */
  def project(changes: DataFrame, opCol: String = "op",
      beforeCol: String = "before", afterCol: String = "after",
      orderCol: String = "lsn"): DataFrame = {
    val isDel = col(opCol) === "d"
    val del = when(col(opCol).isin("c", "u", "r"), lit(false))
      .when(isDel, lit(true))
      .otherwise(raise_error(concat(lit("unknown Debezium op '"),
        col(opCol), lit("'"))).cast("boolean"))
    changes
      // compaction tombstones carry no state at all — drop, don't fail
      .filter(col(beforeCol).isNotNull || col(afterCol).isNotNull)
      .withColumn("_g_img", when(isDel, col(beforeCol)).otherwise(col(afterCol)))
      .select(
        (col("_g_img.*") +: Seq(col(orderCol), del.as(GraftTable.DELETED))): _*)
  }

  /** AWS DMS-shaped CDC ingest (ref: hudi-common/src/main/java/org/apache/
    * hudi/common/model/AWSDmsAvroPayload.java): DMS emits FULL row images
    * with an added `Op` column — `I`/`U` (or empty for initial-full-load
    * rows) upsert, `D` deletes; there is no before/after envelope. The `Op`
    * column is consumed here and does not land in the table.
    *
    * Ordering follows the table's own payload, as the reference does
    * (AWSDmsAvroPayload extends OverwriteWithLatest): arrival order by
    * default, or event order when the table precombines on a DMS
    * timestamp column with `payload = event_time`. */
  def applyDms(t: GraftTable, changes: DataFrame,
      opCol: String = "Op"): Option[String] = {
    if (changes.isEmpty) return None
    Some(t.writeBatch(projectDms(changes, opCol), "upsert"))
  }

  /** The DMS `Op`-column → write-batch projection of [[applyDms]] as a
    * standalone lazy transform (same composition seam as [[project]] /
    * [[projectMaxwell]] — DMS streams commonly land via Kafka too). */
  def projectDms(changes: DataFrame, opCol: String = "Op"): DataFrame = {
    require(changes.columns.contains(opCol),
      s"DMS ingest expects an '$opCol' column on every row")
    val op = upper(coalesce(col(opCol), lit("")))
    // unknown-op guard inside the kept tombstone column (same idiom as
    // apply() above) so pruning cannot optimize the check away
    val del = when(op.isin("I", "U", ""), lit(false))
      .when(op === "D", lit(true))
      .otherwise(raise_error(concat(lit("unknown DMS op '"),
        col(opCol), lit("'"))).cast("boolean"))
    val rest = changes.columns.filterNot(_ == opCol).map(col).toSeq
    changes.select(rest :+ del.as(GraftTable.DELETED): _*)
  }

  /** Maxwell-shaped CDC ingest (ref: hudi-utilities sources/processor/
    * maxwell/MaxwellJsonKafkaSourcePostProcessor.java): each record is one
    * Maxwell JSON envelope `{database, table, type, ts, data}` with a FULL
    * row image under `data`. Rows are filtered to the target
    * database/table by regex, DDL rows (any type outside
    * insert/update/delete) and other tables are silently ignored — the
    * reference's multi-table-topic posture.
    *
    * Maxwell does NOT touch the row's update-time column on a delete, so a
    * delete's precombine value is stale; like the reference, the envelope
    * `ts` (epoch seconds) overrides the precombine column on delete rows,
    * rendered per `precombineType` (ref PreCombineFieldType):
    * `date_string` (with `precombineFormat`, session-timezone rendering),
    * `epoch_millis`, `unix_timestamp`, or `non_timestamp` (no override).
    * With `payload = event_time` on the table, that makes replayed stale
    * deletes lose to newer images exactly as in [[apply]].
    *
    * Everything is one Catalyst projection over the JSON column — envelope
    * fields via get_json_object, the image via from_json against the
    * caller's `dataSchema` (the reference gets this from its schema
    * provider) — so the parse runs codegen'd inside the write's own job. */
  def applyMaxwell(t: GraftTable, records: DataFrame, dataSchema: org.apache.spark.sql.types.StructType,
      tableRegex: String, databaseRegex: Option[String] = None,
      precombineType: String = "date_string",
      precombineFormat: String = "yyyy-MM-dd HH:mm:ss",
      jsonCol: String = "value"): Option[String] = {
    val batch = projectMaxwell(records, dataSchema, tableRegex,
      databaseRegex, t.config.precombineField, precombineType,
      precombineFormat, jsonCol)
    if (batch.isEmpty) return None
    Some(t.writeBatch(batch, "upsert"))
  }

  /** The Maxwell envelope → write-batch projection of [[applyMaxwell]] as
    * a standalone lazy transform (ref: hudi-utilities sources/processor/
    * maxwell/MaxwellJsonKafkaSourcePostProcessor.java is literally a
    * KAFKA source post-processor): compose over
    * [[graft.streaming.KafkaLikeSource]] via a ContinuousIngest transform
    * for Maxwell-over-Kafka with exactly-once offset checkpoints.
    * `precombineField` is passed explicitly (applyMaxwell reads it off
    * the table) so the transform can be wired before any table exists. */
  def projectMaxwell(records: DataFrame,
      dataSchema: org.apache.spark.sql.types.StructType,
      tableRegex: String, databaseRegex: Option[String] = None,
      precombineField: Option[String] = None,
      precombineType: String = "date_string",
      precombineFormat: String = "yyyy-MM-dd HH:mm:ss",
      jsonCol: String = "value"): DataFrame = {
    require(Set("non_timestamp", "date_string", "epoch_millis",
      "unix_timestamp")(precombineType),
      s"unknown precombine field type '$precombineType' (non_timestamp | " +
        "date_string | epoch_millis | unix_timestamp)")
    val env = records.select(
      get_json_object(col(jsonCol), "$.database").as("_db"),
      get_json_object(col(jsonCol), "$.table").as("_tbl"),
      get_json_object(col(jsonCol), "$.type").as("_type"),
      get_json_object(col(jsonCol), "$.ts").cast("long").as("_ts"),
      get_json_object(col(jsonCol), "$.data").as("_data"))
    val targeted = env
      .filter(databaseRegex.map(r => col("_db").rlike(r)).getOrElse(lit(true)))
      .filter(col("_tbl").rlike(tableRegex))
      .filter(col("_type").isin("insert", "update", "delete"))
    val parsed = targeted.withColumn("_row", from_json(col("_data"), dataSchema))
    val isDel = col("_type") === "delete"
    val overridden = (precombineType, precombineField) match {
      case ("non_timestamp", _) | (_, None) => parsed
      case (tpe, Some(p)) =>
        require(dataSchema.fieldNames.contains(p),
          s"precombine column '$p' missing from the Maxwell data schema")
        val tsVal = tpe match {
          case "date_string" =>
            date_format(timestamp_seconds(col("_ts")), precombineFormat)
          case "epoch_millis" => col("_ts") * 1000L
          case "unix_timestamp" => col("_ts")
        }
        parsed.withColumn("_row", when(isDel,
          col("_row").withField(p, tsVal.cast(dataSchema(p).dataType)))
          .otherwise(col("_row")))
    }
    overridden.select(col("_row.*"), isDel.as(GraftTable.DELETED))
  }
}
