package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Ingest transformer chain (ref: hudi-utilities transform/
 * ChainedTransformer.java:30 — compose N transforms in order;
 * SqlQueryBasedTransformer.java / SqlFileBasedTransformer.java — SQL over
 * the micro-batch registered as a temp view; FlatteningTransformer.java —
 * nested structs to underscore-joined top-level columns).
 *
 * A transform is just `DataFrame => DataFrame`, so anything composes; the
 * factories here cover the reference's stock set. Every transform stays a
 * LAZY plan over the batch — chaining N transforms costs zero extra passes,
 * Catalyst collapses the whole chain into the write's single job.
 */
object Transformers {

  type Transform = DataFrame => DataFrame

  /** SQL transform: `<SRC>` in the query names the incoming micro-batch
    * (ref: SqlQueryBasedTransformer's `<SRC>` convention). */
  def sql(query: String): Transform = {
    require(query.contains("<SRC>"),
      "SQL transform must reference the micro-batch as <SRC>")
    batch => {
      val view = s"graft_tf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val ss = batch.sparkSession
      batch.createOrReplaceTempView(view)
      try ss.sql(query.replace("<SRC>", view))
      finally ss.catalog.dropTempView(view)
    }
  }

  /** SQL transform read from a file (ref: SqlFileBasedTransformer — the
    * deltastreamer convention of shipping transforms as .sql files next to
    * the job config). The file is read at CONSTRUCTION: a transform that
    * silently changed mid-stream would make restart-resume non-reproducible. */
  def sqlFile(path: String): Transform =
    sql(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Flatten nested struct columns to top level, underscore-joined:
    * `a.b.c` → `a_b_c` (ref: FlatteningTransformer.flattenSchema).
    * Arrays/maps stay opaque (same as the reference). */
  def flatten: Transform = df => {
    def leaves(prefix: String, f: StructField, path: Column): Seq[(String, Column)] =
      f.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap(c =>
            leaves(prefix + f.name + "_", c, path.getField(c.name)))
        case _ => Seq((prefix + f.name, path))
      }
    val flat = df.schema.fields.toSeq.flatMap(f =>
      leaves("", f, col(s"`${f.name}`")))
    // a struct `a.b` and a top-level `a_b` both flatten to `a_b`; Spark's
    // eventual duplicate-column error would not name the collision, so
    // detect it here with both source paths in the message
    flat.groupBy(_._1).collect { case (n, cs) if cs.size > 1 => n } match {
      case dups if dups.nonEmpty => throw new IllegalArgumentException(
        s"flatten would produce duplicate column name(s) " +
          s"${dups.toSeq.sorted.mkString(", ")} — rename one of the " +
          "colliding source columns (e.g. with a sql() transform) before " +
          "flattening")
      case _ =>
    }
    df.select(flat.map { case (n, c) => c.as(n) }: _*)
  }

  /** Conform each batch to a DECLARED target schema (ref: hudi-utilities
    * schema/FilebasedSchemaProvider.java — the deltastreamer target-schema
    * contract): declared columns selected in order and cast to their
    * declared types; extra source columns dropped; missing ones land null
    * (or fail fast with `failOnMissing`, for feeds where absence means a
    * broken upstream). One projection — codegen, no extra pass. */
  def conformTo(schema: StructType, failOnMissing: Boolean = false): Transform = df => {
    val have = df.columns.toSet
    val cols = schema.fields.toSeq.map { f =>
      if (have(f.name)) col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else if (failOnMissing) throw new IllegalArgumentException(
        s"batch lacks declared column '${f.name}'")
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  /** [[conformTo]] with the schema read from a file at construction —
    * Spark DDL (`id BIGINT, v STRING`) or a StructType JSON (ref:
    * FilebasedSchemaProvider's source/target schema files). */
  def conformToFile(path: String, failOnMissing: Boolean = false): Transform = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim
    val schema =
      if (text.startsWith("{"))
        org.apache.spark.sql.types.DataType.fromJson(text).asInstanceOf[StructType]
      else StructType.fromDDL(text)
    conformTo(schema, failOnMissing)
  }

  /** Drop columns from every batch (ref: schema/
    * DropColumnSchemaPostProcessor.java — shedding sensitive or oversized
    * upstream fields before they reach the table). */
  def dropColumns(cols: String*): Transform = df => df.drop(cols: _*)

  /** Compose transforms left-to-right (ref: ChainedTransformer — the
    * output of each feeds the next). */
  def chain(ts: Transform*): Transform =
    ts.foldLeft(identity[DataFrame] _)(_ andThen _)
}
