package graft.table

import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/**
 * Stable per-column ids for schema-on-read evolution (ref: the reference's
 * `hoodie.schema.on.read.enable` internal schema with field ids,
 * hudi-common/.../internal/schema/InternalSchema.java + HoodieCommonConfig
 * .java:34): every committed data column carries a table-unique id in its
 * StructField metadata, so RENAME COLUMN is a schema-only commit — files
 * written under the old name resolve by id on read — and a column DROPPED
 * then re-ADDED under the same name gets a fresh id, so old values do not
 * resurrect.
 *
 * Ids ride inside the committed schemaJson (StructType.json serializes
 * field metadata), costing nothing on the data path. Epochs written before
 * ids existed fall back to by-name resolution.
 */
object ColIds {
  val MetaKey = "graft.col.id"

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(MetaKey)) Some(f.metadata.getLong(MetaKey)) else None

  def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putLong(MetaKey, id).build())

  /** Strip ids (user-facing schemas: catalog listings, SHOW CREATE). */
  def strip(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(MetaKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata).remove(MetaKey)
        f.copy(metadata = mb.build())
      }
    })

  /** Give every id-less field a fresh id, continuing past the max in use.
    * `floor` must be the max id across ALL committed epochs, not just the
    * live schema — a dropped column retires its id forever, else a
    * re-added namesake would resurrect old files' values by id. */
  def assign(schema: StructType, floor: Long = 0L): StructType = {
    var next = schema.fields.flatMap(idOf).foldLeft(floor)(math.max)
    StructType(schema.fields.map { f =>
      idOf(f) match {
        case Some(_) => f
        case None => next += 1; withId(f, next)
      }
    })
  }
}
