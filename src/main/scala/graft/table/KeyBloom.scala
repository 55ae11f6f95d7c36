package graft.table

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Per-base-file bloom filters over record keys — the reference's bloom
 * index / BLOOM_FILTERS metadata partition (ref: hudi-common/src/main/java/
 * org/apache/hudi/metadata/HoodieTableMetadataUtil.java, hudi-client-common
 * .../index/bloom/HoodieBloomIndex.java).
 *
 * Each base file gets a `<path>.bloom` sidecar, built by one distributed
 * pass over the freshly-staged files' key column ([[KeyBloomAgg]] gives
 * map-side partial aggregation: the shuffle carries per-file filters, not
 * keys) with executors writing the sidecars.
 * Key-range pruning degrades to scan-everything when keys are uniformly
 * distributed across file groups (hash assignment makes every file's
 * [min,max] span the whole key space); blooms stay selective there —
 * candidateSlices consults them after range pruning, in the executors,
 * with no false negatives (every written key is in its file's filter).
 */
object KeyBloom {
  /** 1% false positives ≈ 9.6 bits/key — a 1M-row file costs ~1.2 MB. */
  val Fpp = 0.01

  def sidecar(rel: String): String = rel + ".bloom"

  def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** None = sidecar missing/corrupt → caller keeps the file as a candidate
    * (pruning must stay conservative). */
  def load(basePath: String, rel: String): Option[BloomFilter] =
    try {
      val p = Paths.get(basePath, sidecar(rel))
      if (!Files.isRegularFile(p)) None
      else fromBytes(Files.readAllBytes(p))
    } catch { case _: Exception => None }

  /** None = unparseable payload (conservative, same contract as [[load]]). */
  def fromBytes(b: Array[Byte]): Option[BloomFilter] =
    try Some(BloomFilter.readFrom(new ByteArrayInputStream(b)))
    catch { case _: Exception => None }
}

/**
 * Bloom-building as a real Spark AGGREGATE (partial aggregation applies):
 * each map task folds its keys into a local filter, the shuffle carries ONE
 * serialized bloom per (file × map partition) — a few dozen KB — instead of
 * every key string. `expected` sizes the filter (use the table's target
 * file rows; files are written to that size).
 */
case class KeyBloomAgg(child: Expression, expected: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(64L, expected), KeyBloom.Fpp)

  override def update(b: BloomFilter, row: InternalRow): BloomFilter = {
    child.eval(row) match {
      case null =>
      // putBinary(utf8 bytes) == putString(String) (BloomFilterBase
      // .putString hashes the UTF-8 bytes) — skip the String round trip
      case u: org.apache.spark.unsafe.types.UTF8String => b.putBinary(u.getBytes)
      case v => b.putString(v.toString)
    }
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
    b.mergeInPlace(o); b
  }

  override def eval(b: BloomFilter): Any = KeyBloom.toBytes(b)
  override def serialize(b: BloomFilter): Array[Byte] = KeyBloom.toBytes(b)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KeyBloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KeyBloomAgg =
    copy(inputAggBufferOffset = offset)
}
