package graft.frontier

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `bloom_agg(hashCol)` — blocked-Bloom-filter build as a Catalyst
  * `TypedImperativeAggregate` (SURVEY §2.10): the buffer is the filter's
  * bit-array, `update` sets bits per row, `merge` ORs partial filters —
  * Spark's partial/final aggregation IS the distributed build, so the same
  * operator works in SQL (`SELECT bloom_agg(xxhash64(id)) FROM seen`),
  * in `Dataset.agg`, and under whole-stage codegen's agg path.
  *
  * Complements [[SeenSet.buildBloomTree]] (the `treeAggregate` build the
  * north rule names, best when the result feeds a driver-side probe
  * expression): this one keeps the filter inside the query plan, e.g. one
  * bloom per partition group (`GROUP BY prefix`) for the sharded tier.
  */
case class BloomAggregate(
    child: Expression,
    numBlocks: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BlockedBloom] {

  override def createAggregationBuffer(): BlockedBloom =
    new BlockedBloom(numBlocks, numHashes)

  override def update(buffer: BlockedBloom, input: org.apache.spark.sql.catalyst.InternalRow): BlockedBloom = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BlockedBloom, other: BlockedBloom): BlockedBloom =
    buffer.mergeInPlace(other)

  override def eval(buffer: BlockedBloom): Any = buffer.serialized

  override def serialize(buffer: BlockedBloom): Array[Byte] = buffer.serialized

  override def deserialize(bytes: Array[Byte]): BlockedBloom =
    BlockedBloom.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a LONG hash column, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAggregate =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  /** Shared sizing formula: block count for an expected key budget (one
    * 512-bit block per ~51 keys at the default 10 bits/key). Both the Scala
    * Column API and the SQL `bloom_agg(hash, expectedKeys)` surface use this,
    * so the two forms size identically. */
  def blocksFor(expectedKeys: Long, bitsPerKey: Int = 10): Int =
    math.min(math.max(1L, (expectedKeys * bitsPerKey + 511) / 512), Int.MaxValue / 16).toInt

  /** Column API: `df.agg(BloomAgg(xxhash64($"id"), expectedKeys))` → binary. */
  def apply(hashCol: Column, expectedKeys: Long, bitsPerKey: Int = 10, numHashes: Int = 5): Column =
    Bridge.column(BloomAggregate(Bridge.expression(hashCol), blocksFor(expectedKeys, bitsPerKey), numHashes)
      .toAggregateExpression())
}
