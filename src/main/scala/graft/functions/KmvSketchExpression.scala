package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch: a MERGEABLE aggregate keeping
  * the k smallest DISTINCT hash values of its input. From the k-th
  * smallest value the classic estimator recovers the distinct count —
  * `(k−1) · D DIV kth` for hashes uniform on `[0, D)` — in O(k) state per
  * group instead of the O(distinct) state an exact `countDistinct` needs
  * (Spark plans exact distinct as an Expand + second shuffle; at 10^12
  * rows per group that second shuffle carries every distinct key, while
  * this sketch carries k longs).
  *
  * One of the engine's two custom CATALYST AGGREGATES (with
  * [[BottomKSample]], the quantile-sketch state; the scalar expressions
  * `graft_simhash64`/`graft_qdot`/`graft_lshsig`/`graft_nfc`
  * cover the projection side): a [[TypedImperativeAggregate]] with a real
  * `merge`, so it gets map-side partial aggregation — each input partition
  * reduces to one k-element buffer before the shuffle, the property that
  * makes the sketch usable where the exact plan is not.
  *
  * Determinism: the k-min SET of a value stream is order-independent, so
  * the result is partitioning-invariant by construction (asserted in
  * KmvSketchSpec), and with the portable md5-based hash
  * ([[graft.stats.CorpusStats.hash40]]) the DuckDB oracle replays it
  * value-exactly — an honesty property no probabilistic-sketch library
  * (HLL's engine-specific registers) can offer.
  *
  * The buffer serializes as plain longs (4-byte count + k×8 bytes) for
  * partial-aggregate shuffle.
  */
case class KmvMinK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.KmvName} requires a BIGINT hash input, got ${child.dataType.sql}")
    else if (k < 1 || k > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.KmvName} k must be in [1, 65536], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def add(buffer: mutable.TreeSet[Long], v: Long): Unit = {
    if (buffer.size < k) buffer += v
    else if (v < buffer.last) { // TreeSet dedups; equal-to-member adds are no-ops
      buffer += v
      if (buffer.size > k) buffer -= buffer.last
    }
  }

  override def update(buffer: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buffer, _))
    buffer
  }

  /** Ascending array of the kept minima (size < k ⟺ the group had fewer
    * than k distinct hashes — the exact-count regime). */
  override def eval(buffer: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { b += bb.getLong; i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.KmvName

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinK =
    copy(child = newChild)
}
