package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k-by-hash uniform sample: a MERGEABLE aggregate keeping the
  * values of the k rows whose (row-unique) hash keys are smallest — the
  * classic bottom-k sample, here as the state behind a QUANTILE sketch
  * (`CorpusStats.quantileSketch`). A uniform hash makes the kept rows a
  * uniform k-sample of the group, so the sample's interpolated quantiles
  * estimate the group's; under k rows the sample IS the group and the
  * estimate is exact.
  *
  * Why this sketch and not GK/KLL: their compactions depend on MERGE
  * ORDER, so the result varies with partitioning — unusable where results
  * must be deterministic at any parallelism and replayable by an
  * independent engine. A bottom-k SET is order-independent by
  * construction (same guarantee [[KmvMinK]] rides), and with the portable
  * md5 hash the DuckDB oracle replays membership and therefore every
  * derived quantile bit for bit. The trade: k must be sized for the
  * target accuracy (standard sample-quantile bounds) instead of GK's
  * per-rank guarantee.
  *
  * Contract: the hash key must be row-unique (hash a row id, not the
  * value) — equal (hash, value) pairs collapse in the state, exactly like
  * a repeated minimum in KMV.
  *
  * Scale shape: map-side partial aggregation with k (hash, value) pairs
  * of state per (partition, group); the exact-percentile alternative
  * shuffles a value histogram per group, unbounded for high-cardinality
  * value domains.
  */
case class BottomKSample(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = hashChild
  override def right: Expression = valueChild

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType != LongType || valueChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.BottomKName} requires (BIGINT hash, BIGINT value), " +
          s"got (${hashChild.dataType.sql}, ${valueChild.dataType.sql})")
    else if (k < 1 || k > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.BottomKName} k must be in [1, 65536], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Long)] =
    mutable.TreeSet.empty[(Long, Long)]

  private def add(buffer: mutable.TreeSet[(Long, Long)], hv: (Long, Long)): Unit = {
    if (buffer.size < k) buffer += hv
    else if (Ordering[(Long, Long)].lt(hv, buffer.last)) {
      buffer += hv
      if (buffer.size > k) buffer -= buffer.last
    }
  }

  override def update(buffer: mutable.TreeSet[(Long, Long)],
                      input: InternalRow): mutable.TreeSet[(Long, Long)] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      add(buffer, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buffer
  }

  override def merge(buffer: mutable.TreeSet[(Long, Long)],
                     other: mutable.TreeSet[(Long, Long)]): mutable.TreeSet[(Long, Long)] = {
    other.foreach(add(buffer, _))
    buffer
  }

  /** Sampled VALUES sorted ascending — the quantile-ready form; the hash
    * keys did their job selecting membership and are dropped. */
  override def eval(buffer: mutable.TreeSet[(Long, Long)]): Any =
    new GenericArrayData(buffer.toArray.map(_._2).sorted)

  override def serialize(buffer: mutable.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach { case (h, v) => bb.putLong(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.TreeSet.empty[(Long, Long)]
    var i = 0
    while (i < n) { b += ((bb.getLong, bb.getLong)); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.BottomKName

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(hashChild = newLeft, valueChild = newRight)
}
