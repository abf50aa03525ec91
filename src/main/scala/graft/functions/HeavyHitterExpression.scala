package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitter summary (Metwally et al. 2005) as a mergeable
  * Catalyst aggregate — the third of the engine's sketch aggregates
  * (with [[KmvMinK]] distinct and [[BottomKSample]] quantiles): ONE pass
  * over 10^12 rows finds every key whose weight exceeds `W/k` of a
  * group's total in O(k) state, where the exact plan (groupBy key +
  * TakeOrdered) must shuffle EVERY distinct key. For bounded key spaces
  * (registered domains) the exact plan is fine and this sketch runs in
  * its exact regime; for unbounded ones (urls, n-grams, user agents) the
  * exact plan's shuffle carries the full key universe and the sketch is
  * the only single-pass option.
  *
  * Semantics, spec-pinned:
  *  - update(key, w): existing key → count += w; room left → insert
  *    (w, err 0); full → evict the min-count entry (ties: the
  *    lexicographically LARGEST key — deterministic), insert the new key
  *    with count = min + w, err = min, and mark the summary approximate;
  *  - merge: counts add; a key absent from an APPROXIMATE side
  *    contributes that side's min kept count to both count and err (it
  *    may have been evicted there with up to that weight); absent from an
  *    exact side contributes 0. The union then re-truncates to the top k
  *    by (count desc, key asc), marking approximate if anything drops;
  *  - guarantees (invariant under ANY merge order, asserted in the spec):
  *    `count − err ≤ true ≤ count` for every kept key, and every key with
  *    true weight > total/k survives. In the approximate regime the exact
  *    count values may depend on merge order — the classic property of
  *    merged SpaceSaving summaries; the GATED query therefore keys on a
  *    bounded space (k ≥ distinct), where the summary is provably exact
  *    (`err = 0`, order-invariant, DuckDB-replayable).
  *
  * Eviction scans the k entries (O(k) worst case per update); the classic
  * stream-summary bucket list makes it O(1) with identical semantics —
  * worth swapping in if a profile ever shows eviction-bound updates (at
  * the gated key spaces evictions never fire at all).
  */
case class SpaceSavingTopK(
    key: Expression,
    weight: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buffer] with BinaryLike[Expression] {

  import SpaceSavingTopK._

  override def left: Expression = key
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.HeavyName} requires a STRING key, got ${key.dataType.sql}")
    else if (weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.HeavyName} requires a BIGINT weight, got ${weight.dataType.sql}")
    else if (k < 1 || k > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.HeavyName} k must be in [1, 65536], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buffer = new Buffer(false, mutable.HashMap.empty)

  private def evictMin(m: mutable.HashMap[String, Entry]): (String, Long) = {
    var minKey: String = null
    var minCnt = Long.MaxValue
    m.foreach { case (kk, e) =>
      if (e.count < minCnt || (e.count == minCnt && (minKey == null || kk > minKey))) {
        minKey = kk; minCnt = e.count
      }
    }
    m.remove(minKey)
    (minKey, minCnt)
  }

  private def add(b: Buffer, kk: String, w: Long): Unit = {
    if (w < 0) throw new IllegalArgumentException(
      s"${GraftFunctions.HeavyName}: negative weight $w for key '$kk'")
    b.map.get(kk) match {
      case Some(e) => e.count += w
      case None if b.map.size < k => b.map.put(kk, new Entry(w, 0L))
      case None =>
        val (_, minCnt) = evictMin(b.map)
        b.map.put(kk, new Entry(minCnt + w, minCnt))
        b.approx = true
    }
  }

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val kv = key.eval(input)
    val wv = weight.eval(input)
    if (kv != null && wv != null)
      add(b, kv.asInstanceOf[UTF8String].toString, wv.asInstanceOf[Long])
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = {
    if (other.map.isEmpty && !other.approx) return b
    val bMin = if (b.approx && b.map.nonEmpty) b.map.valuesIterator.map(_.count).min else 0L
    val oMin = if (other.approx && other.map.nonEmpty) other.map.valuesIterator.map(_.count).min else 0L
    val merged = mutable.HashMap.empty[String, Entry]
    (b.map.keysIterator ++ other.map.keysIterator).foreach { kk =>
      if (!merged.contains(kk)) {
        val (c1, e1) = b.map.get(kk).map(e => (e.count, e.err)).getOrElse((bMin, bMin))
        val (c2, e2) = other.map.get(kk).map(e => (e.count, e.err)).getOrElse((oMin, oMin))
        merged.put(kk, new Entry(c1 + c2, e1 + e2))
      }
    }
    var approx = b.approx || other.approx
    val kept =
      if (merged.size <= k) merged
      else {
        approx = true
        val top = merged.toArray.sortWith { (x, y) =>
          if (x._2.count != y._2.count) x._2.count > y._2.count else x._1 < y._1
        }.take(k)
        mutable.HashMap(top.toIndexedSeq: _*)
      }
    b.map.clear()
    kept.foreach { case (kk, e) => b.map.put(kk, e) }
    b.approx = approx
    b
  }

  /** array<struct<key, count, err>> sorted by (count desc, key asc). */
  override def eval(b: Buffer): Any = {
    val sorted = b.map.toArray.sortWith { (x, y) =>
      if (x._2.count != y._2.count) x._2.count > y._2.count else x._1 < y._1
    }
    new GenericArrayData(sorted.map { case (kk, e) =>
      InternalRow(UTF8String.fromString(kk), e.count, e.err)
    })
  }

  override def serialize(b: Buffer): Array[Byte] = {
    val entries = b.map.toArray
    val keyBytes = entries.map(_._1.getBytes(UTF_8))
    val size = 1 + 4 + keyBytes.map(_.length + 4 + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.put(if (b.approx) 1.toByte else 0.toByte)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(keyBytes(i).length)
      bb.put(keyBytes(i))
      bb.putLong(entries(i)._2.count)
      bb.putLong(entries(i)._2.err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val approx = bb.get() == 1.toByte
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Entry]
    var i = 0
    while (i < n) {
      val klen = bb.getInt
      val kb = new Array[Byte](klen)
      bb.get(kb)
      m.put(new String(kb, UTF_8), new Entry(bb.getLong, bb.getLong))
      i += 1
    }
    new Buffer(approx, m)
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.HeavyName

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpaceSavingTopK =
    copy(key = newLeft, weight = newRight)
}

object SpaceSavingTopK {
  final class Entry(var count: Long, var err: Long)
  final class Buffer(var approx: Boolean, val map: mutable.HashMap[String, Entry])
}
