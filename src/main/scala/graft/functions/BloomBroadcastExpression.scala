package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.util.sketch.BloomFilter

/** Per-executor deserialization cache for broadcast bloom filters, keyed by
  * broadcast id: the expression references land in every TASK (plan
  * references deserialize per task), and rebuilding a multi-hundred-MB
  * `BloomFilter` from its byte image per task would dominate the probe.
  *
  * BOUNDED: a streaming job calls the resume path every epoch, each with a
  * fresh broadcast — an unbounded map would accumulate one multi-hundred-MB
  * filter per epoch per executor and OOM a long-running stream. Broadcast
  * ids are assigned monotonically, so on overflow the smallest (oldest) ids
  * are evicted; eviction runs only on the miss path, never per row.
  */
object BloomBroadcastCache {
  private val MaxEntries = 4
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()

  def get(b: Broadcast[_]): BloomFilter = {
    val hit = cache.get(b.id)
    if (hit != null) return hit
    val bf = cache.computeIfAbsent(b.id,
      _ => BloomFilter.readFrom(new ByteArrayInputStream(b.value.asInstanceOf[Array[Byte]])))
    if (cache.size > MaxEntries) {
      import scala.jdk.CollectionConverters._
      cache.keySet.asScala.toVector.sorted.dropRight(MaxEntries).foreach(cache.remove)
    }
    bf
  }

  private[graft] def size: Int = cache.size
}

/** Codegen'd bloom-membership probe over a BROADCAST filter image:
  * `BloomBroadcastMightContain(broadcast(serialized filter), xxhash64(col))`.
  *
  * Why not `BloomFilterMightContain(lit(bytes), hash)`: a plan-tree binary
  * literal ships the whole filter INSIDE the expression tree — at the
  * resume path's 8e9-bit cap that is a ~1 GB literal referenced by two
  * stages, and any plan stringification (explain, the UI SQL tab, error
  * messages) renders binary literals as hex at 2× size — a driver OOM in
  * exactly the huge-committed-set regime the bloom regime exists for
  * (Spark's own runtime-filter blooms cap at 64 MB for this reason). Here
  * the plan carries only a broadcast HANDLE; the bytes ship once per
  * executor over the torrent protocol and deserialize once per executor
  * via [[BloomBroadcastCache]].
  *
  * Evaluation semantics match `BloomFilterMightContain`: NULL hash → NULL,
  * else `mightContainLong` (the filter must have been built over the same
  * xxhash64-Long domain — see [[graft.job.ExtractJob.pending]]).
  */
case class BloomBroadcastMightContain(filterB: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint (xxhash64) argument, got ${child.dataType.catalogString}")

  @transient private lazy val filter: BloomFilter = BloomBroadcastCache.get(filterB)

  override protected def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw Broadcast type: the generated code is compiled by Janino (no
    // generics); the cache helper takes Broadcast[_] for the same reason.
    // The filter is resolved ONCE per generated-class instance (per task)
    // into mutable state — the per-row path is a direct mightContainLong,
    // no cache lookup.
    val bRef = ctx.addReferenceObj("bloomBroadcast", filterB, classOf[Broadcast[_]].getName)
    val f = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter", "graftBloomFilter",
      v => s"$v = graft.functions.BloomBroadcastCache.get($bRef);")
    defineCodeGen(ctx, ev, h => s"$f.mightContainLong($h)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomBroadcastMightContain {
  /** Register a session function binding THIS broadcast filter, returning
    * the name for `call_function` (the public way to plant a custom
    * expression in a Column tree — the Column(Expression) constructor is
    * private[sql] in Spark 4). The name derives from the caller's stable
    * `key` (e.g. a table root), NOT the broadcast id: re-registration for
    * the same key OVERWRITES the binding, so a streaming job probing a
    * fresh filter every epoch holds one registry entry, not one per epoch.
    */
  def registerProbe(
      spark: org.apache.spark.sql.SparkSession,
      filterB: Broadcast[Array[Byte]],
      key: String): String = {
    // String.hashCode is spec-fixed, so the name is stable across JVMs
    val name = "graft_bloom_probe_" + java.lang.Integer.toHexString(key.hashCode)
    val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BloomBroadcastMightContain].getName, name)
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info,
      { children =>
        require(children.length == 1, s"$name takes exactly 1 argument, got ${children.length}")
        BloomBroadcastMightContain(filterB, children.head)
      })
    name
  }
}
