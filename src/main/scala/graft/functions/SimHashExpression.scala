package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash kernel shared by interpreted eval and generated code.
  *
  * Semantics are BIT-EXACT with the portable SQL formulation in
  * [[graft.dedup.Dedup.simhash64]]: SQL `trim` (ASCII space only) →
  * `split('\s+')` (Java regex, limit -1) → per-token `xxhash64` (seed 42,
  * Spark's XXH64) → per-bit ±1 votes → positive votes set the bit.
  */
object SimHash {
  def compute(s: UTF8String): Long = {
    val trimmed = s.trim() // UTF8String.trim removes ASCII space only — SQL trim semantics
    val tokens = trimmed.toString.split("\\s+", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(tokens(t)), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native Catalyst expression for SimHash: `graft_simhash64(text)`.
  *
  * The higher-order-function formulation (`aggregate(transform(...)))`)
  * evaluates interpreted — outside whole-stage codegen, re-walking 64×words
  * lambda frames per row. This expression stays inside codegen: the
  * generated code is a single static call, so the surrounding stage keeps
  * one WholeStageCodegen span (the same pattern Spark's own hash
  * expressions use). ~7× faster on the bench corpus.
  */
case class SimHash64Expression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Function registration: imperatively on any existing session (used by the
  * driver-contract queries, which receive a session we didn't build), or
  * declaratively via `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {
  val SimHashName = "graft_simhash64"

  private val info = new ExpressionInfo(classOf[SimHash64Expression].getName, SimHashName)

  /** Shared by the imperative and spark.sql.extensions paths — both must
    * reject wrong arity at analysis time, not silently drop arguments.
    */
  val expressionBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, s"$SimHashName takes exactly 1 argument, got ${children.length}")
    SimHash64Expression(children.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(SimHashName), info, expressionBuilder)
}

/** `SparkSessionExtensions` injector (spark.sql.extensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier(GraftFunctions.SimHashName),
        new ExpressionInfo(classOf[SimHash64Expression].getName, GraftFunctions.SimHashName),
        GraftFunctions.expressionBuilder)
    )
}
