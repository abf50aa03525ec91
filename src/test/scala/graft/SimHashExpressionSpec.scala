package graft

import graft.dedup.Dedup
import graft.functions.{GraftFunctions, SimHash}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class SimHashExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "key agg row scan slow fast table value part hash",
    "single",
    "  leading and trailing spaces  ",
    "tabs\tand\nnewlines mixed in here",
    "JOÃO ünïcode wörds «mixed»",
    ""
  )

  test("native expression is bit-exact with the portable HOF formulation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = samples.toDF("text")
    val both = df.select(
      Dedup.simhash64("text").as("hof"),
      expr(s"${GraftFunctions.SimHashName}(text)").as("native")
    ).collect()
    both.zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for '$s'")
    }
  }

  test("codegen and interpreted paths agree; kernel fn is deterministic") {
    samples.foreach { s =>
      val a = SimHash.compute(UTF8String.fromString(s))
      val b = SimHash.compute(UTF8String.fromString(s))
      assert(a == b)
    }
    // whole-stage codegen ON vs OFF (forces interpreted/eval path)
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = samples.toDF("text")
    def run(): Seq[Long] =
      df.select(expr(s"${GraftFunctions.SimHashName}(text)")).collect().map(_.getLong(0)).toSeq
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try run() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on == off)
  }

  test("null text → null hash; non-string input rejected at analysis") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(Some("abc"), None).toDF("text")
    val rows = df.select(expr(s"${GraftFunctions.SimHashName}(text)").as("h")).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    val err = intercept[Exception] {
      Seq(1, 2).toDF("n").select(expr(s"${GraftFunctions.SimHashName}(n)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") || err.getMessage.contains("DATATYPE"))
  }

  test("near-dup texts have small hamming distance vs unrelated texts") {
    val a = SimHash.compute(UTF8String.fromString("the quick brown fox jumps over the lazy dog near the river"))
    val b = SimHash.compute(UTF8String.fromString("the quick brown fox jumps over the lazy dog near the ocean"))
    val c = SimHash.compute(UTF8String.fromString("catalyst optimizer rewrites logical plans into physical operators"))
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }
}
