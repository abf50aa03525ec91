package graft

import java.nio.file.Files

import graft.table.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the pre-bucketed co-located join (SURVEY §4 shuffle
  * minimization): the join of two same-bucketed tables must plan with
  * NO Exchange on either side, and bucketing must not change the
  * answer relative to a plain join of the unbucketed inputs.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def writePair(): Unit = {
    val root = Files.createTempDirectory("graft-bkt-spec").toString
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars")),
      "spec_docs_bkt", s"$root/docs", 8, "doc_id")
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("label")),
      "spec_embs_bkt", s"$root/embs", 8, "vec_id")
  }

  test("co-located join of same-bucketed tables plans no Exchange") {
    writePair()
    val joined = Bucketing.cojoin(spark, "spec_docs_bkt", "spec_embs_bkt", "doc_id", "vec_id")
    val plan = finalPlan(joined)
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"both scans must consume the bucketing:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle either side:\n$plan")
  }

  test("bucketing changes the plan, not the answer") {
    writePair()
    val viaBuckets = Bucketing.cojoin(spark, "spec_docs_bkt", "spec_embs_bkt", "doc_id", "vec_id")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("label"))
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plain = d.join(e, d("doc_id") === e("vec_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("label"))
    assert(viaBuckets.count() > 0)
    assert(viaBuckets.exceptAll(plain).isEmpty && plain.exceptAll(viaBuckets).isEmpty,
      "bucketed join must return exactly the plain join's rows")
  }

  test("bucketsFor sizes by data volume, power-of-two, clamped") {
    assert(Bucketing.bucketsFor(0L) == 8)
    assert(Bucketing.bucketsFor(1L << 30) == 8)           // 1 GiB -> min
    assert(Bucketing.bucketsFor(100L << 30) == 256)       // 100 GiB / 512 MiB = 200 -> 256
    assert(Bucketing.bucketsFor(100L << 40) == 65536)     // 100 TiB -> clamp
    val b = Bucketing.bucketsFor(37L << 30)
    assert((b & (b - 1)) == 0, "bucket counts are powers of two")
  }
}
