package graft

import graft.sample.{Sampler, Tiering}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TieringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("tierBoundaries: exact discrete tertiles on a known distribution") {
    import spark.implicits._
    // scores 1..9, one each: ceil(9/3)=3rd value -> b1=3, ceil(18/3)=6th -> b2=6
    val df = (1L to 9L).toDF("s")
    val b = Tiering.tierBoundaries(df, "s", 3).collect()(0)
    assert((b.getLong(0), b.getLong(1)) == (3L, 6L))
  }

  test("assignTiers: thirds on unique scores; 0=tail, top=head") {
    import spark.implicits._
    val df = (1L to 9L).toDF("s")
    val got = Tiering.assignTiers(df, "s").as[(Long, Int)].collect().toMap
    assert((1L to 3L).forall(got(_) == 0))
    assert((4L to 6L).forall(got(_) == 1))
    assert((7L to 9L).forall(got(_) == 2))
  }

  test("assignTiers: ties land LOW — tier is a function of score alone") {
    import spark.implicits._
    // 6x score 5, 3x score 9: cum(5)=6 >= ceil(9/3)=3 and >= ceil(18/3)=6
    // so b1=b2=5; every 5 is tail, every 9 is head, middle is empty
    val df = (Seq.fill(6)(5L) ++ Seq.fill(3)(9L)).toDF("s")
    val byTier = Tiering.assignTiers(df, "s")
      .groupBy("tier").count().as[(Int, Long)].collect().toMap
    assert(byTier == Map(0 -> 6L, 2 -> 3L))
  }

  test("assignTiers: degenerate single-score corpus is all tail") {
    import spark.implicits._
    val df = Seq.fill(7)(42L).toDF("s")
    val tiers = Tiering.assignTiers(df, "s").select("tier").as[Int].collect()
    assert(tiers.forall(_ == 0) && tiers.length == 7)
  }

  test("assignTiers: numTiers=4 quartiles; extra columns ride along") {
    import spark.implicits._
    val df = (1L to 8L).map(i => (i, s"d$i")).toDF("s", "payload")
    val got = Tiering.assignTiers(df, "s", numTiers = 4)
      .select("s", "payload", "tier").as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq == Seq(0, 0, 1, 1, 2, 2, 3, 3))
    assert(got.forall { case (s, p, _) => p == s"d$s" })
  }

  test("assignTiers: deterministic across parallelism (1 vs 32 partitions)") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, (i * 37) % 101))
    val a = Tiering.assignTiers(rows.toDF("id", "s").repartition(1), "s")
      .select("id", "tier").as[(Long, Int)].collect().toMap
    val b = Tiering.assignTiers(rows.toDF("id", "s").repartition(32), "s")
      .select("id", "tier").as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("holdoutSplit: domain-keyed — every doc of a domain lands on one side") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, s"site${i % 23}.com")).toDF("id", "domain")
    val split = Sampler.holdoutSplit(docs, "domain", valBp = 3000)
    val sidesPerDomain = split.groupBy("domain")
      .agg(countDistinct(col("split")).as("n")).select("n").as[Long].collect()
    assert(sidesPerDomain.forall(_ == 1L), "a domain must never straddle the split")
    // decision matches the bucket10k window (chars 1-8 of md5 of the KEY)
    val v = split.where(col("split") === "val").select("domain").distinct()
      .as[String].collect().toSet
    val expect = docs.select("domain").distinct()
      .where(Sampler.bucket10k(col("domain")) < 3000).as[String].collect().toSet
    assert(v == expect)
  }
}
