package graft.tools

import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness: IVF recall@5 across (lloydRounds, nProbe)
  * at a given sf dir — quantifies the balanced-cells-vs-probe-budget
  * trade the Lloyd refinement introduces (BASELINE.md round 4 notes).
  * Not part of any gated path.
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]").appName("ivf-recall-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = embs.filter(col("vec_id") < 10)
    val cells = Similarity.cellsFor(embs.count())
    for (rounds <- Seq(0, 1, 2); probe <- Seq(4, 6, 8)) {
      val r = Similarity.ivfRecallAtK(embs, queries, 5, cells, probe, rounds)
      println(f"cells=$cells rounds=$rounds nProbe=$probe recall@5=$r%.3f")
    }
    // hypothesis: probe selection by raw DOT is biased when refined
    // (mean) centroids shrink in norm — probe by cosine instead and see
    // whether recall recovers at the same probe budget
    for (rounds <- Seq(0, 1, 2); probe <- Seq(4, 8)) {
      val (cent, asn) = Similarity.ivfAssign(embs, cells, rounds)
      val v = embs.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      val assigned = v.join(asn, "vid")
      val dot = (a: String, b: String) => expr(
        s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")
      val qw = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cs").desc, col("cid"))
      val qp = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .crossJoin(cent)
        .select(col("qid"), col("qe"), col("cid"),
          (dot("qe", "ce") / sqrt(dot("ce", "ce"))).as("cs"))
        .withColumn("rn", row_number().over(qw)).filter(col("rn") <= probe)
        .select(col("qid"), col("qe"), col("cid").as("cell")))
      val scored = assigned.join(qp, "cell").filter(col("qid") =!= col("vid"))
        .select(col("qid"), col("vid"),
          (dot("qe", "ve") / (sqrt(dot("qe", "qe")) * sqrt(dot("ve", "ve")))).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("score").desc, col("vid"))
      val ivf = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = {
        val q2 = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val s2 = v.crossJoin(broadcast(q2)).filter(col("qid") =!= col("vid"))
          .select(col("qid"), col("vid"),
            (dot("qe", "ve") / (sqrt(dot("qe", "qe")) * sqrt(dot("ve", "ve")))).as("score"))
        s2.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val rec = (ivf & brute).size.toDouble / brute.size
      println(f"COSPROBE rounds=$rounds nProbe=$probe recall@5=$rec%.3f")
    }
    // cell-size skew per refinement level: how much of the corpus do the
    // nProbe largest cells hold? (the "recall by accidentally scanning
    // everything" diagnostic)
    val n = embs.count()
    for (rounds <- Seq(0, 1, 2)) {
      val sizes = Similarity.ivfAssign(embs, cells, rounds)._2
        .groupBy("cell").count().orderBy(desc("count"))
        .select("count").collect().map(_.getLong(0))
      val top4 = sizes.take(4).sum
      val top8 = sizes.take(8).sum
      println(f"rounds=$rounds nonempty=${sizes.length} top4_frac=${top4.toDouble / n}%.3f top8_frac=${top8.toDouble / n}%.3f max_cell=${sizes.head}")
    }
    spark.stop()
  }
}
