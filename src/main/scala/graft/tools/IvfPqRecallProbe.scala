package graft.tools

import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness: IVF-PQ recall@5 across
  * (residual on/off, m, ks, nProbe) at a given sf dir — quantifies what
  * residual encoding buys over raw-vector encoding at the same code
  * budget, and locates the production knobs that hold recall ≥ 0.9.
  * Not part of any gated path.
  */
object IvfPqRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]").appName("ivfpq-recall-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val queries = embs.filter(col("vec_id") < 10)
    val cells = Similarity.cellsFor(embs.count())
    println(s"corpus=${embs.count()} cells=$cells")
    // exactness invariant: every vector its own cell → zero residuals →
    // ADC score degenerates to the exact coarse dot → recall 1.0
    val n = embs.count().toInt
    val exact = Similarity.ivfPqRecallAtK(embs, queries, 5,
      numCells = math.min(n, 65536), nProbe = math.min(n, 65536), m = 16, ks = 16)
    println(f"EXACTNESS numCells=n: recall@5=$exact%.3f (must be 1.0)")
    for {
      (m, ks) <- Seq((32, 256), (64, 256))
      nProbe <- Seq(8)
      residual <- Seq(false, true)
    } {
      val t0 = System.nanoTime()
      val r = Similarity.ivfPqRecallAtK(embs, queries, 5, cells, nProbe, m, ks,
        residual = residual)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"m=$m%2d ks=$ks%3d nProbe=$nProbe res=$residual%5s recall@5=$r%.3f (${sec}%.1f s)")
    }
    // refine stage (faiss IndexRefineFlat): ADC shortlist of R, exact
    // integer rerank to k — recall approaches the IVF cell-recall ceiling
    import org.apache.spark.sql.expressions.Window
    for ((m, ks, shortlist) <- Seq((16, 64, 25), (16, 64, 50), (16, 256, 25), (32, 64, 25))) {
      val t0 = System.nanoTime()
      val brute = Similarity.bruteForceTopK(embs, queries, 5)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val short = Similarity.ivfPqTopK(embs, queries, shortlist, cells, 8, m, ks)
        .select("qid", "vid")
      val e = embs.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      val q = embs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val qd = Similarity.qdotNative(embs) _
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vid"))
      val rr = short.join(e, "vid").join(broadcast(q), "qid")
        .select(col("qid"), col("vid"), qd(col("qe"), col("ve")).as("score"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = if (brute.isEmpty) 1.0 else (rr & brute).size.toDouble / brute.size
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RERANK m=$m%2d ks=$ks%3d probe=8 short=$shortlist recall@5=$rec%.3f (${sec}%.1f s)")
    }
    spark.stop()
  }
}
