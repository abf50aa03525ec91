package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: print PageRank/HITS per-round L1 deltas on the spec graphs
  * to pin the convergence-spec assertions. Not part of any gated path.
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("delta-probe").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = (1 to 40).map(i => (s"s${i % 7}.com", s"d${i % 11}.org", (i % 3 + 1).toLong))
      .toDF("src", "dst", "weight").groupBy("src", "dst")
      .agg(sum("weight").as("weight"))
    val (_, pd) = graft.web.LinkGraph.domainRankWithDeltas(edges, iters = 8, stopDelta = None)
    println("PR deltas: " + pd.orderBy("iter").collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
    val (_, hd) = graft.web.LinkGraph.hitsRankWithDeltas(edges, iters = 6, stopDelta = None)
    println("HITS deltas: " + hd.orderBy("iter").collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}/${r.getLong(2)}").mkString(" "))
    val sym = Seq(("a.com", "b.org", 1L), ("b.org", "a.com", 1L)).toDF("src", "dst", "weight")
    val (_, sd) = graft.web.LinkGraph.domainRankWithDeltas(sym, iters = 10)
    println("PR sym stop: " + sd.orderBy("iter").collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
    val star = (1 to 6).map(i => (s"leaf$i.com", "hub.org", 1L)).toDF("src", "dst", "weight")
    val (_, hs) = graft.web.LinkGraph.hitsRankWithDeltas(star, iters = 6)
    println("HITS star stop: " + hs.orderBy("iter").collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}/${r.getLong(2)}").mkString(" "))
    spark.stop()
  }
}
