package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time individual [[SparkEntry.queries]] entries
  * in isolation or in sequence, outside the full Bench suite — the tool
  * that separates "this query is slow" from "this query is slow after 80
  * other queries ran in the same session" (suite-order effects: leftover
  * localCheckpoint blocks, JIT state, GC pressure).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.QueryTimer q1 q2 ..."
  * Flags (env):
  *   SPARK_GRAFT_TIMER_REPS   timed repetitions per query (default 2)
  *   SPARK_GRAFT_TIMER_CORES  local[N] (default 8, matching Bench's suite)
  *   SPARK_GRAFT_TIMER_CLEAN  "1" → unpersist all persistent RDDs between
  *                            queries (isolates block-manager accumulation)
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TIMER_REPS", "2").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_TIMER_CORES", "8").toInt
    val clean = sys.env.getOrElse("SPARK_GRAFT_TIMER_CLEAN", "0") == "1"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-query-timer")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' — valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).collect().length
        val sec = (System.nanoTime() - t0) / 1e9
        if (clean) {
          import scala.jdk.CollectionConverters._
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          val _ = n
        }
        sec
      }
      val persisted = spark.sparkContext.getPersistentRDDs.size
      println(f"$name%-24s ${times.map(t => f"$t%7.2f s").mkString(" ")}  (persistent RDDs now: $persisted)")
    }
    spark.stop()
  }
}
