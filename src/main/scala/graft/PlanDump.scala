package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Maintenance tool: prints `explain("formatted")` for the named
  * `SparkEntry.queries` entries (all of them if none given) — the source
  * material for PLANS.md. Plan QUALITY is asserted in PlanSpec; this is
  * for the human audit trail.
  *
  * Usage: `sbt "runMain graft.PlanDump t_repetition q_sample_stratified"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
