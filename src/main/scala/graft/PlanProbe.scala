package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named SparkEntry queries.
  * `sbt "runMain graft.PlanProbe <query> [query ...]"` — the fast way
  * to eyeball pushdown/broadcast/shuffle shape while iterating
  * (PlanAuditSpec pins the load-bearing properties permanently). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
