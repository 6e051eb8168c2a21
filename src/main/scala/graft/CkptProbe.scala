package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r21): does `repartition(col).localCheckpoint()` preserve
  * the hash partitioning for downstream consumers — with AQE on
  * (default) and off? Decides whether the pre-partitioned-checkpoint
  * pattern (labelPropagate edges, marketBasket basket list) actually
  * removes the downstream exchange or silently degrades to
  * UnknownPartitioning. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    for (aqe <- Seq("true", "false");
         canChange <- Seq("true", "false")) {
      val spark = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", canChange)
        .config("spark.ui.enabled", "false")
        .appName(s"ckpt-probe-aqe-$aqe-cc-$canChange").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = spark.range(100000)
        .select((col("id") % 1000).as("k"), col("id").as("v"))
      val ck = df.repartition(col("k")).localCheckpoint()
      val scanPart = ck.queryExecution.executedPlan.outputPartitioning
      val agg = ck.groupBy("k").count()
      agg.write.format("noop").mode("overwrite").save()
      val nEx = agg.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("Exchange"))
      println(s"[ckpt-probe] aqe=$aqe scanPartitioning=$scanPart " +
        s"downstreamAggExchanges=$nEx")
      println(agg.queryExecution.executedPlan.toString)
      // persist arm: does a cached repartition keep its partitioning
      // for downstream plans (canChangeCachedPlanOutputPartitioning
      // default) — and does a self-join on the cache skip exchanges?
      val pe = df.repartition(col("k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pe.write.format("noop").mode("overwrite").save()
      val agg2 = pe.groupBy("k").count()
      agg2.write.format("noop").mode("overwrite").save()
      // does the downstream agg plan contain an ENSURE_REQUIREMENTS
      // exchange of its own (internal REPARTITION_BY_COL inside the
      // cached relation doesn't count)?
      def ownExchanges(p: org.apache.spark.sql.DataFrame): Int =
        p.queryExecution.executedPlan.toString.split("\n")
          .count(l => l.contains("Exchange") && l.contains("ENSURE_REQUIREMENTS"))
      val scanPart2 = pe.groupBy("k").count()
        .queryExecution.executedPlan.collectLeaves()
        .map(_.outputPartitioning).mkString(";")
      println(s"[ckpt-probe] aqe=$aqe canChange=$canChange PERSIST " +
        s"scanPart=$scanPart2 aggOwnExchanges=${ownExchanges(agg2)}")
      pe.unpersist()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
