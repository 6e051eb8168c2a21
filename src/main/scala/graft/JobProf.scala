package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (r22, VERDICT r21 "Next round" #3/#5): TimeQ plus a
  * listener-based job/stage/task profile — how many JOBS a query pays
  * (each is a driver-synchronized barrier), how many stages and tasks,
  * and where the stage time goes. The fleet's <0.5 s floor is
  * jobs-per-query, not plan shape; this is the measurement for it.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProf <query> ..."` —
  * same session shape as Bench/TimeQ. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val stageRows = mutable.ArrayBuffer.empty[(Int, Int, Long, String)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = sc.stageInfo
        val ms = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stageRows += ((si.stageId, si.numTasks, ms,
          si.name.split("\n").head.take(60)))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    } catch { case _: Throwable => }
    spark.sparkContext.addSparkListener(listener)
    for (n <- args) {
      jobs = 0; stages = 0; tasks = 0; stageRows.clear()
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading counters (listenerBus is
      // private[spark]; a short sleep suffices for a dev tool)
      Thread.sleep(300)
      println(f"$n%-28s ${dt}%8.2f s  rows=$c  jobs=$jobs stages=$stages tasks=$tasks")
      if (sys.env.get("GRAFT_PROF_STAGES").contains("1"))
        stageRows.sortBy(-_._3).take(20).foreach { case (id, nt, ms, nm) =>
          println(f"    stage $id%5d  $ms%6d ms  $nt%4d tasks  $nm")
        }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
