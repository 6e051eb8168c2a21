package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** r22 measurement probe (guide §1): where does the NND build's wall
  * time go at bench shape? JobProf showed 55 jobs / 56 stages for ONE
  * build with only ~5 s of stage time inside an 11 s wall — the gap is
  * job/stage scheduling + AQE replanning latency, not query work. This
  * probe A/Bs the candidate fixes on the REAL operator at sf0.1:
  *   - AQE on (bench default) vs off for the build scope
  *   - job/stage counts per variant (the latency driver)
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Opt22Probe"
  */
object Opt22Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages += 1
    })
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // JIT/codegen warmup on sf0.001 (outside all timed reps)
    val warmDir = new java.io.File(sfDir).getParent + "/sf0.001"
    if (new java.io.File(s"$warmDir/embeddings.parquet").exists() && warmDir != sfDir)
      operators.Similarity.knnGraphNnDescent(
        spark.read.parquet(s"$warmDir/embeddings.parquet")).count()
    def rep(tag: String, n: Int = 3)(f: => Long): Unit = {
      val xs = (1 to n).map { _ =>
        jobs = 0; stages = 0
        val t0 = System.nanoTime()
        val c = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        (dt, jobs, stages, c)
      }
      val med = xs.map(_._1).sorted.apply(n / 2)
      println(f"$tag%-36s med=$med%6.2f s  runs=${xs.map(x => f"${x._1}%.2f").mkString(",")}  jobs=${xs.head._2} stages=${xs.head._3} rows=${xs.head._4}")
    }
    rep("nnd_build aqe=on") {
      operators.Similarity.knnGraphNnDescent(emb).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rep("nnd_build aqe=off") {
      operators.Similarity.knnGraphNnDescent(emb).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    rep("beam on nnd graph aqe=on") {
      val g = operators.Similarity.knnGraphNnDescent(emb).localCheckpoint()
      operators.Similarity.graphBeamSearch(emb, g, 10).count()
    }
    // --- checkpoint-layout carryover probe (r22 wave 2): CkptProbe
    // showed a checkpoint loses its partitioning under AQE and keeps
    // it without; this asks the MIXED question that matters for the
    // repartition(k).localCheckpoint() materialization sites — if the
    // checkpoint is CREATED inside an AQE-off scope, does a consumer
    // planned with AQE back ON see the layout and skip its exchange?
    locally {
      import org.apache.spark.sql.functions._
      val base = spark.range(0, 200000).selectExpr("id % 997 as k", "id as v")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        df.write.format("noop").mode("overwrite").save()
        df.queryExecution.executedPlan.toString
          .linesIterator.count(_.contains("Exchange"))
      }
      val ckOn = base.repartition(col("k")).localCheckpoint()
      val ckOff = graft.Tables.withAqeOff(spark) {
        base.repartition(col("k")).localCheckpoint()
      }
      println(s"agg-on-ckpt(created AQE on):  exchanges=${exchanges(ckOn.groupBy("k").count())}")
      println(s"agg-on-ckpt(created AQE off): exchanges=${exchanges(ckOff.groupBy("k").count())}")
      val jOn = ckOn.as("a").join(ckOn.as("b"), "k").groupBy("k").count()
      val jOff = ckOff.as("a").join(ckOff.as("b"), "k").groupBy("k").count()
      println(s"selfjoin-on-ckpt(on):  exchanges=${exchanges(jOn)}")
      println(s"selfjoin-on-ckpt(off): exchanges=${exchanges(jOff)}")
    }
    spark.stop()
  }
}
