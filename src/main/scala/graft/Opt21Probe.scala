package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the r21 optimization round: isolates the FIXED cost
  * of the primitives the bench pays hundreds of times — one shuffle
  * stage, one broadcast build, one localCheckpoint, one collect — at
  * the bench's session shape (local[32], shuffle.partitions=32), with
  * AQE on and off. Not part of any measured surface. */
object Opt21Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_PROBE_LOCALDIR").foreach(d => b.config("spark.local.dir", d))
    sys.env.get("GRAFT_PROBE_BYPASS").foreach(t =>
      b.config("spark.shuffle.sort.bypassMergeThreshold", t))
    sys.env.get("GRAFT_PROBE_CHECKSUM").foreach(t =>
      b.config("spark.shuffle.checksum.enabled", t))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def timed(tag: String, n: Int = 5)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-34s min ${ts.min}%6.3f  med ${ts.sorted.apply(n / 2)}%6.3f  max ${ts.max}%6.3f")
    }
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      println(s"===== AQE=$aqe")
      timed("noop collect (0 stage)")(spark.range(10).collect())
      timed("1-stage count")(spark.range(4000).count())
      timed("repartition count (2 stages)")(
        spark.range(4000).repartition(col("id")).count())
      timed("repartition 1-map-task")(
        spark.range(0, 4000, 1, 1).repartition(col("id")).count())
      timed("repartition 4-map-task")(
        spark.range(0, 4000, 1, 4).repartition(col("id")).count())
      timed("groupBy count (2 stages)")(
        spark.range(4000).select((col("id") % 100).as("k"))
          .groupBy("k").count().count())
      timed("3-exchange chain")(
        spark.range(4000).select((col("id") % 100).as("k"), col("id"))
          .repartition(col("k"))
          .groupBy("k").agg(sum("id").as("s"))
          .orderBy("s").count())
      timed("window count (2 stages)") {
        import org.apache.spark.sql.expressions.Window
        spark.range(4000).select((col("id") % 100).as("k"), col("id"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("k").orderBy("id")))
          .where(col("rn") <= 3).count()
      }
      timed("broadcast join count")(
        spark.range(4000).join(broadcast(spark.range(100)), Seq("id")).count())
      timed("localCheckpoint")(
        spark.range(4000).select(col("id")).localCheckpoint())
      timed("parquet scan count")(
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").count())
    }
    spark.stop()
  }
}
