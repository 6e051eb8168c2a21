package graft

import graft.streaming.Streams
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The REAL Spark 4 transformWithState job: [[Streams.twsTopkStream]]
  * (StatefulProcessor + typed ListState) driven over 3 genuine
  * micro-batches on the RocksDB state store — the v2 state API's
  * provider contract. Each user's LAST emission (tagged with the
  * user's final (us, event_id) as-of) must equal the oracle-checked
  * batch declaration: the per-batch top-3 merge commutes with ranking
  * the full history because both use the same (cents DESC, us, id)
  * total order. Chunks arrive in global (ts, event_id) order with
  * increasing mtimes (the StreamEwmaSpec discipline). */
class StreamTwsTopkSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState top-3 view: final emission per user equals the batch rank") {
    val ev = Tables.events(spark, sf001)
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
    val ordered = ev.selectExpr(cols: _*).orderBy("ts", "event_id")
    val stage = Files.createTempDirectory("graft_tws_chunks")
    val n = ordered.count()
    val one = ordered.coalesce(1).sortWithinPartitions("ts", "event_id")
      .withColumn("rid", monotonically_increasing_id())
    val cuts = Seq(n / 3, 2 * n / 3, n + 1)
    val chunks: Seq[Path] = cuts.zipWithIndex.map { case (hi, i) =>
      val lo = if (i == 0) 0L else cuts(i - 1)
      val tmp = Files.createTempDirectory(s"graft_tws_w$i")
      one.where(col("rid") >= lo && col("rid") < hi).drop("rid")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = stage.resolve(f"chunk$i%d.parquet")
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
      dst
    }
    val watched = Files.createTempDirectory("graft_tws_watched").toString
    chunks.foreach { src =>
      Files.copy(src, Paths.get(watched).resolve(src.getFileName),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(chunks.head.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val q = Streams.twsTopkStream(src).writeStream
        .format("memory").queryName("t_tws")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        q.recentProgress.map(_.numInputRows).mkString(","))

      val all = spark.read.parquet(chunks.map(_.toString): _*)
      val wLast = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val lastIds = all.withColumn("rl", row_number().over(wLast))
        .where(col("rl") === 1)
        .select(col("user_id"), unix_micros(col("ts")).as("asof_us"),
                col("event_id").as("asof_event_id"))
      val finalView = spark.table("t_tws")
        .join(lastIds, Seq("user_id", "asof_us", "asof_event_id"))
        .select("user_id", "rnk", "event_id", "cents")
      assertSameRows(finalView, Streams.twsTopkBatch(all), "tws top-3 final view")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
