package graft

import graft.streaming.Streams
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The REAL stateful streaming EWMA: [[Streams.ewmaStream]] driven as
  * an actual flatMapGroupsWithState job — file source with
  * maxFilesPerTrigger = 1 (three genuine micro-batches, so per-user
  * frame state CROSSES batch boundaries), Trigger.AvailableNow, memory
  * sink. Because every EWMA term is a dyadic-exact double, the stream
  * must equal the batch window fold to the BIT, not to a tolerance:
  *   - per-event emissions ≡ [[graft.operators.Windows.ewmaHalving]]
  *     over the full staged corpus (every cross-batch frame correct);
  *   - the last emission per user ≡ the oracle-checked
  *     `stream_ewma` batch declaration ([[Streams.ewmaCurrentBatch]]).
  * Arrival discipline: chunks are cut in GLOBAL (ts, event_id) order
  * with strictly increasing mtimes, so each user's events arrive in
  * event order across micro-batches — the same contract a
  * log-compacted Kafka topic partitioned by user gives at scale. */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  /** sf0.001 events in global (ts, event_id) order, cut into 3 chunk
    * files staged with increasing mtimes (delivery order = time). */
  private lazy val chunkFiles: Seq[Path] = {
    val stage = Files.createTempDirectory("graft_ewma_chunks")
    val ev = Tables.events(spark, sf001).orderBy("ts", "event_id")
    val n = ev.count()
    // monotonically_increasing_id over a 1-partition sorted frame is
    // the row's ordinal — force single partition so ids are dense
    val one = ev.coalesce(1).sortWithinPartitions("ts", "event_id")
      .withColumn("rid", monotonically_increasing_id())
    val cuts = Seq(n / 3, 2 * n / 3, n + 1)
    cuts.zipWithIndex.map { case (hi, i) =>
      val lo = if (i == 0) 0L else cuts(i - 1)
      val tmp = Files.createTempDirectory(s"graft_ewma_w$i")
      one.where(col("rid") >= lo && col("rid") < hi).drop("rid")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = stage.resolve(f"chunk$i%d.parquet")
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
      dst
    }
  }

  test("streamed EWMA equals the batch window fold bit-for-bit across 3 micro-batches") {
    val watched = Files.createTempDirectory("graft_ewma_watched").toString
    chunkFiles.foreach { src =>
      Files.copy(src, Paths.get(watched).resolve(src.getFileName),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val schema = spark.read.parquet(chunkFiles.head.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watched)
    val q = Streams.ewmaStream(src).writeStream
      .format("memory").queryName("t_ewma")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("t_ewma")

    // at least 2 micro-batches actually ran (state really crossed a
    // batch boundary) — recentProgress holds the per-batch log
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      q.recentProgress.map(_.numInputRows).mkString(","))

    val all = spark.read.parquet(chunkFiles.map(_.toString): _*)
    // per-event emissions == the batch 20-row window fold, exactly
    assertSameRows(streamed, operators.Windows.ewmaHalving(all), "ewma stream vs batch")

    // final state per user == the oracle-checked declaration: pick
    // each user's (ts, event_id)-last event from the corpus and read
    // its streamed emission
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val lastIds = all.withColumn("rl", row_number().over(wLast))
      .where(col("rl") === 1).select("user_id", "event_id")
    val lastPerUser = streamed.join(lastIds, Seq("user_id", "event_id"))
      .select(col("user_id"), col("ewma").as("ewma_now"))
    assertSameRows(lastPerUser, Streams.ewmaCurrentBatch(all), "ewma final state")
  }
}
