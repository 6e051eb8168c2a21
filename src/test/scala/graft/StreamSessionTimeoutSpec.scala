package graft

import graft.streaming.Streams
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The REAL event-time-timeout sessionizer: [[Streams.abandonedSessionsStream]]
  * driven as an actual flatMapGroupsWithState job with
  * GroupStateTimeout.EventTimeTimeout — file source with
  * maxFilesPerTrigger = 1, Trigger.AvailableNow, memory sink. The
  * mechanism under test is the WATERMARK-DRIVEN close: every user's
  * final session has no successor event, so it can ONLY leave the
  * state store through the timeout callback. A sentinel event from a
  * fake user (user_id = −1) staged 2 h past the corpus maximum
  * advances the global watermark past every real last_event + gap, so
  * the stream's output (sentinel rows dropped) must equal the
  * oracle-checked batch declaration row-for-row — including one
  * session row per real user that ONLY the timeout path can emit.
  * Arrival discipline: chunks cut in global (ts, event_id) order with
  * increasing mtimes (the log-compacted-topic contract, as in
  * StreamEwmaSpec). */
class StreamSessionTimeoutSpec extends SparkSpec {
  import spark.implicits._

  test("event-time-timeout sessionizer equals the batch declaration; final sessions close by timeout") {
    val ev = Tables.events(spark, sf001)
    val maxTs = ev.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val sentinelUs = maxTs.getTime * 1000L + 2L * 3600 * 1000000
    val sentinel = Seq((-1L, -1L, "noop", 0.0))
      .toDF("user_id", "event_id", "event_type", "value")
      .select(col("user_id"), timestamp_micros(lit(sentinelUs)).as("ts"),
              col("event_id"), col("event_type"), col("value"))
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
    val ordered = ev.selectExpr(cols: _*).orderBy("ts", "event_id")

    val stage = Files.createTempDirectory("graft_sess_chunks")
    val n = ordered.count()
    val one = ordered.coalesce(1).sortWithinPartitions("ts", "event_id")
      .withColumn("rid", monotonically_increasing_id())
    val cuts = Seq(n / 3, 2 * n / 3, n + 1)
    val chunks: Seq[Path] = cuts.zipWithIndex.map { case (hi, i) =>
      val lo = if (i == 0) 0L else cuts(i - 1)
      val tmp = Files.createTempDirectory(s"graft_sess_w$i")
      one.where(col("rid") >= lo && col("rid") < hi).drop("rid")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = stage.resolve(f"chunk$i%d.parquet")
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
      dst
    } :+ {
      // the watermark mover: one fake-user event 2 h past the corpus —
      // without it no real user's FINAL session can ever emit
      val tmp = Files.createTempDirectory("graft_sess_w3")
      sentinel.selectExpr(cols: _*).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = stage.resolve("chunk3.parquet")
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + 3 * 60000L)
      dst
    }

    val watched = Files.createTempDirectory("graft_sess_watched").toString
    chunks.foreach { src =>
      Files.copy(src, Paths.get(watched).resolve(src.getFileName),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val schema = spark.read.parquet(chunks.head.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watched)
    val q = Streams.abandonedSessionsStream(src).writeStream
      .format("memory").queryName("t_sess")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      q.recentProgress.map(_.numInputRows).mkString(","))

    val streamed = spark.table("t_sess").where(col("user_id") >= 0)
    val declared = Streams.abandonedSessionsBatch(ev)
    assertSameRows(streamed, declared, "timeout sessionizer vs batch")

    // the timeout path specifically: each real user's LAST session has
    // no successor event, so its row exists ONLY because the watermark
    // fired the callback — all users must be covered
    val nUsers = ev.select("user_id").distinct().count()
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("session_start").desc)
    val lastSessions = declared
      .withColumn("rl", row_number().over(wLast)).where(col("rl") === 1)
      .drop("rl")
    assert(lastSessions.count() == nUsers)
    assert(streamed.intersect(lastSessions).count() == nUsers,
      "some final session missing from the stream — timeout never fired")
  }
}
