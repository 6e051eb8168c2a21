package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Real watermark semantics over an out-of-order MemoryStream: events
  * older than the watermark when their micro-batch's aggregation state
  * is finalized must be dropped from the result. This is the streaming
  * contract the batch oracle cannot express (SURVEY.md §2.2
  * `stream_watermark_late` ✗). */
class WatermarkStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed agg with 10-minute watermark drops a too-late event") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(sum("v").as("total"))
      .select(col("w.start").as("wstart"), col("total"))

    val q = agg.writeStream.format("memory").queryName("wm_agg")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: events at 10:05 and 10:07 (window [10:00,10:10))
    mem.addData((ts(5), 1L), (ts(7), 2L))
    q.processAllAvailable()
    // batch 2: event at 10:35 pushes the watermark to 10:25, which
    // closes and emits the [10:00,10:10) window
    mem.addData((ts(35), 10L))
    q.processAllAvailable()
    // batch 3: a straggler back at 10:06 — beyond the watermark, must
    // NOT reopen the closed window
    mem.addData((ts(6), 100L))
    q.processAllAvailable()
    // close remaining state
    mem.addData((ts(59), 1L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_agg")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(rows("2026-01-01 10:00:00.0") == 3L,
      s"late straggler leaked into the closed window: $rows")
  }

  test("flatMapGroupsWithState counter carries state across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val counted = graft.streaming.Streams.statefulCountsStream(
      mem.toDF().toDF("user_id", "event_id"))
    val q = counted.writeStream.format("memory").queryName("state_cnt")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    mem.addData((1L, 10L), (1L, 11L), (2L, 20L)) // batch 1: u1=2, u2=1
    q.processAllAvailable()
    mem.addData((1L, 12L), (2L, 21L), (2L, 22L)) // batch 2: u1=3, u2=3
    q.processAllAvailable()
    q.stop()

    // the counter's LATEST emission per user must be the cross-batch
    // cumulative total — state survived the batch boundary
    val latest = spark.table("state_cnt")
      .groupBy("user_id").agg(max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == Map(1L -> 3L, 2L -> 3L), latest.toString)
    // and both batches emitted (append mode → one row per user per batch)
    assert(spark.table("state_cnt").count() == 4L)
  }

  test("dropDuplicates within watermark dedups in-window, forgets out-of-window") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dd = mem.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id")

    val q = dd.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    mem.addData((ts(5), 42L))
    q.processAllAvailable()
    mem.addData((ts(6), 42L)) // duplicate inside the state window → dropped
    q.processAllAvailable()
    q.stop()

    assert(spark.table("wm_dedup").count() == 1L)
  }
}
