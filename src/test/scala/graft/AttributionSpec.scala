package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Last-touch attribution (events_attribution): planted sequences pin
  * every resolution edge — the inclusive 7-day lookback boundary, the
  * touch-at-the-exact-purchase-micro tie, equal-time touch ties, and
  * the two 'none' paths (no touch at all / touch too old). */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = 86400L * 1000000L

  // build ts via timestamp_micros so 1-µs offsets survive (a
  // java.sql.Timestamp constructor would truncate to millis)
  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")

  private def channels(rows: Seq[(Long, Long, Long, String, Double)]): Map[Long, String] =
    Analytics.attributeLastTouch(ev(rows), Analytics.AttributionLookbackUs)
      .collect().map(r => r.getLong(2) -> r.getString(4)).toMap

  test("nearest preceding touch wins; lookback boundary is inclusive") {
    val t0 = 1000L * DayUs
    val got = channels(Seq(
      // user 1: click 3 days before purchase 10 — attributes
      (1L, t0 - 3 * DayUs, 1L, "click", 0.0),
      (10L, t0, 1L, "purchase", 5.0),
      // user 2: view EXACTLY 7 days before — still attributes
      (2L, t0 - 7 * DayUs, 2L, "view", 0.0),
      (20L, t0, 2L, "purchase", 5.0),
      // user 3: view 7 days + 1 µs before — outside the window
      (3L, t0 - 7 * DayUs - 1L, 3L, "view", 0.0),
      (30L, t0, 3L, "purchase", 5.0),
      // user 4: no touch at all
      (40L, t0, 4L, "purchase", 5.0)))
    assert(got == Map(10L -> "click", 20L -> "view", 30L -> "none", 40L -> "none"))
  }

  test("a touch at the exact purchase micro attributes; equal-t ties pick the highest event_id") {
    val t0 = 1000L * DayUs
    val got = channels(Seq(
      // user 1: click at the same micro as the purchase
      (1L, t0, 1L, "click", 0.0),
      (10L, t0, 1L, "purchase", 5.0),
      // user 2: two touches at the same micro — event_id 6 (view) wins
      (5L, t0 - DayUs, 2L, "click", 0.0),
      (6L, t0 - DayUs, 2L, "view", 0.0),
      (20L, t0, 2L, "purchase", 5.0)))
    assert(got == Map(10L -> "click", 20L -> "view"))
  }

  test("later touches never attribute backwards") {
    val t0 = 1000L * DayUs
    val got = channels(Seq(
      (1L, t0 + 1L, 1L, "click", 0.0), // 1 µs AFTER the purchase
      (10L, t0, 1L, "purchase", 5.0)))
    assert(got == Map(10L -> "none"))
  }

  private def linear(rows: Seq[(Long, Long, Long, String, Double)]): Map[String, (Long, Long)] =
    Analytics.attributeLinear(ev(rows), Analytics.AttributionLookbackUs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("linear attribution: equal integer split, inclusive boundaries, touchless 'none' in full") {
    val t0 = 1000L * DayUs
    val got = linear(Seq(
      // user 1: purchase 10.00 → pool 1,000,000 millicents over 3
      // touches (one AT the purchase micro, one AT the 7-day edge):
      // credit 333,333 each, remainder 1 withheld (auditable)
      (1L, t0 - 7 * DayUs, 1L, "view", 0.0),
      (2L, t0 - DayUs, 1L, "click", 0.0),
      (3L, t0, 1L, "view", 0.0),
      (10L, t0, 1L, "purchase", 10.0),
      // user 2: only touch is 7 days + 1 µs old → outside, full pool
      // to 'none'
      (4L, t0 - 7 * DayUs - 1L, 2L, "click", 0.0),
      (20L, t0, 2L, "purchase", 5.0),
      // user 3: a touch AFTER the purchase never credits
      (5L, t0 + 1L, 3L, "view", 0.0),
      (30L, t0, 3L, "purchase", 2.0)))
    assert(got == Map(
      "view" -> (2L, 666666L),   // users 1 (×2 @333333)
      "click" -> (1L, 333333L),  // user 1
      "none" -> (2L, 700000L)),  // users 2 (500000) + 3 (200000)
      s"got $got")
  }
}
