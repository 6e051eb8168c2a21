package graft

import org.apache.spark.sql.functions._

/** Synthetic control (events_synthetic_control): the oracle pins exact
  * values; these plant a panel with a KNOWN post-period lift and a
  * perfectly-matching donor, and pin the fixture's placebo behavior. */
class SyntheticControlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = {
    // days 1..10 (cut = day 1 + floor(0.6·9) = day 6): purchase equals
    // click pre-period (perfect donor, SSE 0) and jumps +5.00 after;
    // the other donors sit far away (weights → ~0)
    val rows = for {
      day <- 1 to 10
      (tpe, v) <- Seq(
        "purchase" -> (if (day >= 6) 15.0 else 10.0),
        "click" -> 10.0, "error" -> 1000.0,
        "signup" -> 1000.0, "view" -> 1000.0)
    } yield (day.toLong, f"2024-01-$day%02d 12:00:00", 1L, tpe, v, "{}")
    val df = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dir = Tables.scratch(sf001, "synth_spec")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("events_synthetic_control")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  test("planted +5.00 post-period lift is recovered against the matching donor") {
    assert(math.abs(planted(("avg_gap", "pre"))) < 0.05, planted)
    assert(math.abs(planted(("avg_gap", "post")) - 5.0) < 0.05, planted)
    // the perfect donor takes essentially all the weight
    assert(planted(("weight", "click")) > 0.99, planted)
  }

  test("fixture run: weights normalize and the placebo (pre) gap is stable") {
    val rows = SparkEntry.queries("events_synthetic_control")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wsum = Seq("click", "error", "signup", "view").map(d => rows(("weight", d))).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // no treatment exists in the fixture: the post gap must not move
    // far from the pre (placebo) gap, relative to the treated level
    val drift = math.abs(rows(("avg_gap", "post")) - rows(("avg_gap", "pre")))
    assert(drift < 0.2 * math.abs(rows(("avg_treated", "post"))), rows.toString)
  }
}
