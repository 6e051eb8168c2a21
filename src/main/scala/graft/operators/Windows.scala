package graft.operators

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions. At scale each window is one shuffle on its
  * PARTITION BY key; partition keys here (nation, user, customer) are
  * high-cardinality enough to spread. Skewed partition keys would get the
  * salt-and-merge pattern; none of these fixtures need it.
  */
object Windows {

  val queries: Map[String, Q] = Map(
    // Forward-fill (gap fill): carry the last non-null observation
    // forward per user in event-time order — the time-series repair op
    // (sensor dropouts, sparse attribute streams). last(ignoreNulls)
    // over a running frame is one shuffle on the partition key; no
    // self-join, no driver loop. Here the "sparse" column is value
    // observed only on click events.
    "win_fill_forward" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("v", when(col("event_type") === "click", col("value")))
        .select(col("event_id"), col("user_id"), col("ts"),
                r2(last(col("v"), ignoreNulls = true).over(w)).as("filled"))
        .orderBy("event_id")
    }),
    // ROLLING EXACT MEDIAN — the robust moving-average (spike-immune
    // trend line): per order status, the interpolated median of the
    // trailing 10 totals in date order. One shuffle on the partition
    // key; the frame is BOUNDED (10 rows), so per-row state is O(w)
    // regardless of partition length — the property that keeps a
    // rolling quantile viable on year-long partitions at 100 TB.
    // Midpoint interpolation of 2-dec money terminates at 3 decimals,
    // so the fround4 is midpoint-free and engine-stable.
    "win_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-9, Window.currentRow)
      orders(s, dir)
        .withColumn("roll_med",
          fround(expr("percentile(o_totalprice, 0.5)").over(w), 4))
        .select(col("o_orderkey"), col("o_orderstatus"), col("roll_med"))
        .orderBy("o_orderkey")
    }),

    "win_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wr = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"), r2(col("c_acctbal")).as("acctbal"),
                big(row_number().over(w)).as("rn"),
                big(rank().over(wr)).as("rnk"),
                big(dense_rank().over(wr)).as("drnk"))
        .orderBy("c_nationkey", "rn")
    }),

    // Per-user event time deltas in exact integer microseconds (no
    // float, no truncation ambiguity across engines).
    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
                (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
                (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))).as("next_us"))
        .orderBy("event_id")
    }),

    // 7-row moving aggregate.
    "win_frame_rows" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      events(s, dir)
        .select(col("event_id"), col("user_id"),
                r4(sum(col("value")).over(w)).as("mov_sum"),
                big(count(lit(1)).over(w)).as("mov_n"))
        .orderBy("event_id")
    }),

    // RANGE frame running total — ties on the order key share a value,
    // so the output is deterministic even with duplicate dates.
    "win_frame_range" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
                r2(sum(col("o_totalprice")).over(w)).as("running_total"))
        .orderBy("o_orderkey")
    }),

    "win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"),
                big(ntile(4).over(w)).as("quartile"))
        .orderBy("c_nationkey", "quartile", "c_custkey")
    }),

    // Distribution analytics (percent_rank / cume_dist) plus
    // first/last over an explicit full-partition frame. Both engines
    // compute pr = (rank-1)/(n-1) and cd = peers≤/n with the same IEEE
    // division, so fround gives bit-identical output.
    "win_percent_rank" -> ((s, dir) => {
      val wo = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      val wf = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"),
                fround(percent_rank().over(wo), 6).as("pr"),
                fround(cume_dist().over(wo), 6).as("cd"),
                r2(first(col("c_acctbal")).over(wf)).as("top_bal"),
                r2(last(col("c_acctbal")).over(wf)).as("bot_bal"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    // Time-based RANGE frame: per-user trailing 1-hour event count and
    // sum, ordered by exact integer microseconds (a float time axis
    // would make frame membership engine-dependent). This is the
    // sessionless sliding aggregate a feature-engineering pipeline
    // computes per interaction; one shuffle on user_id.
    "win_time_range" -> ((s, dir) => {
      val hourUs = 3600L * 1000000
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-hourUs, 0)
      events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
                big(count(lit(1)).over(w)).as("n_1h"),
                r4(sum(col("value")).over(w)).as("sum_1h"))
        .orderBy("event_id")
    }),

    // Running DISTINCT count per user (distinct event types seen so
    // far): exact cumulative distinct is not a frame-able aggregate, so
    // it decomposes into two windows — a first-occurrence flag
    // (row_number over user×type = 1) and a running sum of flags over
    // the user's timeline. Both windows partition by user_id, so the
    // corpus shuffles once; total order (ts, event_id) makes every
    // rank deterministic.
    "win_running_distinct" -> ((s, dir) => {
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .select(col("event_id"), col("user_id"),
                big(sum(col("first_seen")).over(wRun)).as("n_distinct_types"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "win_rolling_median" ->
      ("SELECT o_orderkey, o_orderstatus, " +
       froundSql("QUANTILE_CONT(o_totalprice, 0.5) OVER (PARTITION BY o_orderstatus " +
         "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)", 4) +
       " AS roll_med FROM orders ORDER BY o_orderkey"),
    "win_fill_forward" ->
      ("SELECT event_id, user_id, ts, " +
       "ROUND(LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) " +
       "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled " +
       "FROM events ORDER BY event_id"),
    "win_rank" ->
      ("SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn, " +
       "CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS rnk, " +
       "CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS BIGINT) AS drnk " +
       "FROM customer ORDER BY c_nationkey, rn"),
    "win_lag_lead" ->
      ("SELECT event_id, user_id, ts, " +
       "epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us, " +
       "epoch_us(LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts) AS next_us " +
       "FROM events ORDER BY event_id"),
    "win_frame_rows" ->
      ("SELECT event_id, user_id, " +
       "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_sum, " +
       "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_n " +
       "FROM events ORDER BY event_id"),
    "win_frame_range" ->
      ("SELECT o_orderkey, o_custkey, " +
       "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total " +
       "FROM orders ORDER BY o_orderkey"),
    "win_ntile" ->
      ("SELECT c_custkey, c_nationkey, " +
       "CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile " +
       "FROM customer ORDER BY c_nationkey, quartile, c_custkey"),
    "win_percent_rank" ->
      ("SELECT c_custkey, c_nationkey, " +
       froundSql("PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)", 6) + " AS pr, " +
       froundSql("CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)", 6) + " AS cd, " +
       "ROUND(FIRST_VALUE(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS top_bal, " +
       "ROUND(LAST_VALUE(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS bot_bal " +
       "FROM customer ORDER BY c_nationkey, c_custkey"),
    "win_time_range" ->
      ("SELECT event_id, user_id, " +
       "CAST(COUNT(*) OVER w AS BIGINT) AS n_1h, " +
       "ROUND(SUM(value) OVER w, 4) AS sum_1h " +
       "FROM events " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
       "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
       "ORDER BY event_id"),
    "win_running_distinct" ->
      ("WITH f AS (SELECT event_id, user_id, ts, " +
       "CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type " +
       "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen FROM events) " +
       "SELECT event_id, user_id, " +
       "CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_distinct_types " +
       "FROM f ORDER BY event_id")
  )
}
