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
    // MAX DRAWDOWN per user — peak-to-trough of the running net
    // balance (inflow = purchase/signup, outflow = everything else),
    // the portfolio-risk statistic applied to user spend. All-integer
    // cents keep every running value exact in any engine. BOTH running
    // aggregates (cumulative sum, running peak) share one window spec,
    // so Catalyst stacks the two Window nodes over a SINGLE Exchange
    // on user_id; the final per-user collapse is a map-side-combinable
    // hash-agg. One shuffle total at any corpus size.
    "win_drawdown" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("flow",
          when(col("event_type").isin("purchase", "signup"),
               floor(col("value") * 100).cast("long"))
            .otherwise(-floor(col("value") * 100).cast("long")))
        .withColumn("cum", sum(col("flow")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .groupBy("user_id")
        .agg(big(max(col("peak") - col("cum"))).as("max_drawdown_cents"),
             big(max(col("peak"))).as("peak_cents"))
        .orderBy("user_id")
    }),

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

    // EXPONENTIALLY-WEIGHTED MOVING AVERAGE per user — the trend
    // smoother that weights recent observations geometrically
    // (feature-engineering's "recent behavior" signal). Engine-exact
    // BY CONSTRUCTION, not by rounding tolerance: decay 1/2 over
    // integer CENTS with a 20-row bounded frame means every term
    // cents·2⁻ʲ is an exact double (≤16 integer bits + ≤19 shifted
    // bits < 53-bit mantissa), so numerator and denominator are exact
    // in ANY accumulation order and the single final division is one
    // deterministic IEEE op — the DuckDB oracle's join-based
    // formulation lands on the identical bits. The bounded frame is
    // also the scale property: per-row state is O(20) on year-long
    // user timelines, and the HOF fold is row-local after the one
    // user_id shuffle (same discipline as win_rolling_median).
    "win_ewma" -> ((s, dir) => ewmaHalving(events(s, dir))),

    // LINEAR GAP INTERPOLATION of a per-user daily series — the
    // time-series repair step beyond win_fill_forward's step function:
    // missing days get the straight line between the surrounding
    // observations. The day spine is GENERATED per user from its own
    // (min, max) span (sequence + explode — row-local after the
    // per-user agg; never a cross join against a global calendar),
    // observations attach by (user, day) equi-join, and prev/next
    // anchors resolve with last/first(ignoreNulls) windows over ONE
    // user_id partitioning. Determinism: anchors are exact longs
    // (floor-cents and day offsets), so `pv + (nv−pv)·Δd / span` is
    // exact-integer arithmetic until a single IEEE division — both
    // engines land on identical bits before the fround4 pin.
    // Boundaries never dangle: the spine starts and ends ON observed
    // days, so every gap is interior.
    "win_interpolate" -> ((s, dir) => interpolateDaily(events(s, dir))),

    // CUMULATIVE SUM WITH RESET — "spend since the last purchase" per
    // user: a running total that restarts after every reset event.
    // The naive shape re-partitions by (user, segment) for the inner
    // cumsum — a SECOND corpus shuffle whose key depends on the first
    // window's output. Instead the reset is pure algebra on ONE
    // user_id partitioning: run = running_total − running_total AT
    // the last preceding reset (last(ignoreNulls) over the strict
    // prefix), so all three windows stack on a single exchange
    // (plan-pinned). Exact integer cents end to end; `seg` (count of
    // preceding resets) ships for auditability.
    "win_cumsum_reset" -> ((s, dir) => cumsumReset(events(s, dir))),

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

  /** The win_cumsum_reset body — exposed so TimeSeriesSpec can pin the
    * reset algebra on a planted sequence. See the query comment for
    * the one-shuffle design. */
  def cumsumReset(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ord = Seq(col("ts"), col("event_id"))
    val wRun = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("is_p", when(col("event_type") === "purchase", 1L).otherwise(0L))
      .withColumn("tot", sum(col("cents")).over(wRun))
      .withColumn("seg", coalesce(sum(col("is_p")).over(wPrev), lit(0L)))
      .withColumn("base",
        last(when(col("is_p") === 1, col("tot")), ignoreNulls = true).over(wPrev))
      .select(col("event_id"), col("user_id"), big(col("seg")).as("seg"),
              big(col("tot") - coalesce(col("base"), lit(0L))).as("run_cents"))
      .orderBy("event_id")
  }

  /** The win_ewma body over any (event_id, user_id, ts, value) frame —
    * exposed so TimeSeriesSpec can pin the decay algebra on planted
    * sequences. See the win_ewma entry for the exactness argument. */
  def ewmaHalving(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, Window.currentRow)
    ev.withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("lst", collect_list(col("cents")).over(w))
      .select(col("event_id"), col("user_id"),
        fround(
          expr("aggregate(transform(lst, (v, i) -> v * pow(0.5, size(lst) - 1 - i)), " +
               "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)") /
          expr("aggregate(transform(lst, (v, i) -> pow(0.5, size(lst) - 1 - i)), " +
               "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)") / 100.0, 6)
          .as("ewma"))
      .orderBy("event_id")
  }

  /** The win_interpolate body over any (user_id, ts, value) frame —
    * exposed so TimeSeriesSpec can pin the gap geometry on planted
    * series. See the win_interpolate entry for the spine/anchor and
    * exactness discipline. */
  def interpolateDaily(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val spine = daily.groupBy("user_id")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("user_id"),
              explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val wPrev = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("user_id", "d"), "left")
      .withColumn("od", when(col("cents").isNotNull, col("d")))
      .withColumn("pd", last(col("od"), ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("nd", first(col("od"), ignoreNulls = true).over(wNext))
      .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("d"),
        when(col("cents").isNotNull, lit(1L)).otherwise(lit(0L)).as("is_obs"),
        fround(
          when(col("cents").isNotNull, col("cents").cast("double"))
            .otherwise(col("pv") +
              (col("nv") - col("pv")) * datediff(col("d"), col("pd")) /
              datediff(col("nd"), col("pd"))) / 100.0, 4).as("filled"))
      .orderBy("user_id", "d")
  }

  val oracle: Map[String, String] = Map(
    "win_drawdown" ->
      ("WITH f AS (SELECT user_id, ts, event_id, " +
       "CASE WHEN event_type IN ('purchase', 'signup') " +
       "THEN CAST(FLOOR(value * 100) AS BIGINT) " +
       "ELSE -CAST(FLOOR(value * 100) AS BIGINT) END AS flow FROM events), " +
       "cu AS (SELECT user_id, ts, event_id, " +
       "SUM(flow) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS UNBOUNDED PRECEDING) AS cum FROM f), " +
       "pk AS (SELECT user_id, cum, " +
       "MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS UNBOUNDED PRECEDING) AS peak FROM cu) " +
       "SELECT user_id, CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents, " +
       "CAST(MAX(peak) AS BIGINT) AS peak_cents " +
       "FROM pk GROUP BY 1 ORDER BY 1"),
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
    // identical three-window algebra over one user_id partitioning
    "win_cumsum_reset" ->
      ("WITH x AS (SELECT event_id, user_id, ts, " +
       "CAST(FLOOR(value * 100) AS BIGINT) AS cents, " +
       "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p FROM events), " +
       "y AS (SELECT event_id, user_id, ts, is_p, " +
       "SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tot " +
       "FROM x), " +
       "z AS (SELECT event_id, user_id, tot, " +
       "COALESCE(SUM(is_p) OVER wp, 0) AS seg, " +
       "LAST_VALUE(CASE WHEN is_p = 1 THEN tot END IGNORE NULLS) OVER wp AS base " +
       "FROM y WINDOW " +
       "wp AS (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
       "SELECT event_id, user_id, CAST(seg AS BIGINT) AS seg, " +
       "CAST(tot - COALESCE(base, 0) AS BIGINT) AS run_cents " +
       "FROM z ORDER BY event_id"),

    // same spine/anchor construction; DuckDB's generate_series is
    // date-inclusive like Spark's sequence, DATE − DATE yields integer
    // days, and the interpolation expression repeats the engine's
    // exact-longs-then-one-division order token for token
    "win_interpolate" ->
      ("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d, " +
       "SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents " +
       "FROM events GROUP BY 1, 2), " +
       "spine AS (SELECT user_id, " +
       "UNNEST(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))::DATE AS d " +
       "FROM daily GROUP BY user_id), " +
       "j AS (SELECT s.user_id, s.d, daily.cents, " +
       "CASE WHEN daily.cents IS NOT NULL THEN s.d END AS od " +
       "FROM spine s LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d), " +
       "a AS (SELECT user_id, d, cents, " +
       "LAST_VALUE(od IGNORE NULLS) OVER wp AS pd, " +
       "LAST_VALUE(cents IGNORE NULLS) OVER wp AS pv, " +
       "FIRST_VALUE(od IGNORE NULLS) OVER wn AS nd, " +
       "FIRST_VALUE(cents IGNORE NULLS) OVER wn AS nv " +
       "FROM j WINDOW " +
       "wp AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
       "wn AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
       "SELECT user_id, d, " +
       "CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS is_obs, " +
       froundSql("(CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) " +
         "ELSE pv + (nv - pv) * (d - pd) / (nd - pd) END) / 100.0", 4) +
       " AS filled FROM a ORDER BY user_id, d"),

    // independent join-based formulation of the same 20-row decay-1/2
    // EWMA: every (row, frame-row) pair materializes with weight
    // 0.5^(rn1-rn2); exactness of cents·2⁻ʲ terms makes SUM order
    // irrelevant, so the window fold and this join agree bit-for-bit
    "win_ewma" ->
      ("WITH r AS (SELECT event_id, user_id, " +
       "CAST(FLOOR(value * 100) AS BIGINT) AS cents, " +
       "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
       "FROM events), " +
       "p AS (SELECT r1.event_id, r1.user_id, " +
       "SUM(r2.cents * POWER(0.5, r1.rn - r2.rn)) AS num, " +
       "SUM(POWER(0.5, r1.rn - r2.rn)) AS den " +
       "FROM r r1 JOIN r r2 ON r2.user_id = r1.user_id " +
       "AND r1.rn - r2.rn BETWEEN 0 AND 19 GROUP BY 1, 2) " +
       "SELECT event_id, user_id, " +
       froundSql("num / den / 100.0", 6) + " AS ewma " +
       "FROM p ORDER BY event_id"),
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
