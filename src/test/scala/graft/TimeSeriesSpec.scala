package graft

import graft.operators.{Analytics, SortSetOps, Windows}
import java.sql.Timestamp

/** Planted-case pins for the round-11 time-series / skyline / graph
  * additions: win_ewma's decay algebra, win_interpolate's gap geometry
  * and boundary behavior, topk_pareto_frontier's dominance rules, and
  * graph_clustering_coeff's clique-vs-star extremes — each computed by
  * hand, never against the engine itself.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("win_ewma: hand-computed decay-1/2 averages, frame capped at 20 rows") {
    // user 1: values 1.00 then 3.00 →
    //   row 1: 100/1            = 1.00
    //   row 2: (100·½ + 300)/1.5 = 350/1.5 = 233.333… → 2.333333
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.00),
      (2L, 1L, ts("2024-01-01 00:01:00"), 3.00),
      // user 2: 21 rows of 2.00 with one leading 44.00 spike — the spike
      // falls OUT of the 20-row frame at the last row, so ewma = 2 exactly
      (10L, 2L, ts("2024-01-01 00:00:00"), 44.00)
    ).toDF("event_id", "user_id", "ts", "value")
      .unionByName(Seq.tabulate(20)(i =>
        (11L + i, 2L, ts(f"2024-01-01 01:${i}%02d:00"), 2.00))
        .toDF("event_id", "user_id", "ts", "value"))
    val got = Windows.ewmaHalving(ev).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(1L) == 1.0, s"got ${got(1L)}")
    assert(got(2L) == 2.333333, s"got ${got(2L)}")
    // last row of user 2: frame = rows 11..30, all 2.00 → exactly 2.0;
    // any leakage of the 44.00 spike would shift it
    assert(got(30L) == 2.0, s"got ${got(30L)}")
    // second row of user 2 still sees the spike: (4400·½ + 200)/1.5
    // = 2400/1.5 = 1600 cents → 16.0
    assert(got(11L) == 16.0, s"got ${got(11L)}")
  }

  test("win_interpolate: interior gaps are linear, observed days exact, spine ends on observations") {
    // user 1: day 1 = 1.00, day 4 = 4.00 (100 and 400 cents) →
    // days 2, 3 interpolate to 2.00, 3.00; no day 0 or 5 rows exist
    // user 2: two same-day events sum (1.25 + 0.75 = 2.00), single day
    val ev = Seq(
      (1L, 1L, ts("2024-03-01 09:00:00"), 1.00),
      (2L, 1L, ts("2024-03-04 09:00:00"), 4.00),
      (3L, 2L, ts("2024-03-02 09:00:00"), 1.25),
      (4L, 2L, ts("2024-03-02 10:00:00"), 0.75)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Windows.interpolateDaily(ev).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-03-01", 1L, 1.0),
      (1L, "2024-03-02", 0L, 2.0),
      (1L, "2024-03-03", 0L, 3.0),
      (1L, "2024-03-04", 1L, 4.0),
      (2L, "2024-03-02", 1L, 2.0)), s"got ${got.toSeq}")
  }

  test("topk_pareto_frontier: dominance, same-price collapse, and per-group independence") {
    val pts = Seq(
      // group A: (1,5) and (2,10) survive; (3,7) dominated by (2,10);
      // (2,8) collapses into the (2,·) candidate max 10
      ("A", 1.0, 5L), ("A", 2.0, 10L), ("A", 2.0, 8L), ("A", 3.0, 7L),
      // group B: its own frontier — (3,7) survives here (no (2,10) in B)
      ("B", 3.0, 7L), ("B", 4.0, 6L)
    ).toDF("grp", "price", "sz")
    val got = SortSetOps.paretoFrontier(pts).orderBy("grp", "price").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 1.0, 5L), ("A", 2.0, 10L), ("B", 3.0, 7L)), s"got $got")
  }

  test("win_cumsum_reset: the running total restarts after each purchase") {
    // values 1, 2(P), 3, 1(P), 5 → tot 1,3,6,7,12 cents·100;
    // seg 0,0,1,1,2; run = spend since last purchase (inclusive of the
    // closing purchase in ITS OWN segment): 1, 3, 3, 4, 5
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00"), "click",    1.00),
      (2L, 7L, ts("2024-01-01 00:01:00"), "purchase", 2.00),
      (3L, 7L, ts("2024-01-01 00:02:00"), "click",    3.00),
      (4L, 7L, ts("2024-01-01 00:03:00"), "purchase", 1.00),
      (5L, 7L, ts("2024-01-01 00:04:00"), "view",     5.00)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Windows.cumsumReset(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L, 100L), (2L, 0L, 300L), (3L, 1L, 300L),
                      (4L, 1L, 400L), (5L, 2L, 500L)), s"got $got")
  }

  test("agg_mad: a planted spike moves the mean but not the median/MAD") {
    // group g: [1, 2, 3, 4, 100] → median 3; |x−3| = [2,1,0,1,97] →
    // MAD 1 (the spike lands in the tail of BOTH medians)
    val ev = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 100.0))
      .toDF("event_type", "value")
    val got = operators.Aggregations.madOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq(("g", 5L, 3.0, 1.0)), s"got $got")
  }

  test("events_ab_test: planted cohorts land the hand-derived Welch closed form") {
    // A = [1,2,3]: mean 2, var 1, se² 1/3; B = [2,4,6,8]: mean 5,
    // var 20/3, se² 5/3 → t = −3/√2, df = 4/((1/18)+(25/27)).
    // Expected values computed with the SAME double chain the
    // operator declares (this pins the plumbing; float identity with
    // the oracle is CORRECTNESS's job).
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0),
                 (1, 2.0), (1, 4.0), (1, 6.0), (1, 8.0)).toDF("grp", "x")
    val got = operators.Aggregations.welchOf(df).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5))).toSeq
    val sa = 1.0 / 3; val sb = (20.0 / 3) / 4
    def fr(x: Double, n: Int) = { val f = math.pow(10, n); math.floor(x * f + 0.5) / f }
    val t = fr((2.0 - 5.0) / math.sqrt(sa + sb), 6)
    val dfw = fr((sa + sb) * (sa + sb) / (sa * sa / 2 + sb * sb / 3), 4)
    assert(got == Seq((3L, 4L, 2.0, 5.0, t, dfw)), s"got $got expected t=$t df=$dfw")
  }

  test("agg_bootstrap_ci: interval is ordered, straddles the point estimate, and is seed-stable") {
    val q = SparkEntry.queries("agg_bootstrap_ci")
    val r1 = q(spark, sf001).collect()(0)
    val (mean, lo, hi) = (r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(lo <= hi, s"lo $lo > hi $hi")
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] misses mean $mean")
    // seeded hash ⇒ bit-identical on a second evaluation
    val r2 = q(spark, sf001).collect()(0)
    assert(r1 == r2, s"$r1 != $r2")
  }

  test("graph_assortativity: a planted star is perfectly disassortative (r = −1)") {
    // star 1—{2,3,4}: every directed edge pairs degree 3 with degree 1
    // in one orientation or the other — endpoint degrees are perfectly
    // anti-correlated
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Analytics.assortativityOf(star).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((6L, -1.0)), s"got $got")
  }

  test("graph_clustering_coeff: clique corners score 1, star centers and leaves score 0") {
    // K3 on {1,2,3} plus a star 10—{11,12,13}: triangle nodes have
    // deg 2, tri 1 → coeff 1.0; the star hub has deg 3, tri 0 → 0.0;
    // leaves have deg 1 → defined 0.0
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                    (10L, 11L), (10L, 12L), (10L, 13L)).toDF("a", "b")
    val got = Analytics.clusteringCoeff(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0), (3L, 2L, 1L, 1.0),
      (10L, 3L, 0L, 0.0),
      (11L, 1L, 0L, 0.0), (12L, 1L, 0L, 0.0), (13L, 1L, 0L, 0.0)), s"got $got")
  }
}
