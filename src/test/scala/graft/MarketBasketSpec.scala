package graft

import graft.operators.Analytics

/** Association rules (agg_market_basket): the oracle replays the
  * fixture; these pin the support/confidence/lift algebra. */
class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed support, confidence, and lift on planted baskets") {
    // 4 baskets: {a,b} {a,b} {a,c} {d} → (a,b): nab=2, na=3, nb=2
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
                   (3L, "a"), (3L, "c"), (4L, "d"))
      .toDF("ok", "item")
    val out = Analytics.marketBasket(rows).collect()
    assert(out.length == 1) // only (a,b) clears support >= 2
    val r = out(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.5)                 // 2/4
    assert(r.getDouble(4) == 0.666667)            // 2/3, 6-dp pin
    assert(r.getDouble(5) == 1.333333)            // 2·4/(3·2)
  }

  test("the min-support item prefilter is lossless and n_orders counts " +
       "ALL baskets (including ones holding only filtered items)") {
    // items y/z/w appear in exactly one basket each — the prefilter
    // drops them before pair generation, but no output pair can lose:
    // nab <= min(na, nb), so an np<2 item can never reach nab >= 2.
    // Basket 5 holds ONLY singleton items, yet must still count in
    // n_orders (support divides by all baskets, not surviving ones).
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
                   (3L, "a"), (3L, "y"), (4L, "z"), (5L, "w"))
      .toDF("ok", "item")
    val withRare = Analytics.marketBasket(rows).collect()
    assert(withRare.length == 1)
    val r = withRare(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.4)      // 2/5 — basket 5 still counted
    assert(r.getDouble(4) == 0.666667) // 2/3
    assert(r.getDouble(5) == 1.666667) // 2·5/(3·2)
  }

  test("query construction runs ONLY the one basket-list " +
       "materialization (n_orders still rides a broadcast crossJoin, " +
       "not a driver-side count)") {
    // r21: marketBasket localCheckpoints the deduped basket list at
    // construction (it is consumed four times downstream — see the
    // operator comment), which legitimately runs the ONE distinct
    // pass as construction-time job(s). The original r17 contract —
    // no driver-side .count() serializing plan build behind an EXTRA
    // full scan — still holds: the job budget here is the bounded
    // AQE stage count of a single distinct+checkpoint, and it does
    // not grow with the number of downstream consumers.
    val tracker = spark.sparkContext.statusTracker
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("ok", "item")
    val before = tracker.getJobIdsForGroup(null).length
    val df = Analytics.marketBasket(rows) // plan build + ONE checkpoint
    val after = tracker.getJobIdsForGroup(null).length
    assert(after - before <= 3,
      s"marketBasket construction ran ${after - before} Spark job(s) — " +
      "more than the single distinct+localCheckpoint materialization")
    assert(df.count() == 1L) // and the plan still executes correctly
  }

  test("fixture query: 15 rules, lift non-increasing, ratios in range") {
    val out = SparkEntry.queries("agg_market_basket")(spark, sf001).collect()
    assert(out.length == 15)
    val lifts = out.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
    out.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0)
    }
  }
}
