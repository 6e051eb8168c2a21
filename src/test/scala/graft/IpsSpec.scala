package graft

import graft.operators.Aggregations

/** Off-policy IPS/SNIPS evaluation (events_ips_eval): the oracle pins
  * fixture values; these hand-compute planted logged-bandit rows. */
class IpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Double)]) = {
    val r = Aggregations.ipsEval(rows.toDF("user_id", "event_type", "value")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("hand-computed IPS: one matched, one unmatched decision") {
    // user 0: π(0) = action 0 = click. Logged click → hit, propensity
    // (1 + (0+0)%5)/15 = 1/15, w = 15. Reward 1.00 → 100 cents.
    // user 1: π(1) = action 1 = error; logged 'view' (ai=4) → miss.
    val (n, m, logged, ips, snips) = run(Seq(
      (0L, "click", 1.0), (1L, "view", 2.0)))
    assert(n == 2L && m == 1L)
    assert(logged == 1.5)                 // (100+200)/2 cents
    // IPS = (15·100)/2/100 = 7.5 ; SNIPS = 100/100 = 1.0
    assert(ips == 7.5, s"ips=$ips")
    assert(snips == 1.0, s"snips=$snips")
  }

  test("SNIPS of a constant reward equals that reward regardless of weights") {
    // users 0..4 each log their π-chosen action with reward 3.00
    val acts = Seq("click", "error", "purchase", "signup", "view")
    val (_, m, _, _, snips) = run((0L to 4L).map(u => (u, acts(u.toInt), 3.0)))
    assert(m == 5L)
    assert(snips == 3.0, s"snips=$snips")
  }

  test("fixture estimates are finite and matched fraction is ~1/5") {
    val r = SparkEntry.queries("events_ips_eval")(spark, sf001).collect()(0)
    val frac = r.getLong(1).toDouble / r.getLong(0)
    assert(frac > 0.1 && frac < 0.3, s"matched fraction $frac")
    assert(!r.getDouble(3).isNaN && !r.getDouble(4).isNaN)
  }
}
