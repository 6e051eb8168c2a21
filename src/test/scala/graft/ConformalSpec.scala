package graft

/** Split-conformal intervals (agg_conformal_interval): the oracle pins
  * exact output; this pins the conformal guarantee on the fixture. */
class ConformalSpec extends SparkSpec {

  test("achieved coverage sits at the 90% target within finite-sample slack") {
    val rows = SparkEntry.queries("agg_conformal_interval")(spark, sf01).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val cov = r.getDouble(5)
      // guarantee: E[coverage] >= 0.9; per-type realized coverage on
      // ~1000 eval points has stderr ~1% — 0.85/0.97 is ±5σ slack
      assert(cov >= 0.85 && cov <= 0.97, s"${r.getString(0)}: coverage=$cov")
      assert(r.getDouble(4) > 0.0, "half width must be positive")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }
}
