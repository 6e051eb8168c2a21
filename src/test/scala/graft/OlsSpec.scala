package graft

import graft.operators.Aggregations
import org.apache.spark.sql.functions._

/** agg_group_ols algebra pins on planted points (the sufficient-
  * statistics closed form, evaluated by hand): an exact fit must score
  * slope/intercept exactly with r² = 1, and a known-residual group must
  * land the hand-computed fround6 values. */
class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("planted exact fit and known-residual group score the hand-computed OLS") {
    val df = Seq(
      // group a: y = 2x + 1 exactly
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
      // group b: n=3, Σx=6 Σy=7 Σxx=14 Σxy=17 Σyy=21 →
      // slope 9/6 = 1.5, intercept (7−9)/3 = −2/3, r² 81/84
      ("b", 1.0, 1.0), ("b", 2.0, 2.0), ("b", 3.0, 4.0)
    ).toDF("g", "x", "y")
    val got = Aggregations.groupOls(df, "g", "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
                           r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("a", 3L, 2.0, 1.0, 1.0),
      ("b", 3L, 1.5, -0.666667, 0.964286)), s"got $got")
  }

  test("a single-pass plan: one hash aggregate, no window, no self-join") {
    val p = Aggregations.groupOls(
      Tables.lineitem(spark, sf001), "l_returnflag", "l_quantity", "l_extendedprice")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("Join"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000)) // partial + final
  }
}
