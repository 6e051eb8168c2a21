package graft

import graft.operators.Analytics

/** Kaplan-Meier pins on planted cohorts — the arms the fixture cannot
  * reach (its hyperactive users all convert): right-censoring removing
  * subjects from the risk set without a death row, and the
  * everyone-dies zero arm. Values are hand-computed through the SAME
  * pinned chain the engine uses (fround6 per ln term, fround4 after
  * exp). */
class KmSpec extends SparkSpec {
  import spark.implicits._

  test("mixed cohort: censoring shrinks the risk set, S follows the textbook product") {
    // deaths at 1 and 3 (×2), censored at 2 and 5:
    //   S(1) = 4/5 = 0.8; at_risk(3) = 3 (the off=2 censor left) →
    //   S(3) = 0.8 × 1/3 = 0.2667
    val users = Seq((1, false), (2, true), (3, false), (3, false), (5, true))
      .toDF("off", "censored")
    val got = Analytics.kmCurve(users).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 5L, 0.8), (3L, 2L, 3L, 0.2667)),
      got.mkString(","))
  }

  test("everyone-dies arm: the final step hits S = 0 without any ±Inf") {
    val users = Seq((1, false), (2, false)).toDF("off", "censored")
    val got = Analytics.kmCurve(users).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 2L, 0.5), (2L, 1L, 1L, 0.0)),
      got.mkString(","))
  }

  test("all-censored cohort yields an empty curve (no death offsets)") {
    val users = Seq((4, true), (7, true)).toDF("off", "censored")
    assert(Analytics.kmCurve(users).count() == 0)
  }
}
