package graft

import graft.operators.Aggregations

/** Benjamini-Hochberg FDR gate (agg_benjamini_hochberg): the oracle
  * replays the fixture; these plant one real effect among nulls and
  * exercise the step-up walk. */
class BhSpec extends SparkSpec {
  import spark.implicits._

  // lane 'hit': treated (odd users) earn 10.00, control 1.00 — a huge
  // z. Other lanes: arm-symmetric values (z = 0 exactly). The wiggle
  // keys on u/2 so both parity arms see the SAME value multiset —
  // keying on u would leak a systematic arm difference into the nulls.
  private def planted(lanes: Seq[String]) = {
    val rows = lanes.flatMap { lane =>
      (0L until 40L).map { u =>
        val base = if (lane == "hit" && u % 2 == 1) 10.0 else 1.0
        (u, lane, base + (u / 2 % 4) * 0.01)
      }
    }
    rows.toDF("user_id", "event_type", "value")
  }

  test("one true effect among nulls: only it is rejected, at rank 1") {
    val out = Aggregations.benjaminiHochberg(
      planted(Seq("hit", "a", "b", "c", "d"))).collect()
    val byLane = out.map(r => r.getString(0) ->
      (r.getLong(4), r.getBoolean(6))).toMap
    assert(byLane("hit") == ((1L, true)), s"$byLane")
    Seq("a", "b", "c", "d").foreach { l =>
      assert(!byLane(l)._2, s"null lane $l must not reject: $byLane")
    }
  }

  test("step-up property: every rank at or above a rejected rank is rejected") {
    val out = SparkEntry.queries("agg_benjamini_hochberg")(spark, sf001)
      .collect()
    assert(out.length == 5)
    val rej = out.sortBy(_.getLong(4)).map(_.getBoolean(6))
    // rejections form a prefix of the ranking (the step-up definition)
    assert(!rej.dropWhile(identity).contains(true), rej.mkString(","))
    // ladder is attached by rank, descending
    val crit = out.sortBy(_.getLong(4)).map(_.getDouble(5))
    assert(crit.zip(crit.tail).forall { case (a, b) => a >= b })
  }
}
