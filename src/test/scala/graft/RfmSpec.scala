package graft

import org.apache.spark.sql.functions._

/** RFM segmentation (events_rfm): the oracle pins exact values; these
  * properties pin the invariants that survive any fixture — user
  * conservation, score ranges, and monetary conservation in exact
  * floor-cents. */
class RfmSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("events_rfm")(spark, sf001).collect()

  test("every user lands in exactly one segment") {
    val n = rows.map(_.getLong(3)).sum
    val users = Tables.events(spark, sf001)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(n == users, s"segments hold $n users, corpus has $users")
  }

  test("all scores are quintile indexes in 1..5") {
    rows.foreach { r =>
      (0 to 2).foreach { i =>
        val s = r.getLong(i)
        assert(s >= 1 && s <= 5, s"score out of range: $r")
      }
    }
  }

  test("monetary conserves the corpus floor-cents total") {
    val seg = rows.map(_.getLong(4)).sum
    val total = Tables.events(spark, sf001)
      .select(sum(floor(col("value") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(seg == total, s"segment cents $seg != corpus cents $total")
  }
}
