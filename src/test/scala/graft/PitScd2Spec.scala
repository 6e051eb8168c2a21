package graft

import java.sql.Date

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Point-in-time SCD2 join (join_pit_scd2): planted changelog pins
  * every resolution edge — before-first-version, exactly-at-change-day,
  * mid-interval, same-day double change (zero-width version must lose
  * to the same-day successor), and the open current interval. */
class PitScd2Spec extends SparkSpec {
  import spark.implicits._

  // customer 1: LOW @Jan1, HIGH @Jan5 (superseded same day), URGENT
  // @Jan5, URGENT again @Feb1 (run-compressed away), LOW @Mar1
  private val changelog = Seq(
    (1L, 100L, Date.valueOf("2020-01-01"), "LOW"),
    (1L, 101L, Date.valueOf("2020-01-05"), "HIGH"),
    (1L, 102L, Date.valueOf("2020-01-05"), "URGENT"),
    (1L, 103L, Date.valueOf("2020-02-01"), "URGENT"),
    (1L, 104L, Date.valueOf("2020-03-01"), "LOW")
  ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")

  test("scd2Of compresses runs and versions same-day changes in order-key order") {
    val v = Relational.scd2Of(changelog)
      .orderBy("version")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
                 if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(v.toSeq == Seq(
      (1L, "LOW", 20200101L, 20200105L),
      (2L, "HIGH", 20200105L, 20200105L), // zero-width
      (3L, "URGENT", 20200105L, 20200301L),
      (4L, "LOW", 20200301L, -1L)))
  }

  test("pitPriority resolves every temporal edge") {
    val facts = Seq(
      (1L, 20191231L), (1L, 20200101L), (1L, 20200103L),
      (1L, 20200105L), (1L, 20200110L), (1L, 20200301L), (1L, 20200401L)
    ).toDF("o_custkey", "at")
    val got = Relational.pitPriority(Relational.scd2Of(changelog), facts)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(
      20191231L -> "none",   // before the first version
      20200101L -> "LOW",    // at = valid_from matches
      20200103L -> "LOW",
      20200105L -> "URGENT", // same-day tie → highest version
      20200110L -> "URGENT",
      20200301L -> "LOW",    // new version starts on its day
      20200401L -> "LOW"))   // open (current) interval
  }

  test("facts for an unknown entity resolve to none") {
    val facts = Seq((9L, 20200110L)).toDF("o_custkey", "at")
    val got = Relational.pitPriority(Relational.scd2Of(changelog), facts)
      .collect().map(r => r.getString(2))
    assert(got.toSeq == Seq("none"))
  }
}
