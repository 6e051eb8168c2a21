package graft

import org.apache.spark.sql.functions._

/** CCNet-style quality buckets (text_quality_buckets): the oracle pins
  * exact values; these add fixture-level canaries — doc conservation
  * holds on ANY fixture; bucket presence and the strict
  * head > middle > tail mean ordering additionally assume each
  * language has enough score diversity that the 30/70 cuts separate
  * (true at every shipped SF — a degenerate regenerated fixture fails
  * these two with an explicit message, not a lookup error). */
class QualityBucketsSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("text_quality_buckets")(spark, sf001).collect()

  test("buckets partition every language's documents") {
    val perLang = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val expected = Tables.documents(spark, sf001)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.toMap == expected)
  }

  test("every language has head, middle and tail") {
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getString(1)).toSet == Set("head", "middle", "tail"), lang)
    }
  }

  test("bucket mean scores order head > middle > tail in every language") {
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val m = rs.map(r => r.getString(1) -> r.getDouble(4)).toMap
      assert(Seq("head", "middle", "tail").forall(m.contains),
        s"$lang is missing a bucket (degenerate score distribution): $m")
      assert(m("head") > m("middle") && m("middle") > m("tail"), s"$lang: $m")
    }
  }
}
