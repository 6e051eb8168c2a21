package graft

import org.apache.spark.sql.functions._

/** CCNet-style quality buckets (text_quality_buckets): the oracle pins
  * exact values; these invariants survive any fixture — per-language
  * doc conservation, all three buckets populated, and strict score
  * ordering head > middle > tail within every language. */
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
      assert(m("head") > m("middle") && m("middle") > m("tail"), s"$lang: $m")
    }
  }
}
