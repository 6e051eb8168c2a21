package graft

import org.apache.spark.sql.functions._

/** First-occurrence n-gram novelty (text_novelty): oracle pins fixture
  * values; this plants copies at known overlap and pins the metric's
  * defining cases through the same query path over a scratch table. */
class NoveltySpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    val a = (1 to 16).map(i => s"w$i").mkString(" ")      // 16 tokens
    val fresh = (1 to 16).map(i => s"x$i").mkString(" ")
    val half = ((1 to 8).map(i => s"w$i") ++ (1 to 8).map(i => s"y$i")).mkString(" ")
    val docs = Seq(
      (1L, "en", a),     // original: every gram first-seen
      (2L, "en", a),     // verbatim copy: zero novelty
      (3L, "en", half),  // prefix copied from doc 1, suffix fresh
      (4L, "en", fresh)  // all fresh
    ).toDF("doc_id", "lang", "text")
    val dir = Tables.scratch(sf001, "novelty_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("text_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
  }

  test("an original document is fully novel, its verbatim copy fully stale") {
    assert(rows(1L) == ((9L, 9L, 1.0)), rows)   // 16 tokens → 9 distinct 8-grams
    assert(rows(2L) == ((9L, 0L, 0.0)), rows)
    assert(rows(4L)._3 == 1.0, rows)
  }

  test("a half-copied document scores strictly between") {
    val (n, novel, score) = rows(3L)
    assert(n == 9L, rows)
    // only the fully-inside-the-copied-prefix gram (the first) is stale
    assert(novel == 8L && score > 0.0 && score < 1.0, rows)
  }
}
