package graft

import org.apache.spark.sql.Row

/** Semantic pins for dedup_paragraph's kernel
  * ([[operators.Dedup.paragraphDedupDocs]]) on planted fixtures: the
  * oracle chain proves the per-lang rollup hash-matches DuckDB, but
  * only a planted duplicate makes the INTENDED semantics visible —
  * which occurrence survives, and that reassembly preserves the
  * original chunk order of the kept set. */
class ParagraphDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("lang",
      org.apache.spark.sql.functions.lit("en"))
  }

  private def byDoc(rows: (Long, String)*): Map[Long, Row] =
    operators.Dedup.paragraphDedupDocs(docs(rows: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("a chunk shared across docs survives only in the earliest (doc_id, idx)") {
    // doc 1 and doc 2 share the chunk "a b c d e"; doc 1 is earlier,
    // so doc 2 loses it and keeps only its unique tail
    val m = byDoc(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e x y z w v")
    assert(m(1L).getAs[String]("rebuilt") == "a b c d e f g h i j")
    assert(m(1L).getAs[Long]("nc") == 2 && m(1L).getAs[Long]("nk") == 2)
    assert(m(2L).getAs[String]("rebuilt") == "x y z w v")
    assert(m(2L).getAs[Long]("nc") == 2 && m(2L).getAs[Long]("nk") == 1)
  }

  test("reassembly preserves original chunk order around a dropped middle chunk") {
    // doc 4's MIDDLE chunk duplicates doc 3's; the rebuilt doc must be
    // head + tail in order, not tail + head (the order pin the
    // rollup's md5 signature relies on)
    val m = byDoc(
      3L -> "p q r s t",
      4L -> "m n o x y p q r s t u v w z k")
    assert(m(4L).getAs[String]("rebuilt") == "m n o x y u v w z k")
    assert(m(4L).getAs[Long]("nk") == 2)
  }

  test("a doc whose every chunk appeared earlier rebuilds to the empty string") {
    val m = byDoc(
      5L -> "a b c d e",
      6L -> "a b c d e")
    assert(m(6L).getAs[String]("rebuilt") == "")
    assert(m(6L).getAs[Long]("nk") == 0)
  }

  test("an intra-doc repeat also dedups: second occurrence in the SAME doc drops") {
    val m = byDoc(7L -> "a b c d e a b c d e")
    assert(m(7L).getAs[String]("rebuilt") == "a b c d e")
    assert(m(7L).getAs[Long]("nc") == 2 && m(7L).getAs[Long]("nk") == 1)
  }

  test("a short trailing chunk dedups like any other") {
    // trailing chunks are shorter than the chunk width; identical
    // tails must still collide
    val m = byDoc(
      8L -> "a b c d e zz",
      9L -> "f g h i j zz")
    assert(m(9L).getAs[String]("rebuilt") == "f g h i j")
    assert(m(8L).getAs[String]("rebuilt") == "a b c d e zz")
  }
}
