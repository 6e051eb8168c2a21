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

  private def bySub(rows: (Long, String)*): Map[Long, Row] =
    operators.Dedup.substringDedupDocs(docs(rows: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("substring dedup catches a chunk-boundary-straddling duplicated span") {
    // doc 11 repeats doc 10's tokens c..j — an 8-token span that sits
    // at positions 3..10, straddling every 5-word chunk boundary, so
    // paragraphDedupDocs keeps ALL of doc 11's chunks (no 5-word chunk
    // repeats verbatim) while the sliding window must drop the span
    val ten = "a b c d e f g h i j k l m n o"
    val eleven = "x y z c d e f g h i j w q r s"
    val para = byDoc(10L -> ten, 11L -> eleven)
    assert(para(11L).getAs[Long]("nk") == para(11L).getAs[Long]("nc"),
      "chunk dedup is expected to MISS the straddling span")
    val sub = bySub(10L -> ten, 11L -> eleven)
    assert(sub(10L).getAs[Long]("n_covered") == 0)
    assert(sub(11L).getAs[Long]("n_dup_windows") == 1)
    assert(sub(11L).getAs[Long]("n_covered") == 8)
    // kept = the two flanks, merged spans on each side of the drop
    assert(sub(11L).getAs[String]("kept") == "x y z w q r s")
    assert(sub(11L).getAs[Long]("n_spans") == 2)
  }

  test("substring dedup merges adjacent kept runs and counts spans per gap") {
    // doc 13 duplicates TWO separate spans of doc 12: kept tokens form
    // three islands (head, middle, tail) — span counting must see the
    // merge, and overlapping dup windows must union their coverage
    val twelve = "a b c d e f g h i j k l m n o p q r s t"
    val thirteen = "h1 h2 a b c d e f g h i m1 m2 m3 k l m n o p q r t1 t2"
    val sub = bySub(12L -> twelve, 13L -> thirteen)
    // dup windows: "a..h" and "b..i" (starts 2, 3 — coverage union
    // 2..10) plus "k..r" (start 14, coverage 14..21)
    assert(sub(13L).getAs[Long]("n_dup_windows") == 3)
    assert(sub(13L).getAs[String]("kept") == "h1 h2 m1 m2 m3 t1 t2")
    assert(sub(13L).getAs[Long]("n_spans") == 3)
    assert(sub(13L).getAs[Long]("n_covered") == 17)
  }

  test("substring dedup: an exact duplicate doc is fully covered, zero spans") {
    val sub = bySub(
      14L -> "a b c d e f g h i j",
      15L -> "a b c d e f g h i j")
    assert(sub(14L).getAs[Long]("n_covered") == 0)
    assert(sub(15L).getAs[Long]("n_covered") == 10)
    assert(sub(15L).getAs[String]("kept") == "")
    assert(sub(15L).getAs[Long]("n_spans") == 0)
    // docs shorter than the window have no windows and keep everything
    val short = bySub(16L -> "a b c", 17L -> "a b c")
    assert(short(17L).getAs[Long]("n_windows") == 0)
    assert(short(17L).getAs[Long]("n_covered") == 0)
    assert(short(17L).getAs[String]("kept") == "a b c")
  }
}
