package graft

import graft.operators.TextOps

/** BM25 scoring (text_bm25): the oracle replays the fixture; these
  * pin the two properties that distinguish BM25 from plain tf-idf. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)]): Map[Long, Double] =
    TextOps.bm25Of(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("tf saturates: 10x term repetitions gain far less than 10x score") {
    // query = 'x'; docs repeat it 1 vs 10 times at EQUAL length
    val pad9 = Seq.fill(9)("z").mkString(" ")
    val s = scores(Seq(
      (0L, "x"),
      (1L, "x " + pad9),
      (2L, Seq.fill(10)("x").mkString(" ")),
      (3L, Seq.fill(10)("w").mkString(" ")))) // matchless, absent from output
    assert(!s.contains(3L))
    assert(s(2L) > s(1L), "more occurrences must score higher")
    assert(s(2L) < s(1L) * 3.0,
      s"k1 saturation should cap the gain: ${s(1L)} -> ${s(2L)}")
  }

  test("length normalization: same tf in a longer doc scores lower") {
    val s = scores(Seq(
      (0L, "x"),
      (1L, "x " + Seq.fill(4)("z").mkString(" ")),
      (2L, "x " + Seq.fill(40)("z").mkString(" "))))
    assert(s(1L) > s(2L), s"short doc must win: $s")
  }

  test("fixture query: 10 ranked docs, scores positive non-increasing") {
    val out = SparkEntry.queries("text_bm25")(spark, sf001).collect()
    assert(out.length == 10)
    val bs = out.map(_.getDouble(2))
    assert(bs.forall(_ > 0.0))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
  }
}
