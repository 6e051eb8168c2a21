package graft

import graft.operators.TextOps

/** Lexicon blocklist gate (text_lexicon_filter): the oracle replays the
  * fixture; these plant docs with known category loads and pin the
  * gate order and the exact integer thresholds. */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(docs: Seq[(Long, String)]): Map[Long, String] =
    TextOps.lexiconFilter(
      docs.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap

  test("each category gates at its own threshold; first breach wins") {
    val filler = Seq.fill(95)("data").mkString(" ")
    val v = verdicts(Seq(
      // 100 tokens, 5 'slow' = 5% > 4% → latency
      (1L, Seq.fill(5)("slow").mkString(" ") + " " + filler),
      // 100 tokens, 9 'big' = 9% > 8% → size
      (2L, Seq.fill(9)("big").mkString(" ") + " " + Seq.fill(91)("data").mkString(" ")),
      // 100 tokens, 8 'spark' = 8% > 7% → infra
      (3L, Seq.fill(8)("spark").mkString(" ") + " " + Seq.fill(92)("data").mkString(" ")),
      // exactly AT each threshold → kept (strict inequality)
      (4L, Seq.fill(4)("slow").mkString(" ") + " " + Seq.fill(8)("big").mkString(" ") +
           " " + Seq.fill(7)("spark").mkString(" ") + " " +
           Seq.fill(81)("data").mkString(" ")),
      // breaches latency AND size: latency declared first, wins
      (5L, Seq.fill(5)("slow").mkString(" ") + " " + Seq.fill(9)("big").mkString(" ") +
           " " + Seq.fill(86)("data").mkString(" "))))
    assert(v(1L) == "latency" && v(2L) == "size" && v(3L) == "infra")
    assert(v(4L) == "ok", s"at-threshold doc must pass: ${v(4L)}")
    assert(v(5L) == "latency")
  }

  test("fixture query: every doc scored, verdicts mixed") {
    val out = SparkEntry.queries("text_lexicon_filter")(spark, sf001).collect()
    assert(out.length == 500)
    val vs = out.map(_.getString(6)).distinct.toSet
    assert(vs.contains("ok") && vs.size >= 2,
      s"thresholds should split the fixture: $vs")
  }
}
