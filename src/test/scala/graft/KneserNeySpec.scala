package graft

import graft.operators.TextOps

/** Interpolated Kneser-Ney bigram LM (text_kneser_ney): the oracle pins
  * exact fixture values; these pin a fully hand-computed tiny corpus
  * and the KN signature — continuation counts, not raw frequency,
  * drive the backoff mass. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private def scores(docs: Seq[(Long, String, String)]): Map[Long, (Long, Double)] =
    TextOps.knScores(docs.map { case (i, l, t) => (i, l, t) }
        .toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap

  test("hand-computed corpus: 'a b a b' scores the exact KN chain") {
    // c2(a,b)=2 c2(b,a)=1; hist a:(ch 2,nfo 1) b:(ch 1,nfo 1);
    // cont a:1 b:1; N1+(..)=2
    // P(b|a) = (2-.75)/2 + (.75*1/2)*(1/2) = 0.8125
    // P(a|b) = (1-.75)/1 + (.75*1/1)*(1/2) = 0.625
    val m = scores(Seq((1L, "en", "a b a b")))
    val (n, lp) = m(1L)
    assert(n == 3L)
    val expected = (2 * math.log(0.8125) + math.log(0.625)) / 3
    val pinned = math.floor(expected * 1e4 + 0.5) / 1e4
    assert(lp == pinned, s"got $lp want $pinned")
  }

  test("continuation counts beat raw frequency: many-history word outscores one-history word") {
    // 'common' follows 5 distinct histories, 'rare' follows 2; the
    // probe bigrams (u,common) and (v,rare) have IDENTICAL c2/ch/nfo,
    // so only the continuation term separates them — the property
    // Jelinek-Mercer unigram backoff (text_bigram_lm) cannot express
    val corpus = Seq(
      (1L, "en", "p common q common r common s common"),
      (2L, "en", "t rare t rare t rare t rare"),
      (10L, "en", "u common"),
      (11L, "en", "v rare"))
    val m = scores(corpus)
    assert(m(10L)._2 > m(11L)._2, s"$m")
  }

  test("fixture agrees with the JM model on ordering direction but not values") {
    val kn = SparkEntry.queries("text_kneser_ney")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val jm = SparkEntry.queries("text_bigram_lm")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(kn.keySet == jm.keySet)
    // same corpus, same bigrams: the two smoothers must correlate
    // strongly (rank the same docs low/high) without being identical
    val ids = kn.keySet.toSeq.sorted
    val (a, b) = (ids.map(kn), ids.map(jm))
    val (ma, mb) = (a.sum / a.size, b.sum / b.size)
    val cov = ids.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
    val r = cov / math.sqrt(
      ids.indices.map(i => math.pow(a(i) - ma, 2)).sum *
      ids.indices.map(i => math.pow(b(i) - mb, 2)).sum)
    assert(r > 0.8, s"pearson=$r")
    assert(ids.exists(i => kn(i) != jm(i)))
  }
}
