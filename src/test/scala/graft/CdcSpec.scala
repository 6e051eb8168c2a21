package graft

import graft.operators.Dedup

/** Content-defined chunking (dedup_cdc_chunks): the oracle re-derives
  * the chunks set-based; these pin the boundary rule and the property
  * that justifies CDC over fixed-width chunking — insertion robustness. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // deterministic word pools split by the shipped boundary rule
  private val pool = (0 until 200).map(i => s"w$i")
  private val bWords = pool.filter(Dedup.cdcIsBoundary)
  private val nWords = pool.filterNot(Dedup.cdcIsBoundary)

  test("the boundary rule actually splits the pool (expected ~1/CdcMod)") {
    val frac = bWords.size.toDouble / pool.size
    assert(frac > 0.03 && frac < 0.30, s"boundary fraction $frac")
  }

  test("boundary tokens end chunks: a doc with two boundaries yields three chunks") {
    // [n n B] [n B] [n n]  — trailing tokens form the tail chunk
    val doc = Seq(nWords(0), nWords(1), bWords(0), nWords(2), bWords(1),
                  nWords(3), nWords(4)).mkString(" ")
    val out = Dedup.cdcDedupDocs(Seq((1L, "en", doc))
      .toDF("doc_id", "lang", "text")).collect()(0)
    assert(out.getLong(2) == 3L, s"nc=${out.getLong(2)}")
    assert(out.getString(4) == doc) // nothing deduped, rebuilt = original
  }

  test("insertion robustness: CDC re-aligns where the fixed-width chunker cannot") {
    // doc A: distinct tokens with interior boundaries; doc B = one
    // inserted token + A verbatim. CDC chunks after B's first boundary
    // realign with A's → duplicate chunks found. The fixed 5-token
    // grid shifts by one → every chunk differs → finds nothing.
    val a = Seq(nWords(10), nWords(11), bWords(2), nWords(12), nWords(13),
                nWords(14), bWords(3), nWords(15), nWords(16), nWords(17),
                bWords(4), nWords(18), nWords(19)).mkString(" ")
    val docs = Seq((1L, "en", a), (2L, "en", nWords(20) + " " + a))
      .toDF("doc_id", "lang", "text")
    val cdc = Dedup.cdcDedupDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (nc2, nk2) = cdc(2L)
    assert(nk2 < nc2, s"CDC must find re-aligned duplicate chunks: $cdc")
    val fixed = Dedup.paragraphDedupDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (fc2, fk2) = fixed(2L)
    assert(fk2 == fc2,
      s"the fixed-width chunker must miss the shifted duplicates: $fixed")
  }

  test("fixture query: chunk counts positive, kept <= total per lang") {
    val out = SparkEntry.queries("dedup_cdc_chunks")(spark, sf001).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) <= r.getLong(2))
    }
  }
}
