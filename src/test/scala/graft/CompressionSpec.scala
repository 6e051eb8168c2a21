package graft

import graft.functions.DeflateLenImpl
import graft.operators.TextOps

/** Compressibility quality signal (text_compression_ratio): the one
  * deliberately oracle-free text op (DuckDB carries no DEFLATE) — the
  * kernel and the gate are pinned here instead. */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  test("the kernel is deterministic, bounded, and ranks repetition below diversity") {
    val rep = (Seq.fill(100)("data").mkString(" ")).getBytes("UTF-8")
    val div = (0 until 100).map(i => s"w${i * 37 % 101}x$i").mkString(" ").getBytes("UTF-8")
    assert(DeflateLenImpl.len(rep) == DeflateLenImpl.len(rep))
    val rRep = DeflateLenImpl.len(rep).toDouble / rep.length
    val rDiv = DeflateLenImpl.len(div).toDouble / div.length
    assert(rRep < rDiv * 0.3, s"repetitive $rRep vs diverse $rDiv")
    // deflate's worst case stays within the kernel's buffer bound
    assert(DeflateLenImpl.len(div) <= div.length + (div.length >> 11) + 16)
    assert(DeflateLenImpl.len(Array.emptyByteArray) >= 0L)
  }

  test("a planted repetitive doc is flagged; a diverse one is not") {
    val docs = Seq(
      (1L, "en", Seq.fill(80)("spam").mkString(" ")),
      (2L, "en", (0 until 80).map(i => s"t${i * 53 % 97}q$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val r = TextOps.compressionRatio(docs).collect()(0)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(4) == 1L, s"exactly the repetitive doc flags: $r")
    assert(r.getDouble(3) < TextOps.CompressionFlagRatio)
  }

  test("fixture query: five langs, ratios in (0, 1.2), a nonzero flagged tail") {
    val out = SparkEntry.queries("text_compression_ratio")(spark, sf001).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.2)
      assert(r.getDouble(3) <= r.getDouble(2))
    }
    assert(out.map(_.getLong(4)).sum > 0, "thresholds should flag some docs")
  }
}
