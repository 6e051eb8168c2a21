package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** text_bpe_encode pins: hand-derived greedy encodes on planted words
  * (including the compound-merge and overlap cases that distinguish
  * canonical BPE greedy from naive pair deletion), the zero-merge
  * identity, and corpus-level sanity (merges actually fire; the ratio
  * is the two sums' quotient). The cross-engine value check is the
  * DuckDB oracle, which unrolls the identical merge list. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(ws: String*): Seq[String] =
    ws.toDF("w").select(TextOps.bpeEncode(col("w")).as("e"))
      .collect().map(_.getString(0)).toSeq

  test("planted words encode to the hand-derived symbol sequences") {
    // "the": th→A gives "Ae", Ae→B gives "B" (a full compound merge)
    // "thin": th→A "Ain", in→C "AC"
    // "thing": th→A "Aing", in→C "ACg", Cg→H "AH"
    // "rent": re→G "Gnt" — and NOT en→J (re outranks en; priority
    //   order is load-bearing, the canonical BPE property)
    assert(enc("the", "thin", "thing", "rent") ==
      Seq("B", "AC", "AH", "Gnt"))
  }

  test("greedy overlap: left-to-right non-overlapping, like canonical BPE") {
    // "ananas" = a·n·a·n·a·s; an→E merges positions 0-1 and 2-3 but
    // not the overlapping 1-2/3-4 pairs → E·E·a·s
    // "ththe": th→A at 0-1 and 2-3 → "AAe"; Ae→B needs A then e —
    // present at the tail → "AB"
    assert(enc("ananas", "ththe") == Seq("EEas", "AB"))
  }

  test("zero merges is the identity; merge-free words pass through") {
    // a word touching none of the patterns survives every REPLACE
    assert(enc("zq", "xyz", "") == Seq("zq", "xyz", ""))
  }

  test("train learns hand-derivable merges, including one that only exists post-merge") {
    // corpus: "aab"×5, "cd"×2.
    // round 1: pairs aa=5, ab=5 — tie breaks lexicographic → "aa"
    //   wins, mint X rewrites aab→Xb
    // round 2: winner "Xb"(5) — a pair that did NOT EXIST before
    //   round 1 merged (the compound-learning property a one-shot
    //   pair count cannot produce)
    // round 3: only "cd"(2) remains
    val docs = Seq("aab aab aab aab aab cd cd").toDF("text")
    val got = TextOps.bpeTrainOf(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "aa", 5L), (2, "Xb", 5L), (3, "cd", 2L)), got)
  }

  test("corpus totals: merges fire and compression is the sums' quotient") {
    val rows = SparkEntry.queries("text_bpe_encode")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pre, post, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(post < pre, s"${r.getString(0)}: no merge fired ($pre -> $post)")
      assert(math.abs(ratio - pre.toDouble / post) < 1e-4,
        s"${r.getString(0)}: ratio $ratio != $pre/$post")
    }
  }
}
