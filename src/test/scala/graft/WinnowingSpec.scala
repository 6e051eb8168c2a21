package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (text_winnowing): the SIGMOD'03 guarantee —
  * any shared token run of length ≥ k + w - 1 yields a shared
  * fingerprint — and the rightmost-min tie rule, decoded from the
  * position suffix of the selected keys. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]): Map[Long, Seq[String]] =
    TextOps.winnowOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2))
      .toMap

  private def positions(keys: Seq[String]): Seq[Long] =
    keys.map(k => TextOps.WinnowPosMax - k.drop(32).toLong).sorted

  private def hashes(keys: Seq[String]): Set[String] = keys.map(_.take(32)).toSet

  test("a shared run of k+w-1 tokens guarantees a shared fingerprint") {
    // k=3, w=4 → guarantee threshold 6; the shared run sits in
    // different contexts and offsets in the two docs
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = fps(Seq(
      1L -> s"one two $shared three four five",
      2L -> s"red orange yellow green blue $shared"))
    assert(hashes(d(1L)).intersect(hashes(d(2L))).nonEmpty,
      "no shared fingerprint for a 6-token shared run")
  }

  test("all-equal grams select the RIGHTMOST position of each window") {
    // 8 identical tokens → 6 identical 3-gram hashes, windows start at
    // pos 0..2; rightmost-min selects pos w-1 .. n_grams-1
    val d = fps(Seq(1L -> "x x x x x x x x"))
    assert(positions(d(1L)) == Seq(3, 4, 5))
  }

  test("short docs (< w grams) yield exactly one fingerprint") {
    val d = fps(Seq(1L -> "just four tokens here", 2L -> "tiny"))
    assert(d(1L).length == 1 && d(2L).length == 1)
  }

  test("all-equal grams select the RIGHTMOST position (12-digit pad keeps order)") {
    // the widened pad must preserve the inverted-position ordering for
    // positions near zero (the boundary the old 8-digit pad handled)
    val d = fps(Seq(1L -> "y y y y y y y"))
    assert(positions(d(1L)) == Seq(3L, 4L))
  }

  // ---- cross-doc pair matching (text_winnow_pairs) ----

  private def pairs(docs: Seq[(Long, String)], minShared: Int): Set[(Long, Long, Long)] =
    TextOps.winnowPairs(docs.toDF("doc_id", "text"), minShared, TextOps.MaxWinnowFpDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("a planted shared paragraph is detected as a pair ACROSS documents") {
    // the k+w-1 guarantee end-to-end through the posting join: the
    // shared 6-token run sits at different offsets in unrelated
    // contexts; doc 3 uses a fully disjoint vocabulary (negative
    // control — zero shared fingerprints, so NO pair touches it)
    val shared = "alpha beta gamma delta epsilon zeta"
    val p = pairs(Seq(
      1L -> s"one two $shared three four five",
      2L -> s"red orange yellow green blue $shared",
      3L -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed"),
      minShared = 1)
    assert(p.exists(t => t._1 == 1L && t._2 == 2L),
      s"shared-paragraph pair (1,2) not detected: $p")
    assert(!p.exists(t => t._1 == 3L || t._2 == 3L),
      s"disjoint-vocabulary doc 3 matched something: $p")
  }

  test("identical documents share their entire fingerprint sketch") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val full = TextOps.winnowPairs(
        Seq(1L -> text, 2L -> text).toDF("doc_id", "text"),
        1, TextOps.MaxWinnowFpDf)
      .collect().head
    assert(full.getLong(0) == 1L && full.getLong(1) == 2L)
    assert(full.getLong(2) == full.getLong(3) && full.getLong(2) == full.getLong(4),
      s"exact duplicates must share ALL fingerprints: $full")
  }

  test("boilerplate fingerprints (df over the cap) never form pairs") {
    // five identical docs: every fingerprint has df = 5 exactly (no
    // boundary windows — the whole doc is the boilerplate). With the
    // cap below 5 every posting drops and no pair survives (the
    // stop-shingle rule); at the shipped cap all C(5,2) pairs appear.
    val text = "standard license header apache version two zero granted"
    val docs = (1L to 5L).map(i => i -> text)
    val capped = TextOps.winnowPairs(docs.toDF("doc_id", "text"), 1, 4)
    assert(capped.count() == 0,
      "over-cap boilerplate fingerprints still formed pairs")
    val uncapped = TextOps.winnowPairs(
      docs.toDF("doc_id", "text"), 1, TextOps.MaxWinnowFpDf)
    assert(uncapped.count() == 10L, "below-cap identical docs should all pair")
  }

  test("fingerprint density is bounded by the window count") {
    val d = TextOps.winnowOf(Tables.documents(spark, sf001))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
              greatest(col("n_grams") - TextOps.WinnowW + 1, lit(1)).as("n_win"))
      .where(col("n_fp") > col("n_win"))
    assert(d.count() == 0, "more fingerprints than windows")
  }

  test("winnow clusters close transitively: A~B and B~C land one cluster without an A~C pair") {
    // doc 1 shares paragraph P with doc 2; doc 2 shares a DIFFERENT
    // paragraph Q with doc 4; docs 1 and 4 share nothing directly —
    // the cluster must still unite {1, 2, 4} (min id 1), with the
    // disjoint-vocabulary doc 9 absent entirely
    val pp = "alpha beta gamma delta epsilon zeta"
    val qq = "omicron sigma tau upsilon phi chi"
    val docs = Seq(
      1L -> s"one two $pp three four five",
      2L -> s"red orange $pp yellow $qq green blue",
      4L -> s"six seven eight $qq nine ten",
      9L -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
      .toDF("doc_id", "text")
    val pairEdges = TextOps.winnowPairs(docs, 1, TextOps.MaxWinnowFpDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairEdges.contains((1L, 4L)),
      s"planted paragraphs must NOT pair 1-4 directly: $pairEdges")
    val clusters = graft.operators.Dedup.connectedComponents(
        TextOps.winnowPairs(docs, 1, TextOps.MaxWinnowFpDf).select("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 4L -> 1L),
      s"expected one {1,2,4} cluster rooted at 1, got $clusters")
  }
}
