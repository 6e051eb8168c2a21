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

  private def positions(keys: Seq[String]): Seq[Int] =
    keys.map(k => 99999999 - k.drop(32).toInt).sorted

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

  test("fingerprint density is bounded by the window count") {
    val d = TextOps.winnowOf(Tables.documents(spark, sf001))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
              greatest(col("n_grams") - TextOps.WinnowW + 1, lit(1)).as("n_win"))
      .where(col("n_fp") > col("n_win"))
    assert(d.count() == 0, "more fingerprints than windows")
  }
}
