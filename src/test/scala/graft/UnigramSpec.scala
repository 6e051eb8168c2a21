package graft

import graft.operators.TextOps

/** Unigram-LM Viterbi tokenizer (text_unigram): the oracle replays the
  * identical DP; this spec is the INDEPENDENT check — an exhaustive
  * brute-force segmentation search over a planted corpus, with the
  * vocab/score recipe re-derived from scratch in test code. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "abcd abcd ab cd cd"),
    (2L, "en", "abc bc bc bcd q"),
    (3L, "fr", "xy xyz zz xy"))

  // -- independent reimplementation of the vocab recipe --
  private def wordCounts: Map[String, Long] =
    docs.flatMap(_._3.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def scoreMap: Map[String, Double] = {
    val wc = wordCounts
    def gramsK(k: Int): Map[String, Long] =
      wc.toSeq.flatMap { case (w, c) =>
        (0 to w.length - k).map(i => w.substring(i, i + k) -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val multi = (2 to TextOps.WpMaxPiece).map(gramsK).reduce { (a, b) =>
      (a.keySet ++ b.keySet).map(g => g -> (a.getOrElse(g, 0L) + b.getOrElse(g, 0L))).toMap
    }
    val top = multi.toSeq.sortBy { case (g, f) => (-f, g) }
      .take(TextOps.WpVocabNgrams)
    val alpha = gramsK(1)
    val entries = top ++ alpha.toSeq
    val total = entries.map(_._2).sum.toDouble
    entries.map { case (g, f) => g -> Tables.round6(math.log(f / total)) }.toMap
  }

  /** Exhaustive best score over all segmentations into vocab pieces of
    * length <= 4, plus the SET of piece counts achieving it. */
  private def bruteBest(w: String, vs: Map[String, Double]): (Double, Set[Int]) = {
    def rec(i: Int): Seq[(Double, Int)] =
      if (i == w.length) Seq((0.0, 0))
      else (1 to math.min(4, w.length - i)).flatMap { j =>
        vs.get(w.substring(i, i + j)).toSeq.flatMap(s =>
          rec(i + j).map { case (sc, np) => (s + sc, np + 1) })
      }
    val all = rec(0)
    val best = all.map(_._1).max
    (best, all.filter(_._1 >= best - 1e-9).map(_._2).toSet)
  }

  private lazy val out = {
    val dir = Tables.scratch(sf001, "unigram_spec")
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("text_unigram")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
  }

  test("DP score equals the exhaustive-search optimum per language") {
    val vs = scoreMap
    val wc = wordCounts
    val perLang = docs.groupBy(_._2).map { case (lang, ds) =>
      val ws = ds.flatMap(_._3.split(" "))
      val sum = ws.map(w => bruteBest(w, vs)._1).sum
      lang -> Tables.round6(sum) / ws.size
    }
    perLang.foreach { case (lang, want) =>
      val got = out(lang)._3
      assert(math.abs(got - want) < 1e-3, s"$lang: dp=$got brute=$want")
    }
    assert(out.keySet == Set("en", "fr"))
  }

  test("piece counts are achievable by an optimal segmentation") {
    val vs = scoreMap
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val ws = ds.flatMap(_._3.split(" "))
      val feasible = ws.map(w => bruteBest(w, vs)._2)
      val lo = feasible.map(_.min).sum
      val hi = feasible.map(_.max).sum
      val got = out(lang)._2
      assert(got >= lo && got <= hi, s"$lang: n_pieces=$got not in [$lo,$hi]")
      assert(out(lang)._1 == ws.size.toLong)
    }
  }

  test("multi-char pieces actually fire (compression beats char-split)") {
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val nChars = ds.flatMap(_._3.split(" ")).map(_.length).sum
      assert(out(lang)._2 < nChars, s"$lang segmented to single chars only")
    }
  }
}
