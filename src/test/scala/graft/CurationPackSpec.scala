package graft

import org.apache.spark.sql.functions._

/** The round-17 curation trio: the DP count release (dq_dp_noise),
  * global sequence packing (sample_pack_chunks), and the HTML
  * boilerplate stripper (text_html_strip). The oracle replays each
  * end-to-end; these pin the properties a hash match can't state —
  * release determinism, the prefix-sum decomposition law against an
  * independent Scala simulation, and the stripper's behavior on
  * adversarial markup the fixture never produces. */
class CurationPackSpec extends SparkSpec {

  // ---- dq_dp_noise ----

  test("dq_dp_noise: the release is deterministic and never exposes the true count") {
    val q = SparkEntry.queries("dq_dp_noise")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.toSeq == b.toSeq, "re-running the release must not redraw noise")
    assert(a.nonEmpty)
    // released schema is exactly (key, epsilon, noisy_count)
    assert(q(spark, sf001).columns.toSeq ==
      Seq("c_nationkey", "epsilon", "noisy_count"))
    assert(a.forall(_.getDouble(1) == operators.Relational.DpEpsilon))
  }

  test("dq_dp_noise: noise is real, bounded-tailed Laplace around the true counts") {
    val released = SparkEntry.queries("dq_dp_noise")(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val truth = Tables.customer(spark, sf001)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(released.keySet == truth.keySet)
    val noises = released.map { case (k, v) => v - truth(k) }
    // noise actually perturbs (not the identity release)...
    assert(noises.count(math.abs(_) > 1e-9) >= noises.size - 1)
    // ...is two-sided...
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
    // ...and at b = 1/ε = 2 the 1-in-a-million tail is |x| ≈ 2·ln(5e5)
    assert(noises.forall(n => math.abs(n) < 2.0 / operators.Relational.DpEpsilon * 14))
  }

  test("dq_dp_sum: clamping bounds the release's sensitivity; noise is independent of dq_dp_noise") {
    val rows = SparkEntry.queries("dq_dp_sum")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val clampHi = operators.Relational.DpClampHi
    val b = clampHi / operators.Relational.DpEpsilon
    // per-nation clamped sums recomputed independently
    val truth = Tables.customer(spark, sf001)
      .groupBy("c_nationkey")
      .agg(sum(least(greatest(col("c_acctbal"), lit(0.0)), lit(clampHi))
        .cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(2) == clampHi)
      val noise = r.getDouble(3) - truth(r.getInt(0))
      assert(math.abs(noise) < b * 14, s"tail bound: $noise")
    }
    // the two releases draw DIFFERENT noise (distinct seed prefixes) —
    // composing them must not reuse randomness
    val counts = SparkEntry.queries("dq_dp_noise")(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val nTruth = Tables.customer(spark, sf001)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val reused = rows.count { r =>
      val k = r.getInt(0)
      // normalize each noise by its Laplace scale: a reused uniform
      // draw would make the normalized values coincide
      val nSum = (r.getDouble(3) - truth(k)) / b
      val nCnt = (counts(k) - nTruth(k)) * operators.Relational.DpEpsilon
      math.abs(nSum - nCnt) < 1e-6
    }
    assert(reused < rows.length, "noise draws must differ between releases")
  }

  test("dq_dp_quantile: selection stays on the fixed grid, is key-stable, and tracks the median at large epsilon") {
    val q = SparkEntry.queries("dq_dp_quantile")
    val a = q(spark, sf001).collect()
    assert(a.toSeq == q(spark, sf001).collect().toSeq, "selection must be key-stable")
    val grid = operators.Relational.DpQuantileGrid.toSet
    a.foreach(r => assert(grid.contains(r.getDouble(2)),
      s"released ${r.getDouble(2)} is not a fixed candidate"))
    // utility sanity at sf0.01 (bigger per-nation groups): the
    // selected candidate's rank distance from n/2 is bounded by the
    // exponential mechanism's tail — at eps=0.5 and 22 candidates a
    // 60-rank excess has probability < 22*exp(-15) per nation
    val sel = q(spark, sf01).collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val ranks = Tables.customer(spark, sf01)
      .select(col("c_nationkey"), col("c_acctbal")).collect()
      .groupBy(_.getInt(0))
    sel.foreach { case (nation, cand) =>
      val bals = ranks(nation).map(_.getDouble(1)).sorted
      val rk = bals.count(_ <= cand)
      val bestDist = operators.Relational.DpQuantileGrid
        .map(c => math.abs(bals.count(_ <= c) - bals.length / 2.0)).min
      assert(math.abs(rk - bals.length / 2.0) <= bestDist + 60.0,
        s"nation $nation released rank $rk of ${bals.length}")
    }
  }

  // ---- sample_pack_chunks ----

  test("sample_pack_chunks: the two-level prefix sum equals a sequential Scala pack") {
    val row = SparkEntry.queries("sample_pack_chunks")(spark, sf001).collect()(0)
    val C = operators.Relational.PackCtxTokens.toLong
    // independent simulation: sort by doc_id, walk the token stream
    val lens = Tables.documents(spark, sf001)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var off = 0L; var straddle = 0L; var maxSpan = 0L
    lens.foreach { case (_, n) =>
      val first = off / C; val last = (off + n - 1) / C
      if (first != last) straddle += 1
      maxSpan = math.max(maxSpan, last - first + 1)
      off += n
    }
    val total = off
    assert(row.getLong(0) == lens.length, "n_docs")
    assert(row.getLong(1) == total, "total_tokens")
    assert(row.getLong(2) == (total + C - 1) / C, "n_chunks")
    assert(row.getLong(3) == straddle, "n_straddling")
    assert(row.getLong(4) == maxSpan, "max_doc_span")
    val fill = total.toDouble / (row.getLong(2) * C)
    assert(math.abs(row.getDouble(5) - fill) < 1e-6, "fill_factor")
    assert(row.getDouble(5) <= 1.0 && row.getDouble(5) > 0.0)
  }

  test("sample_pack_chunks: the only global window runs over the bounded bucket table") {
    val p = SparkEntry.queries("sample_pack_chunks")(spark, sf001)
      .queryExecution.executedPlan.toString
    // exactly one unpartitioned window (the ≤ PackChunkBuckets offset
    // table); the per-doc cumsum windows all carry a partition key
    assert(p.contains("bucket"), p.take(2000))
    val globalWindows = "windowspecdefinition\\(([a-z_#0-9]+ ASC)".r
      .findAllIn(p).size
    assert(globalWindows <= 1, s"expected at most one global window:\n${p.take(4000)}")
  }

  // ---- text_html_strip ----

  test("text_html_strip: every fixture doc extracts its exact payload") {
    val rows = SparkEntry.queries("text_html_strip")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"lang ${r.getString(0)}: " +
        s"${r.getLong(1)} docs but only ${r.getLong(2)} clean extractions")
      val ratio = r.getDouble(4)
      assert(ratio > 0.0 && ratio < 1.0, s"markup ratio $ratio")
    }
  }

  test("htmlStripped survives adversarial markup the fixture never produces") {
    import spark.implicits._
    val cases = Seq(
      // script body containing literal tags and a comparison
      ("<p>keep</p><script>if (a<b) { x.write(\"<div>no</div>\") }</script><p>this</p>",
       "keep this"),
      // multi-line style block
      ("<style>\np { margin: 0 }\nh1 { color: red }\n</style><b>bold</b> text",
       "bold text"),
      // attribute-laden tags, self-closing, uppercase
      ("<A HREF=\"/x\" data-k='v'>link</A> and <img src='y.png'/> tail",
       "link and tail"),
      // whitespace soup collapses
      ("<div>  a\n\n b\t\tc  </div>", "a b c"),
      // empty page
      ("<html><body></body></html>", ""))
    val got = cases.toDF("page", "want")
      .select(operators.TextOps.htmlStripped(col("page")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got '${r.getString(0)}' want '${r.getString(1)}'"))
  }
}
