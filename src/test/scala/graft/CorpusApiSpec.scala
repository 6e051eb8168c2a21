package graft

import graft.api.{Corpus, VectorCorpus}
import org.apache.spark.sql.functions._

/** The library facade produces the same results as the oracle-checked
  * query formulations it delegates to. */
class CorpusApiSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)

  test("dedupExact keeps exactly one doc per digest") {
    val out = Corpus(docs).dedupExact().df
    val nDigests = docs.select(md5(col("text").cast("binary"))).distinct().count()
    assert(out.count() == nDigests)
    assert(out.select("doc_id").distinct().count() == nDigests)
  }

  test("qualityFilter matches the pipeline_e2e gate") {
    val out = Corpus(docs).dedupExact().qualityFilter(20, 0.5).df
    // pipeline_e2e's per-lang n_docs must equal the facade's group count
    val viaQuery = SparkEntry.queries("pipeline_e2e")(spark, sf001)
      .select("lang", "n_docs")
    val viaApi = out.groupBy("lang").agg(count(lit(1)).cast("long").as("n_docs"))
    assertSameRows(viaApi, viaQuery, "quality gate")
  }

  test("withTokenCounts adds consistent budgets and budget() aggregates them") {
    val c = Corpus(docs).withTokenCounts()
    val bad = c.df.where(col("n_tokens") <= 0 || col("n_bpe_tokens") < col("n_tokens")).count()
    assert(bad == 0, "bpe tokens must be >= whitespace tokens > 0")
    val b = c.budget("lang")
    val total = b.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == docs.count())
  }

  test("VectorCorpus.topK equals the sim_topk query") {
    val viaApi = VectorCorpus(Tables.embeddings(spark, sf001)).topK(0L, 10)
    val viaQuery = SparkEntry.queries("sim_topk")(spark, sf001)
    assertSameRows(viaApi, viaQuery, "topk")
  }

  test("nearDupClusters equals the dedup_cluster query; dedupNear keeps cluster minima") {
    val viaApi = Corpus(docs).nearDupClusters(0.02)
    val viaQuery = SparkEntry.queries("dedup_cluster")(spark, sf001)
    assertSameRows(viaApi, viaQuery, "clusters")
    val kept = Corpus(docs).dedupNear(0.02).df
    // every cluster representative survives; every non-representative is gone
    val reps = viaApi.where(col("doc_id") === col("cluster")).count()
    val dropped = viaApi.where(col("doc_id") =!= col("cluster")).count()
    assert(kept.count() == docs.count() - dropped)
    assert(kept.join(viaApi.where(col("doc_id") =!= col("cluster")), Seq("doc_id"),
      "left_semi").count() == 0)
    assert(kept.join(viaApi.where(col("doc_id") === col("cluster")), Seq("doc_id"),
      "left_semi").count() == reps)
  }

  test("scrubStopwords removes exactly the stoplist tokens") {
    val out = Corpus(docs).scrubStopwords(Seq("a", "the")).df
    val leftover = out
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .where(col("t").isin("a", "the")).count()
    assert(leftover == 0)
  }

  test("sampleStratified caps every stratum deterministically") {
    val out = Corpus(docs).sampleStratified("lang", 7)
    val sizes = out.df.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 7), sizes.mkString(","))
    // deterministic: same call twice, same rows
    assertSameRows(out.df, Corpus(docs).sampleStratified("lang", 7).df, "stratified")
  }

  test("VectorCorpus rangeSearch equals sim_range_search; bbox equals the native agg") {
    val emb = Tables.embeddings(spark, sf001)
    assertSameRows(VectorCorpus(emb).rangeSearch(0L, 0.15),
      SparkEntry.queries("sim_range_search")(spark, sf001), "range search")
    val box = VectorCorpus(emb).bbox("label")
    assert(box.count() == emb.select("label").distinct().count())
  }

  test("withSimHash column equals the dedup_simhash fingerprints") {
    val viaApi = Corpus(docs).withSimHash().df.select("doc_id", "simhash")
    val viaQuery = SparkEntry.queries("dedup_simhash")(spark, sf001)
      .select(col("doc_id"), col("fp").as("simhash"))
    assertSameRows(viaApi, viaQuery, "simhash")
  }

  test("gopherFilter passes exactly the docs text_gopher_quality counts as passing") {
    val kept = Corpus(docs)
      .gopherFilter(minTokens = 20, maxTokens = 5000,
        minMeanLen = 4.8, maxMeanLen = 6.0, minStopHits = 1)
      .df.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = SparkEntry.queries("text_gopher_quality")(spark, sf001)
      .select("lang", "n_pass")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap.filter(_._2 > 0)
    assert(kept == expected, s"kept=$kept expected=$expected")
  }

  test("withChunkRepeatRatio agrees with text_dedup_chunks per-lang totals") {
    val api = Corpus(docs).withChunkRepeatRatio().df
    val anyRepeat = api.where(col("chunk_repeat_ratio") > 0)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = SparkEntry.queries("text_dedup_chunks")(spark, sf001)
      .select("lang", "n_docs_with_repeat")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap.filter(_._2 > 0)
    assert(anyRepeat == expected, s"api=$anyRepeat expected=$expected")
  }

  test("frequentTokens with ample capacity equals exact token counts") {
    val got = Corpus(docs).frequentTokens(100000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._3 == 0L), "ample capacity must have zero error")
    val exact = Corpus(docs).tokens().groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(t => t._1 -> t._2).toMap == exact)
  }

  test("substringDedupReport rolls up to the dedup_substring query; dedupSubstrings rewrites kept text") {
    val rep = Corpus(docs).substringDedupReport()
    val viaApi = rep.groupBy("lang")
      .agg(count(lit(1)).cast("decimal(20,0)").as("n_docs"),
           sum(col("n_windows")).cast("decimal(20,0)").as("n_windows"),
           sum(col("n_dup_windows")).cast("decimal(20,0)").as("n_dup_windows"),
           sum(col("n_toks")).cast("decimal(20,0)").as("n_tokens"),
           sum(col("n_covered")).cast("decimal(20,0)").as("n_tokens_dropped"),
           sum(col("n_spans")).cast("decimal(20,0)").as("n_kept_spans"),
           sum(when(col("n_covered") > 0, 1L).otherwise(0L))
             .cast("decimal(20,0)").as("n_docs_trimmed"),
           sum(conv(substring(md5(col("kept").cast("binary")), 1, 8), 16, 10)
             .cast("long")).cast("decimal(20,0)").as("kept_sig"))
      .orderBy("lang")
    assertSameRows(viaApi, SparkEntry.queries("dedup_substring")(spark, sf001),
      "substring rollup")
    val applied = Corpus(docs).dedupSubstrings().df
    val nonEmptyKept = rep.where(length(col("kept")) > 0).count()
    assert(applied.count() == nonEmptyKept)
    // survivors carry the DEDUPLICATED text, not the original
    val mismatch = applied.join(rep.select(col("doc_id"), col("kept")), Seq("doc_id"))
      .where(col("text") =!= col("kept")).count()
    assert(mismatch == 0, "apply-side text must equal the report's kept text")
  }

  test("decontaminationReport equals the text_decontaminate query; decontaminate drops every hit") {
    val bench = docs.where(col("doc_id") % operators.TextOps.BenchmarkDocMod === 0)
    val corpus = docs.where(col("doc_id") % operators.TextOps.BenchmarkDocMod =!= 0)
    val viaApi = Corpus(corpus).decontaminationReport(bench, "lang")
    assertSameRows(viaApi.orderBy("doc_id"),
      SparkEntry.queries("text_decontaminate")(spark, sf001), "decontam report")
    val kept = Corpus(corpus).decontaminate(bench).df
    val expectKept = viaApi.where(col("status") === "kept").count()
    assert(kept.count() == expectKept)
    assert(kept.join(viaApi.where(col("status") === "dropped"), Seq("doc_id"),
      "left_semi").count() == 0, "no dropped doc may survive the gate")
  }

  test("temperatureAllocation matches sample_temperature_alloc and sums exactly to the budget") {
    val viaApi = Corpus(docs)
      .temperatureAllocation("lang", operators.TextOps.MixtureSampleBudget)
    val viaQuery = SparkEntry.queries("sample_temperature_alloc")(spark, sf001)
      .select("lang", "n_tokens", "alloc_tokens")
    assertSameRows(viaApi, viaQuery, "temperature allocation")
    val total = viaApi.agg(sum(col("alloc_tokens"))).collect()(0).get(0).toString.toLong
    assert(total == operators.TextOps.MixtureSampleBudget)
  }

  test("VectorCorpus.hardNegatives equals the sim_hard_negatives query") {
    val emb = Tables.embeddings(spark, sf001)
    val anchors = (0L until operators.Similarity.HardNegAnchors).toSeq
    val viaApi = VectorCorpus(emb)
      .hardNegatives(anchors, operators.Similarity.HardNegK)
      .select("anchor", "rnk", "vec_id", "cos")
    assertSameRows(viaApi, SparkEntry.queries("sim_hard_negatives")(spark, sf001),
      "hard negatives")
    // every mined negative carries a label different from its anchor's
    val lbl = emb.select(col("vec_id"), col("label"))
    val sameLabel = viaApi
      .join(lbl.withColumnRenamed("label", "nl"), Seq("vec_id"))
      .join(lbl.select(col("vec_id").as("anchor"), col("label").as("al")), Seq("anchor"))
      .where(col("nl") === col("al")).count()
    assert(sameLabel == 0, "hard negatives must be cross-label")
  }

  test("VectorCorpus.knnJoin equals the sim_knn_join query") {
    val emb = Tables.embeddings(spark, sf001)
    val viaApi = VectorCorpus(emb).knnJoin(3)
      .select("label", "vec_id", "nbr_id", "cos", "rnk")
    assertSameRows(viaApi, SparkEntry.queries("sim_knn_join")(spark, sf001), "knn")
  }

  test("dsirReport equals the text_dsir query; dsirSelect keeps exactly the flagged docs") {
    val viaApi = Corpus(docs).dsirReport()
    assertSameRows(viaApi, SparkEntry.queries("text_dsir")(spark, sf001), "dsir")
    val kept = Corpus(docs).dsirSelect().df
    val flagged = viaApi.where(col("kept") === 1L).count()
    assert(kept.count() == flagged && flagged > 0)
  }

  test("knScores and noveltyScores equal their query formulations") {
    assertSameRows(Corpus(docs).knScores(),
      SparkEntry.queries("text_kneser_ney")(spark, sf001), "kn")
    assertSameRows(Corpus(docs).noveltyScores(),
      SparkEntry.queries("text_novelty")(spark, sf001), "novelty")
  }

  test("duplicatedSpans equals the dedup_substring_spans query") {
    assertSameRows(Corpus(docs).duplicatedSpans(),
      SparkEntry.queries("dedup_substring_spans")(spark, sf001), "spans")
  }

  test("graphAnnTopK equals the sim_ann_graph query") {
    val viaApi = VectorCorpus(Tables.embeddings(spark, sf001)).graphAnnTopK(0L, 10)
    assertSameRows(viaApi,
      SparkEntry.queries("sim_ann_graph")(spark, sf001), "graph-ann")
  }

  test("stripHtml recovers the payload from a page-framed corpus") {
    val framed = docs.withColumn("text",
      concat(lit("<html><body><script>var x = '<b>no</b>';</script><p>"),
             col("text"), lit("</p></body></html>")))
    val out = Corpus(framed).stripHtml().df
      .select(col("doc_id"), col("text").as("got"))
      .join(docs.select(col("doc_id"), col("text").as("want")), Seq("doc_id"))
    assert(out.where(col("got") =!= col("want")).count() == 0)
  }

  test("packChunks offsets are contiguous and chunk spans match the summary query") {
    val off = Corpus(docs).packChunks().orderBy("doc_id").collect()
    // exclusive offsets tile the stream exactly: off(i+1) = off(i) + n(i)
    off.sliding(2).foreach { w =>
      assert(w(1).getLong(2) == w(0).getLong(2) + w(0).getLong(1)) }
    assert(off.head.getLong(2) == 0L)
    val summary = SparkEntry.queries("sample_pack_chunks")(spark, sf001).collect()(0)
    val straddling = off.count(r => r.getLong(3) != r.getLong(4))
    assert(summary.getLong(3) == straddling, "straddling count")
  }
}
