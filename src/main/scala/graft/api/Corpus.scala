package graft.api

import graft.Tables.{big, fround}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Library facade over the training-data operators: wrap any DataFrame
  * with a `doc_id` and `text` column and chain the pipeline stages
  * fluently — the API a user of the reference library would reach for
  * after switching. Each method delegates to the same implementations
  * the oracle-checked queries run (operators/Dedup, TextOps shapes),
  * so facade results inherit their verification.
  *
  * {{{
  * Corpus(docs)
  *   .dedupExact()
  *   .qualityFilter(minTokens = 20, minTtr = 0.5)
  *   .withTokenCounts()
  *   .df
  * }}}
  */
final case class Corpus(df: DataFrame) {

  private def toks: Column = split(lower(col("text")), " ")

  /** Keep one document (min doc_id) per exact normalized-text digest. */
  def dedupExact(): Corpus = {
    val keep = df.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    Corpus(df.join(keep, Seq("doc_id"), "left_semi"))
  }

  /** Near-duplicate pairs (doc_id a < b) with exact Jaccard ≥ τ over
    * word 3-shingles, candidates from MinHash-LSH banding. */
  def nearDupPairs(jaccardMin: Double): DataFrame =
    Dedup.minhashPairs(df, jaccardMin)

  /** Drop documents failing the token-count / type-token-ratio gate. */
  def qualityFilter(minTokens: Int, minTtr: Double): Corpus =
    Corpus(df
      .withColumn("__n", size(toks))
      .withColumn("__ttr", size(array_distinct(toks)).cast("double") / col("__n"))
      .where(col("__n") >= minTokens && col("__ttr") >= minTtr)
      .drop("__n", "__ttr"))

  /** Add `n_tokens` (whitespace) and `n_bpe_tokens` (letter/digit/punct
    * runs) — the token-budget columns. */
  def withTokenCounts(): Corpus =
    Corpus(df
      .withColumn("n_tokens", big(size(toks)))
      .withColumn("n_bpe_tokens",
        big(size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))))))

  /** 64-bit SimHash fingerprint column (native kernel). */
  def withSimHash(colName: String = "simhash"): Corpus =
    Corpus(df.withColumn(colName, Dedup.simhash(col("text"))))

  /** Long-form (doc_id, token) view for token-level analytics. */
  def tokens(): DataFrame =
    df.select(col("doc_id"), explode(toks).as("token"))

  /** Per-group corpus stats: doc count, total whitespace tokens. */
  def budget(groupCols: String*): DataFrame =
    df.withColumn("__n", size(toks))
      .groupBy(groupCols.map(col): _*)
      .agg(big(count(lit(1))).as("n_docs"), big(sum(col("__n"))).as("total_tokens"))

  /** Near-dup CLUSTERS: one row per clustered doc with its component's
    * min doc_id — the "keep one per cluster" decision input. Pairs come
    * from the blocked exact-Jaccard join; components from the hybrid
    * union-find / label-propagation solver. Requires `lang` and
    * `source` columns (the blocking keys). */
  def nearDupClusters(jaccardMin: Double): DataFrame =
    Dedup.connectedComponents(Dedup.blockedJaccardPairs(df, jaccardMin))
      .select(col("node").as("doc_id"), col("cluster"))

  /** Collapse near-dup clusters: keep the min doc_id of every cluster
    * (non-clustered documents pass through untouched). */
  def dedupNear(jaccardMin: Double): Corpus = {
    val drop = nearDupClusters(jaccardMin)
      .where(col("doc_id") =!= col("cluster")).select("doc_id")
    Corpus(df.join(drop, Seq("doc_id"), "left_anti"))
  }

  /** Remove stoplist tokens from `text` (row-local array filter). */
  def scrubStopwords(stop: Seq[String]): Corpus =
    Corpus(df.withColumn("text",
      concat_ws(" ", filter(toks, t => !t.isInCollection(stop)))))

  /** Per-doc substring-dedup report (sliding k-token windows, global
    * first-occurrence-wins, kept spans merged — the dedup_substring
    * kernel): doc_id, lang, window/coverage/span counts and the
    * rebuilt kept text. Requires a `lang` column. */
  def substringDedupReport(): DataFrame =
    graft.operators.Dedup.substringDedupDocs(df)

  /** The maximal duplicated SPANS themselves (one row per span:
    * doc_id, span_idx, start_tok, span_len, span_md5) at exact token
    * granularity — the inspection surface behind [[dedupSubstrings]]:
    * what would be cut, where, and its content digest. */
  def duplicatedSpans(): DataFrame =
    graft.operators.Dedup.substringDupSpans(df)

  /** Rewrite every document's text to its substring-deduplicated form
    * and drop only documents whose kept text is empty (fully covered
    * by duplicated windows) — the apply-side of
    * [[substringDedupReport]]. */
  def dedupSubstrings(): Corpus = {
    val rep = substringDedupReport().select(col("doc_id"),
      col("kept"), col("n_covered"))
    Corpus(df.join(rep, Seq("doc_id"))
      .withColumn("text", col("kept"))
      .where(length(col("text")) > 0)
      .drop("kept", "n_covered"))
  }

  /** Strip HTML markup from `text` in place (script/style blocks,
    * then tags, then whitespace collapse — the text_html_strip
    * chain): the web-crawl → training-text first pass. Row-local. */
  def stripHtml(): Corpus =
    Corpus(df.withColumn("text",
      graft.operators.TextOps.htmlStripped(col("text"))))

  /** Concat-and-chunk packing offsets (the sample_pack_chunks
    * two-level prefix sum): per doc, its exclusive token offset in
    * the deterministic doc_id-ordered stream and the [first_chunk,
    * last_chunk] span at `ctxTokens` capacity — what a pretraining
    * loader needs to slice fixed-length sequences. */
  def packChunks(ctxTokens: Int =
      graft.operators.Relational.PackCtxTokens): DataFrame =
    graft.operators.Relational.packChunkOffsets(df, ctxTokens)

  /** Decontamination gate against an EXTERNAL benchmark table (any
    * DataFrame with doc_id + text — the eval set): per-doc n-gram
    * collision report, any hit marked dropped. The benchmark n-gram
    * set broadcasts; corpus n-grams never shuffle. */
  def decontaminationReport(benchmark: DataFrame, carry: String*): DataFrame =
    graft.operators.TextOps.decontaminate(df, benchmark, carry = carry)

  /** Keep only documents with zero benchmark n-gram collisions. */
  def decontaminate(benchmark: DataFrame): Corpus = {
    val keep = decontaminationReport(benchmark)
      .where(col("status") === "kept").select("doc_id")
    Corpus(df.join(keep, Seq("doc_id"), "left_semi"))
  }

  /** DSIR importance-resampling report (the text_dsir kernel): per-doc
    * hashed-n-gram target/raw log-likelihood-ratio weight and the
    * per-lang top-quantile keep flag. Requires doc_id/lang/text. */
  def dsirReport(): DataFrame =
    graft.operators.TextOps.dsirSelect(df)

  /** Keep only the documents DSIR selects (kept == 1). */
  def dsirSelect(): Corpus = {
    val keep = dsirReport().where(col("kept") === 1L).select("doc_id")
    Corpus(df.join(keep, Seq("doc_id"), "left_semi"))
  }

  /** Interpolated Kneser-Ney bigram LM scores per document (the
    * text_kneser_ney kernel). */
  def knScores(): DataFrame =
    graft.operators.TextOps.knScores(df)

  /** First-occurrence n-gram novelty per document (the text_novelty
    * kernel): fraction of this doc's n-grams first seen here in
    * corpus (doc_id) order. */
  def noveltyScores(): DataFrame =
    graft.operators.TextOps.noveltyScores(df)

  /** Overlapping fixed-width passage chunks for retrieval ingestion
    * (the text_rag_chunks kernel): one row per (doc, chunk) with token
    * offset, length, and rebuilt text. Requires a `lang` column. */
  def ragChunks(windowTokens: Int = graft.operators.TextOps.RagChunkTokens,
                stride: Int = graft.operators.TextOps.RagChunkStride): DataFrame =
    graft.operators.TextOps.ragChunks(df, windowTokens, stride)

  /** Temperature-resampled integer token allocation per value of
    * `groupCol` (share^tau + largest-remainder exact split — the
    * sample_temperature_alloc recipe). */
  def temperatureAllocation(groupCol: String, budget: Long,
                            tau: Double = graft.operators.TextOps.MixtureTau): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    df.select(col(groupCol), size(toks).cast("long").as("__t"))
      .groupBy(groupCol).agg(sum(col("__t")).as("tok"))
      .withColumn("tot", sum(col("tok")).over(all))
      .withColumn("w", pow(col("tok").cast("double") / col("tot"), tau))
      .withColumn("share", col("w") / sum(col("w")).over(all))
      .withColumn("ea", col("share") * budget)
      .withColumn("base", floor(col("ea")).cast("long"))
      .withColumn("frac", fround(col("ea") - col("base"), 6))
      .withColumn("rem", lit(budget) - sum(col("base")).over(all))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("frac").desc, col(groupCol))))
      .select(col(groupCol), big(col("tok")).as("n_tokens"),
        big(col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** Balanced per-stratum downsample: deterministic first-`perStratum`
    * docs (by doc_id) of every distinct value of `stratumCol`. */
  def sampleStratified(stratumCol: String, perStratum: Int): Corpus = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy("doc_id")
    Corpus(df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perStratum).drop("__rn"))
  }

  /** Gopher-style composite quality gate: token-count bounds, mean
    * token length bounds, minimum stopword hits — all row-local
    * (text_gopher_quality's rules as a filter stage). */
  def gopherFilter(minTokens: Int = 20, maxTokens: Int = 5000,
                   minMeanLen: Double = 2.0, maxMeanLen: Double = 12.0,
                   stop: Seq[String] = Seq("a", "the", "and", "of", "to"),
                   minStopHits: Int = 1): Corpus =
    Corpus(df
      .withColumn("__t", toks)
      .withColumn("__n", size(col("__t")))
      .withColumn("__ml",
        aggregate(transform(col("__t"), t => length(t)), lit(0L), _ + _)
          .cast("double") / col("__n"))
      .withColumn("__sh", size(filter(col("__t"), t => t.isInCollection(stop))))
      .where(col("__n").between(minTokens, maxTokens) &&
             col("__ml") >= minMeanLen && col("__ml") <= maxMeanLen &&
             col("__sh") >= minStopHits)
      .drop("__t", "__n", "__ml", "__sh"))

  /** Per-doc repeated-chunk ratio column (intra-doc boilerplate signal;
    * text_dedup_chunks' row-local chunking). */
  def withChunkRepeatRatio(chunkTokens: Int = 2,
                           colName: String = "chunk_repeat_ratio"): Corpus = {
    val t = toks
    val chunks = transform(
      sequence(lit(0), floor((size(t) + lit(chunkTokens - 1)) / lit(chunkTokens)).cast("int") - 1),
      i => concat_ws(" ", slice(t, i * chunkTokens + 1, lit(chunkTokens))))
    Corpus(df.withColumn(colName,
      fround((size(chunks) - size(array_distinct(chunks))).cast("double") /
             size(chunks), 4)))
  }

  /** Global heavy-hitter tokens via the mergeable Space-Saving sketch
    * (fixed memory at any vocabulary size; exact when `capacity`
    * exceeds the distinct-token count). */
  def frequentTokens(capacity: Int): DataFrame =
    tokens().agg(graft.functions.FreqSketchAgg(col("token"), capacity).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key").as("token"), col("e.est").as("est"), col("e.err").as("err"))
}

/** Facade over an embeddings DataFrame (`vec_id`, `embedding`). */
final case class VectorCorpus(df: DataFrame) {

  /** Exact cosine top-k neighbors of one vector (broadcast, no corpus
    * shuffle). */
  def topK(queryVecId: Long, k: Int): DataFrame =
    Similarity.topK(df, queryVecId, k)

  /** LSH-approximate top-k (multi-table hyperplane buckets). */
  def annTopK(queryVecId: Long, k: Int): DataFrame =
    Similarity.annTopK(df, queryVecId, k)

  /** Graph-ANN top-k neighbors of `queryVecId`: beam search over the
    * two-blocking kNN graph (built once from this corpus; the
    * high-recall regime — fully deterministic, constant probe budget
    * per query). Requires a `label` column for the blocking/entry
    * points. */
  def graphAnnTopK(queryVecId: Long, k: Int): DataFrame =
    Similarity.graphBeamSearch(df, Similarity.knnGraph(df).localCheckpoint(),
      k, queryVecId)

  /** Add an L2-norm column. */
  def withNorm(colName: String = "l2"): VectorCorpus =
    VectorCorpus(df.withColumn(colName,
      fround(sqrt(aggregate(Similarity.asDouble(col("embedding")),
        lit(0.0), (a, x) => a + x * x)), 6)))

  /** All neighbors of one vector with cosine ≥ `minCos` (broadcast
    * query, no corpus shuffle), strongest first. */
  def rangeSearch(queryVecId: Long, minCos: Double): DataFrame = {
    val q = df.where(col("vec_id") === queryVecId).select(col("embedding").as("qv"))
    df.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
              fround(Similarity.cosine(col("embedding"), col("qv")), 4).as("cos"))
      .where(col("cos") >= minCos)
      .orderBy(col("cos").desc, col("vec_id"))
  }

  /** Per-group elementwise min/max bounding boxes (native mergeable
    * aggregate — one array per group crosses the shuffle). */
  def bbox(groupCols: String*): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.ArrayExtremeAgg.min(col("embedding")).as("mins"),
           graft.functions.ArrayExtremeAgg.max(col("embedding")).as("maxs"))

  /** Dataset-vs-dataset kNN join: every vector's top-`k` neighbors
    * within its `blockCol` block (sim_knn_join's shape — swap the
    * block key for an LSH/IVF bucket at open scale). Ranks on the
    * rounded score for engine-stable order. */
  def knnJoin(k: Int, blockCol: String = "label"): DataFrame = {
    val a = df.select(col(blockCol), col("vec_id"), col("embedding").as("va"))
    val b = df.select(col(blockCol), col("vec_id").as("nbr_id"), col("embedding").as("vb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("nbr_id"))
    a.join(b, Seq(blockCol))
      .where(col("vec_id") =!= col("nbr_id"))
      .select(col(blockCol), col("vec_id"), col("nbr_id"),
              fround(Similarity.cosine(col("va"), col("vb")), 4).as("cos"))
      .withColumn("rnk", big(row_number().over(w)))
      .where(col("rnk") <= k)
  }

  /** Per-anchor top-`k` CROSS-label neighbors — hard negatives for
    * contrastive training (sim_hard_negatives' shape: anchors
    * broadcast, ranked-window cut). Requires a `label` column. */
  def hardNegatives(anchorIds: Seq[Long], k: Int): DataFrame = {
    val anchors = df.where(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor"), col("label").as("alabel"),
              col("embedding").as("av"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor").orderBy(col("cos").desc, col("vec_id"))
    df.join(broadcast(anchors), col("label") =!= col("alabel"))
      .select(col("anchor"), col("vec_id"),
              fround(Similarity.cosine(col("embedding"), col("av")), 4).as("cos"))
      .withColumn("rnk", big(row_number().over(w)))
      .where(col("rnk") <= k)
  }
}
