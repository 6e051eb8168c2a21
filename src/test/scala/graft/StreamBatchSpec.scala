package graft

import graft.streaming.Streams
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream ≡ batch equivalence: each streaming op runs as a REAL
  * Structured Streaming job (file source → Trigger.AvailableNow →
  * memory sink) and must produce the batch declaration's rows
  * (SURVEY.md §5.2.4). */
class StreamBatchSpec extends SparkSpec {
  import spark.implicits._

  /** Events written once to a temp parquet dir in (ts, event_id) order,
    * so file-source arrival order matches the batch tie-break order. */
  private lazy val stagedEvents: (String, DataFrame) = {
    val dir = Files.createTempDirectory("graft_stream_ev").toString
    val ev = Tables.events(spark, sf001).orderBy("ts", "event_id")
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    (dir, spark.read.parquet(dir))
  }

  private def streamed(name: String, transform: DataFrame => DataFrame,
                       mode: String): DataFrame = {
    val (dir, batchView) = stagedEvents
    val src = spark.readStream.schema(batchView.schema).parquet(dir)
    val q = transform(src).writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("stream_media_decode: REAL PNG decode streams to the batch grid") {
    // documents staged as the file source: the decode kernel runs per
    // micro-batch on actual container bytes, and the mergeable grid
    // must land exactly the batch declaration's rows
    val dir = Files.createTempDirectory("graft_stream_docs").toString
    val docs = Tables.documents(spark, sf001).orderBy("doc_id")
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val batchView = spark.read.parquet(dir)
    val q = Streams.mediaDecodeGrid(
        spark.readStream.schema(batchView.schema).parquet(dir))
      .writeStream.format("memory").queryName("t_media_grid")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assertSameRows(spark.table("t_media_grid"),
      Streams.mediaDecodeGrid(batchView), "media grid")
  }

  test("stream_delta_tail: the REAL json file-source tail equals the batch declaration") {
    // the exported Delta log IS the staged source — new log versions
    // are exactly what a production tail job watches for
    val root = operators.Scans.deltaFixture(spark, sf001)
    val logDir = operators.Scans.deltaLogDir(root)
    val q = Streams.deltaTailGrid(
        spark.readStream.schema(Streams.DeltaActionSchema).json(logDir)
          .select(col("add"), col("_metadata.file_path").as("log_file")))
      .writeStream.format("memory").queryName("t_delta_tail")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batchActs = spark.read.schema(Streams.DeltaActionSchema)
      .json(logDir + "/*.json")
      .select(col("add"), col("_metadata.file_path").as("log_file"))
    assertSameRows(
      Streams.deltaTailFinalize(spark.table("t_delta_tail")),
      Streams.deltaTailFinalize(Streams.deltaTailGrid(batchActs)),
      "delta tail")
    // the rewrite version must be ABSENT, not zero: its actions all
    // carry dataChange=false
    assert(!spark.table("t_delta_tail").collect().map(_.getLong(0)).contains(2L))
  }

  test("stream_tumbling: streaming result equals batch result") {
    val out = streamed("t_tumbling", Streams.tumbling, "complete")
    assertSameRows(out, Streams.tumbling(stagedEvents._2), "tumbling")
  }

  test("stream_sliding: streaming result equals batch result") {
    val out = streamed("t_sliding", Streams.sliding, "complete")
    assertSameRows(out, Streams.sliding(stagedEvents._2), "sliding")
  }

  test("stream_drift_psi: streamed day-bin counts equal batch; PSI finalization agrees") {
    // stage 1 (the streaming-native mergeable aggregate) must land the
    // identical (day, bin) grid a batch pass produces…
    val out = streamed("t_psi_counts", Streams.psiDayBinCounts, "complete")
    assertSameRows(out, Streams.psiDayBinCounts(stagedEvents._2), "psi_counts")
    // …and the grid-side finalization (foreachBatch in a live job)
    // computed over the STREAMED landing equals the batch declaration.
    // The landing is re-materialized first (fresh attribute ids) —
    // the multi-branch grid plan self-joins the counts, which a
    // memory-sink View's shared references cannot express; a live
    // foreachBatch hands over a materialized micro-batch the same way.
    val landed = spark.table("t_psi_counts")
    val viaStream = Streams.psiFromCounts(
      spark.createDataFrame(landed.rdd, landed.schema))
    assert(viaStream.where(col("psi") < 0).isEmpty) // PSI is nonnegative
    assertSameRows(viaStream, Streams.psiDrift(stagedEvents._2), "psi_final")
  }

  test("stream_freshness: streamed lane-hour cells equal batch; verdict readout agrees") {
    val out = streamed("t_fresh_cells", Streams.freshnessCells, "complete")
    assertSameRows(out, Streams.freshnessCells(stagedEvents._2), "fresh_cells")
    val landed = spark.table("t_fresh_cells")
    val viaStream = Streams.freshnessFromCells(
      spark.createDataFrame(landed.rdd, landed.schema))
    assertSameRows(viaStream,
      SparkEntry.queries("stream_freshness")(spark, sf001), "fresh_final")
    // some lane IS the head: zero lag, flagged fresh
    assert(viaStream.where(col("minutes_behind") === 0 && col("is_fresh")).count() >= 1)
  }

  test("stream_srm: streamed distinct-user arm counts equal batch; χ² readout agrees") {
    // stage 1 — the chained stateful shape (dropDuplicates → agg) must
    // land the identical 2-cell arm grid a batch pass produces…
    val out = streamed("t_srm_counts", Streams.srmArmCounts, "complete")
    assertSameRows(out, Streams.srmArmCounts(stagedEvents._2), "srm_counts")
    // …and the shared χ² readout over the STREAMED landing equals the
    // batch events_srm gate exactly (one statistic definition)
    val landed = spark.table("t_srm_counts")
    val viaStream = Streams.srmFromCounts(
      spark.createDataFrame(landed.rdd, landed.schema))
    assertSameRows(viaStream,
      operators.Aggregations.queries("events_srm")(spark, sf001), "srm_final")
  }

  test("stream_session: session_window stream equals gaps-and-islands batch") {
    val out = streamed("t_session", Streams.sessionsStream, "complete")
    val batch = Streams.sessionsBatch(stagedEvents._2)
      .select("user_id", "session_start", "n_events")
    assertSameRows(out, batch, "session")
  }

  test("stream_freq_sketch: sketch-state windowed heavy hitters equal batch") {
    val out = streamed("t_freq_sketch", Streams.freqSketchWindowed, "complete")
    assertSameRows(out, Streams.freqSketchWindowed(stagedEvents._2), "freq_sketch")
  }

  test("stream_static_join: stream-static broadcast enrichment equals batch") {
    val cust = Tables.customer(spark, sf001)
    val out = streamed("t_static_join", ev => Streams.staticJoin(ev, cust), "complete")
    assertSameRows(out, Streams.staticJoin(stagedEvents._2, cust), "static_join")
  }

  test("stream_outer_interval: watermarked LEFT OUTER interval join emits batch rows incl. null pads") {
    // null-padded rows for unmatched purchases emit only once the
    // watermark passes their join window; purchases inside the final
    // watermark delay would stay open forever on a finite stream. A
    // trailing flush event (a 'view', invisible to both join sides)
    // advances the watermark past everything — the standard
    // end-of-stream close — after which stream ≡ batch LEFT JOIN.
    val (srcDir, batchView) = stagedEvents
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_outer").toString
    val maxTs = batchView.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    def flushRow(id: Long, plusHours: Int, typ: String) =
      Seq((id, new java.sql.Timestamp(maxTs.getTime + plusHours * 3600 * 1000L),
           -1L, typ, 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // watermarks hang off the click/purchase FILTERED branches, so the
    // flush must be visible to BOTH: a sentinel click and purchase
    // (user -1, 30+ min apart → they can never join, and the sentinel
    // purchase's own window never closes so it emits nothing). File 2,
    // written later and processed as its own batch, gives the state
    // store the post-file-1 watermark in which to emit the null rows.
    spark.read.parquet(srcDir)
      .unionByName(flushRow(Long.MaxValue - 3, 4, "click"))
      .unionByName(flushRow(Long.MaxValue - 2, 5, "purchase"))
      .orderBy("ts", "event_id").coalesce(1).write.mode("overwrite").parquet(dir)
    flushRow(Long.MaxValue - 1, 6, "click").coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batchView.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streams.intervalJoinOuter(src, withWatermarks = true).writeStream
      .format("memory").queryName("t_ss_outer").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assertSameRows(spark.table("t_ss_outer").where(col("user_id") =!= -1L),
      Streams.intervalJoinOuter(batchView, withWatermarks = false), "ss_outer")
  }

  test("stream_stream_interval: watermarked stream-stream self-join emits the batch pairs") {
    val out = streamed("t_ss_interval",
      ev => Streams.intervalJoinPairs(ev, withWatermarks = true), "append")
    assertSameRows(out,
      Streams.intervalJoinPairs(stagedEvents._2, withWatermarks = false), "ss_interval")
  }

  test("stream_topk_windowed: ranked top-3 over the streamed window counts equals batch") {
    // stage 1 (window counts) streams; stage 2 (rank) applies to the
    // completed aggregate table — the foreachBatch deployment shape
    val counts = streamed("t_topk_counts", Streams.topkCounts, "complete")
    assertSameRows(
      Streams.rankTop3(counts),
      Streams.rankTop3(Streams.topkCounts(stagedEvents._2)), "topk_windowed")
  }

  test("stream_foreach_batch: foreachBatch parquet sink lands exactly the stream's rows") {
    val (dir, batchView) = stagedEvents
    val out = Files.createTempDirectory("graft_febatch").toString
    val src = spark.readStream.schema(batchView.schema).parquet(dir)
    val q = src.select("event_id", "event_type", "value").writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assertSameRows(spark.read.parquet(out),
      batchView.select("event_id", "event_type", "value"), "febatch")
  }

  test("stream_dedup: dropDuplicates stream equals row_number batch") {
    val out = streamed("t_dedup",
      ev => ev.dropDuplicates("user_id", "event_type")
        .select("user_id", "event_type", "event_id", "ts"),
      "append")
    assertSameRows(out, Streams.dedupBatch(stagedEvents._2), "dedup")
  }
}
