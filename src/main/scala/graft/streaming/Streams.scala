package graft.streaming

import graft.Tables._
import graft.operators.Dedup.incrementalFp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming operators, declared as their batch-equivalent DataFrames
  * (the driver's oracle is batch SQL). The *same* transformations run as
  * a real Structured Streaming job in the unit tests — file source →
  * Trigger.AvailableNow → memory sink — asserting stream ≡ batch, which
  * is the Spark-idiomatic correctness argument for watermarks/windows.
  *
  * Scale notes: tumbling/sliding windows are pure hash aggregations on
  * (window, keys) — partial-agg'd, mergeable, no per-key state growth.
  * Session windows in streaming use session_window (state-store backed,
  * watermark-bounded); the batch equivalent is the gaps-and-islands
  * window pipeline, one shuffle on user_id.
  */
object Streams {

  /** Tumbling 1h window aggregate — shared by the batch query and the
    * streaming test (identical transformation, different source). */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(big(count(lit(1))).as("n"), r2(sum(col("value"))).as("val_sum"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("val_sum"))

  /** Fixed cents grid for the streaming PSI monitor — one literal
    * shared by the stream stage, the batch finalization and the
    * oracle SQL. 20 × $25 bins cover the fixture's value domain;
    * the clamp bin absorbs the tail (same shape as
    * [[graft.operators.Aggregations.PsiBins]], scaled to events). */
  val StreamPsiBinCents = 2500L
  val StreamPsiBaselineDays = 7

  /** Streaming-drift stage 1: per-day per-value-bin counts — the
    * streaming-native mergeable aggregate (state is the (day, bin)
    * grid: ≤ 20 rows per day in the store, never per-event). Shared
    * verbatim by the batch declaration and the StreamBatchSpec job. */
  def psiDayBinCounts(ev: DataFrame): DataFrame =
    ev.groupBy(
        window(col("ts"), "1 day").as("w"),
        least(expr(s"cast(floor(value * 100) as bigint) div $StreamPsiBinCents"),
              lit(graft.operators.Aggregations.PsiBins - 1L)).as("bin"))
      .agg(big(count(lit(1))).as("n"))
      .select(col("w.start").as("wstart"), col("bin"), col("n"))

  /** Streaming-freshness stage 1 (the streaming-native mergeable
    * grid): per (event_type, hour window) arrival count + newest
    * event µs — exactly the state a live freshness monitor keeps
    * (lanes × hours, never per-event). Shared verbatim by the batch
    * declaration and StreamBatchSpec's live drive. */
  /** Streaming media-decode stage (the live half of the multimodal
    * lane): per incoming document, encode→decode a REAL PNG (the
    * planted-parameter round-trip of multimodal_image_decode) and fold
    * a mergeable per-lang grid — image count, dimension sums, decimal-
    * pinned mean gray. Every aggregate is map-side-combinable, so the
    * same declaration runs batch and streaming unchanged. */
  def mediaDecodeGrid(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 3 === 0)
      .select(col("lang"),
        graft.functions.ImageMeta(graft.functions.PngEncodeGray(
          (lit(8) + pmod(col("doc_id"), lit(24))).cast("int"),
          (lit(8) + pmod(col("doc_id"), lit(16))).cast("int"),
          pmod(col("doc_id"), lit(251)).cast("int"))).as("m"))
      .groupBy("lang")
      .agg(big(count(lit(1))).as("n_images"),
           big(sum(col("m.width"))).as("sum_width"),
           big(sum(col("m.height"))).as("sum_height"),
           fround(dsum6(col("m.px_mean")) / count(lit(1)), 4).as("avg_gray"))

  /** stream_delta_tail's explicit action schema — the streaming JSON
    * file source cannot infer, and sharing ONE schema keeps the batch
    * declaration and the spec's real streaming job reading the exact
    * same projection of the log. */
  val DeltaActionSchema: String =
    "add STRUCT<path: STRING, dataChange: BOOLEAN, stats: STRING>"

  /** stream_delta_tail's mergeable stage: Delta-log actions (+ the
    * source file path as `log_file`) → per-version ingested-row grid.
    * dataChange=false rewrites contribute nothing (the CDC rule), so
    * a compaction arriving mid-stream never double-counts; counts are
    * plain sums — mergeable across micro-batches in complete mode. */
  def deltaTailGrid(actions: DataFrame): DataFrame =
    actions
      .where(col("add").isNotNull && col("add.dataChange"))
      .withColumn("version",
        regexp_extract(col("log_file"), "(\\d+)\\.json$", 1).cast("long"))
      .groupBy("version")
      .agg(big(sum(get_json_object(col("add.stats"), "$.numRecords")
        .cast("long"))).as("rows_ingested"))

  /** stream_delta_tail finalization over the landed grid: the tail
    * position — cumulative rows as of each version (a window over
    * ≤ #versions rows, bounded). */
  def deltaTailFinalize(grid: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    grid.withColumn("rows_total", big(sum(col("rows_ingested")).over(
        Window.orderBy("version")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .select(col("version"), big(col("rows_ingested")).as("rows_ingested"),
              col("rows_total"))
      .orderBy("version")
  }

  def freshnessCells(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(big(count(lit(1))).as("n"), max(unix_micros(col("ts"))).as("tmax"))
      .select(col("event_type"), col("w.start").as("wstart"),
              col("n"), col("tmax"))

  /** Streaming-freshness stage 2 (foreachBatch-side readout over the
    * landed grid): the dq_freshness verdicts at ALIGNED-HOUR
    * resolution — head-hour volume and the aligned hour span are what
    * the cell grid can answer exactly (the batch op's sliding
    * last-3600s count is not a function of hour cells, so the
    * streaming variant DECLARES the aligned semantics and its oracle
    * replays them; the dq_freshness SLA verdict itself is identical). */
  def freshnessFromCells(cells: DataFrame): DataFrame = {
    val g = cells.agg(max(col("tmax")).as("gmax"),
                      min(unix_micros(col("wstart"))).as("wmin"))
    cells.crossJoin(broadcast(g))
      .groupBy("event_type")
      .agg(big(sum(col("n"))).as("n"),
           max(col("tmax")).as("tmax"),
           big(sum(when(
             expr("unix_micros(wstart) DIV 3600000000") ===
             expr("gmax DIV 3600000000"), col("n")).otherwise(0L)))
             .as("n_head_hour"),
           max(col("gmax")).as("gmax"), max(col("wmin")).as("wmin"))
      .select(col("event_type"), col("n"),
        timestamp_micros(col("tmax")).as("last_seen"),
        big(expr("(gmax - tmax) DIV 60000000")).as("minutes_behind"),
        (expr("(gmax - tmax) DIV 60000000") <=
          graft.operators.Relational.FreshnessSlaMinutes).as("is_fresh"),
        col("n_head_hour"),
        fround(col("n").cast("double") /
          expr("(gmax DIV 3600000000) - (wmin DIV 3600000000) + 1")
            .cast("double"), 2).as("hourly_avg"))
      .orderBy("event_type")
  }

  /** Streaming-SRM stage 1: distinct-user arm counts as a streaming-
    * native chain — dropDuplicates(user_id) (state = one key per
    * user, user-cardinality-bounded, the stream_dedup class) feeding
    * a 2-cell mergeable aggregate. Chained stateful ops (dedup →
    * agg) are a supported Spark 4 shape; shared verbatim by the
    * batch declaration and StreamBatchSpec's live drive. */
  def srmArmCounts(ev: DataFrame): DataFrame =
    ev.select(col("user_id")).dropDuplicates("user_id")
      .groupBy((col("user_id") % 2).cast("int").as("g"))
      .agg(big(count(lit(1))).as("n"))

  /** Streaming-SRM stage 2 (foreachBatch-side over the landed 2-cell
    * grid): pivot the arm cells and apply THE shared χ² readout
    * ([[graft.operators.Aggregations.srmReadout]]) — the statistic
    * has exactly one definition across batch and stream. */
  def srmFromCounts(counts: DataFrame): DataFrame =
    graft.operators.Aggregations.srmReadout(counts.agg(
      sum(when(col("g") === 0, col("n")).otherwise(0L)).as("n0"),
      sum(when(col("g") === 1, col("n")).otherwise(0L)).as("n1")))

  /** Streaming-drift stage 2 (foreachBatch-side in a live job — rank-
    * style finalization over the landed grid, metadata-scale): the
    * first [[StreamPsiBaselineDays]] days freeze the baseline
    * distribution; each later day's PSI is computed on the UNION of
    * observed bins (a day missing a baseline bin still pays the
    * baseline mass against the 1e-6 clamp, and a day's novel bin
    * pays its own mass — the agg_psi semantics, per day). All joins
    * are grids × grids. */
  def psiDrift(ev: DataFrame): DataFrame = psiFromCounts(psiDayBinCounts(ev))

  /** The finalization alone, over an already-landed (wstart, bin, n)
    * grid — exactly what a live job's foreachBatch sees; split out so
    * StreamBatchSpec can drive it from the STREAMED landing. */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    val c = counts
      .withColumn("day",
        datediff(to_date(col("wstart")), lit("2024-01-01").cast("date")).cast("long"))
    val allBins = c.select("bin").distinct()
    val base = c.where(col("day") < StreamPsiBaselineDays)
      .groupBy("bin").agg(sum(col("n")).as("n_a"))
    val baseTot = base.agg(sum(col("n_a")).as("na_t"))
    val days = c.where(col("day") >= StreamPsiBaselineDays)
      .groupBy("day").agg(sum(col("n")).as("nb_t"))
    val grid = days.crossJoin(broadcast(allBins))
      .join(broadcast(base), Seq("bin"), "left")
      .join(c.select(col("day"), col("bin"), col("n")), Seq("day", "bin"), "left")
      .crossJoin(broadcast(baseTot))
      .withColumn("p",
        greatest(coalesce(col("n_a"), lit(0L)).cast("double") /
                 col("na_t").cast("double"), lit(1e-6)))
      .withColumn("q",
        greatest(coalesce(col("n"), lit(0L)).cast("double") /
                 col("nb_t").cast("double"), lit(1e-6)))
    grid.groupBy("day")
      .agg(big(min(col("nb_t"))).as("n_events"),
           fround(dsum6((col("p") - col("q")) * log(col("p") / col("q"))), 6).as("psi"))
      .orderBy("day")
  }

  /** Windowed-top-k stage 1: per-hour per-type counts — the part that
    * runs streaming-native (mergeable window aggregate). */
  def topkCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(big(count(lit(1))).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))

  /** Windowed-top-k stage 2: rank within each window, keep top 3. In a
    * live job this runs inside foreachBatch over the aggregate stream —
    * the standard deployment for top-k over windows (rank is not an
    * incremental operator). */
  def rankTop3(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("wstart").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rn", big(row_number().over(w))).where(col("rn") <= 3)
  }

  /** Windowed heavy hitters where the Space-Saving sketch IS the
    * aggregation state: one fixed-size mergeable buffer per window in
    * the state store, and the ranked top-3 falls out of the sketch's
    * sorted output with a row-local slice — no second rank stage, no
    * foreachBatch. Capacity 8 exceeds the 5-type key space, so the
    * result is exact (FreqSketchAgg contract); at an open key space
    * the same query degrades gracefully to approximate instead of
    * growing state per key. */
  def freqSketchWindowed(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(graft.functions.FreqSketchAgg(col("event_type"), 8).as("sk"))
      .select(col("w.start").as("wstart"),
              posexplode(slice(col("sk"), 1, 3)).as(Seq("pos", "e")))
      .select(col("wstart"), big(col("pos") + 1).as("rn"),
              col("e.key").as("event_type"), col("e.est").as("n"))

  /** Sliding 1h window, 15-minute slide. */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(big(count(lit(1))).as("n"), r2(sum(col("value"))).as("val_sum"))
      .select(col("w.start").as("wstart"), col("n"), col("val_sum"))

  /** Batch gaps-and-islands sessionization: 30-minute inactivity gap. */
  def sessionsBatch(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
           big(count(lit(1))).as("n_events"),
           (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
      .select("user_id", "session_start", "n_events", "dur_us")
  }

  /** Streaming-native sessionization used by the stream≡batch test. */
  def sessionsStream(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 days")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(big(count(lit(1))).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Session gap: a user's session breaks after 30 quiet minutes —
    * shared by the batch declaration, the stateful stream and the
    * oracle's INTERVAL literal. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** ABANDONED-SESSION batch declaration: per gap-session, the summary
    * plus whether the session ended WITHOUT a purchase — the cart-
    * abandonment detector, the canonical event-time-timeout workload.
    * Gaps-and-islands on ONE user_id shuffle (the sessionsBatch
    * pipeline); the last event resolves with a max(struct) over the
    * (ts, event_id) total order — no second window pass. */
  def abandonedSessionsBatch(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           big(count(lit(1))).as("n_events"),
           big(sum(col("cents"))).as("cents"),
           max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"))
      .select(col("user_id"), col("session_start"), col("session_end"),
              col("n_events"), col("cents"),
              col("last.event_type").as("last_type"),
              (col("last.event_type") =!= "purchase").as("abandoned"))
      .orderBy("user_id", "session_start")
  }

  /** The REAL stateful sessionizer: flatMapGroupsWithState with
    * EVENT-TIME TIMEOUT — the state-API mechanism none of the other
    * stateful jobs needed and the one that keeps a 100 TB/day state
    * store bounded: a session closes either when a successor event
    * arrives past the gap (emitted inline) or when the WATERMARK
    * passes last_event + gap with no successor (the timeout callback —
    * how the final session of every user ever closes). State per key
    * is O(1) — five scalars — regardless of session length. Within a
    * batch, group rows sort by (ts, event_id) (iterator order is not
    * contractual); cross-batch arrival respects event order (the
    * log-compacted-topic contract, staged by the spec via
    * mtime-ordered chunks). Emission CONTENT is batch-invariant: a
    * gap-closed and a timeout-closed session carry identical rows, so
    * the stream equals [[abandonedSessionsBatch]] row-for-row no
    * matter where micro-batch boundaries fall. */
  def abandonedSessionsStream(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    type St = (Long, Long, Long, Long, String)          // startUs, lastUs, n, cents, lastType
    type Out = (Long, Long, Long, Long, Long, String)   // uid, startUs, lastUs, n, cents, lastType
    def emit(uid: Long, s: St): Out = (uid, s._1, s._2, s._3, s._4, s._5)
    ev.withWatermark("ts", "1 second")
      // ts stays in the tuple: the watermark is carried by the event-
      // time COLUMN, and EventTimeTimeout requires it to survive into
      // the stateful operator (projecting it away is an
      // AnalysisException); the pre-computed micros ride alongside
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("event_type"),
              floor(col("value") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, String),
                              (Long, Long, Long, Long, Long, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long,
         rows0: Iterator[(Long, java.sql.Timestamp, Long, Long, String, Long)],
         state: GroupState[St]) =>
          val rows = rows0.map(r => (r._1, r._3, r._4, r._5, r._6))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(uid, s))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
            val out = scala.collection.mutable.Buffer[Out]()
            var st: Option[St] = state.getOption
            for (r <- sorted) {
              st = st match {
                case Some(s) if r._2 - s._2 > SessionGapUs =>
                  out += emit(uid, s)
                  Some((r._2, r._2, 1L, r._5, r._4))
                case Some(s) =>
                  Some((s._1, r._2, s._3 + 1, s._4 + r._5, r._4))
                case None =>
                  Some((r._2, r._2, 1L, r._5, r._4))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s._2 / 1000 + SessionGapUs / 1000)
            }
            out.iterator
          }
      }
      .toDF("user_id", "start_us", "end_us", "n_events", "cents", "last_type")
      .select(col("user_id"),
              timestamp_micros(col("start_us")).as("session_start"),
              timestamp_micros(col("end_us")).as("session_end"),
              col("n_events"), col("cents"), col("last_type"),
              (col("last_type") =!= "purchase").as("abandoned"))
  }

  /** Per-user TOP-3 SPEND EVENTS, batch-declared: rank by (cents DESC,
    * ts ASC, event_id ASC) — the deterministic total order the
    * streaming processor maintains incrementally. */
  def twsTopkBatch(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("cents").desc, col("ts"), col("event_id"))
    ev.withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("rnk", big(row_number().over(w)))
      .where(col("rnk") <= 3)
      .select("user_id", "rnk", "event_id", "cents")
      .orderBy("user_id", "rnk")
  }

  /** The same view as a REAL Spark 4 `transformWithState` job — the
    * arbitrary-state API v2 (StatefulProcessor + typed ListState,
    * RocksDB-backed): state per user is the current top-3 triple list,
    * merged against each batch's arrivals and re-emitted tagged with
    * the batch's as-of event, so the LAST emission per user is the
    * final view (the stream_ewma comparison discipline). O(k) state
    * per key, mergeable in one pass — the bounded-state property that
    * distinguishes a live feature view from "re-rank the history".
    * Requires the RocksDB state store provider (the v2 API contract);
    * the spec sets it for the query. */
  def twsTopkStream(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ev.select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), floor(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TopSpendProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "asof_us", "asof_event_id", "rnk", "event_id", "cents")
  }

  /** First event per (user, type) in (ts, event_id) order. */
  def dedupBatch(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
  }

  /** Custom streaming state via flatMapGroupsWithState: a per-user
    * running event counter whose state survives across micro-batches
    * (the KeyValueGroupedDataset stateful-processing surface). Emits
    * the user's cumulative count once per micro-batch it appears in;
    * after all batches, the latest emission per user equals the batch
    * groupBy count — which is what [[statefulCountsBatch]] declares and
    * the stream test asserts across multiple batches. */
  def statefulCountsStream(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ev.select(col("user_id").as[Long], col("event_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((uid, n))
      }
      .toDF("user_id", "n_events")
  }

  /** Batch declaration of the stateful counter's final state. */
  def statefulCountsBatch(ev: DataFrame): DataFrame =
    ev.groupBy("user_id").agg(big(count(lit(1))).as("n_events"))

  /** Watermark semantics, batch-modelled on MICRO-BATCH granularity —
    * Spark's actual contract: the watermark advances at batch
    * boundaries (global max event time of PRIOR batches − delay), never
    * per row, so an event is late iff its ts trails the max event time
    * of every preceding micro-batch by >1h. Arrival order (event_id)
    * chunks into 1000-event micro-batches; per-batch maxima are one
    * partitioned aggregate, the prefix-max across the tiny batch-
    * summary table is a broadcast theta join (NOT a global window — the
    * r3 model's `Window.orderBy(event_id)` moved the whole corpus to
    * one task; here only #batches summary rows are driver-scale, like
    * the dau_wau day spine). In production #batches is bounded by the
    * trigger cadence, not the data volume. Deterministic ⇒ oracle-
    * checkable (the r3 per-row model was declared un-SQL-able; the
    * faithful batch-granularity model is plain SQL). */
  def watermarkLateBatch(ev: DataFrame): DataFrame = {
    val e = ev.withColumn("bid", expr("event_id DIV 1000"))
    val bmax = e.groupBy("bid").agg(max(unix_micros(col("ts"))).as("mx"))
    val wm = bmax.join(
        bmax.select(col("bid").as("pbid"), col("mx").as("pmx")),
        col("pbid") < col("bid"), "left")
      .groupBy("bid").agg(max(col("pmx")).as("prev_max"))
    e.join(broadcast(wm), Seq("bid"))
      .where(col("prev_max").isNull ||
             unix_micros(col("ts")) >= col("prev_max") - 3600L * 1000000)
      .select("event_id", "user_id", "event_type", "ts")
  }

  /** Stream-static join: the enrichment pattern — a stream joined to a
    * slowly-changing dimension. The static side broadcasts (re-read per
    * micro-batch in a real deployment, so dim updates flow in); the
    * stream side never shuffles for the join. Shared by the batch query
    * and the streaming test. */
  def staticJoin(ev: DataFrame, cust: DataFrame): DataFrame =
    ev.join(broadcast(cust.select(col("c_custkey"), col("c_mktsegment"))),
            col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(big(count(lit(1))).as("n"), r2(sum(col("value"))).as("val_sum"))

  /** Stream-stream interval join, batch-declared: each purchase joined
    * to the same user's clicks in the preceding 30 minutes (attribution
    * join). In streaming both sides hash-partition on the user key and
    * the range condition is exactly what lets watermarks evict state —
    * a click older than 30min past the watermark can never match; the
    * batch equivalent is the same equi-join + range filter. */
  def intervalJoinPairs(ev: DataFrame, withWatermarks: Boolean): DataFrame = {
    val clicks0 = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val buys0 = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("buy_uid"), col("ts").as("buy_ts"), col("event_id").as("buy_id"))
    val clicks = if (withWatermarks) clicks0.withWatermark("click_ts", "1 hour") else clicks0
    val buys   = if (withWatermarks) buys0.withWatermark("buy_ts", "1 hour") else buys0
    buys.join(clicks,
        col("buy_uid") === col("user_id") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("buy_ts"))
      .select(col("buy_uid").as("user_id"), col("buy_id"), col("click_id"))
  }

  def intervalJoinBatch(ev: DataFrame): DataFrame =
    intervalJoinPairs(ev, withWatermarks = false)
      .groupBy("user_id")
      .agg(big(count(lit(1))).as("n_pairs"),
           big(countDistinct(col("buy_id"))).as("n_attributed"))

  /** Stream-stream LEFT OUTER interval join: purchases WITH their
    * attributing clicks, plus null-padded rows for purchases that had
    * none — the semantics that need watermarks to be decidable at all
    * (a missing match is only known once the watermark passes the join
    * window, at which point the state store emits the null row). Under
    * Trigger.AvailableNow the final watermark closes every window, so
    * stream ≡ batch LEFT JOIN exactly — asserted in StreamBatchSpec. */
  def intervalJoinOuter(ev: DataFrame, withWatermarks: Boolean): DataFrame = {
    val clicks0 = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val buys0 = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("buy_uid"), col("ts").as("buy_ts"), col("event_id").as("buy_id"))
    val clicks = if (withWatermarks) clicks0.withWatermark("click_ts", "1 hour") else clicks0
    val buys   = if (withWatermarks) buys0.withWatermark("buy_ts", "1 hour") else buys0
    buys.join(clicks,
        col("buy_uid") === col("user_id") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("buy_ts"),
        "leftOuter")
      .select(col("buy_uid").as("user_id"), col("buy_id"), col("click_id"))
  }

  /** Bootstrap the persisted digest index from the base corpus: one
    * distinct digest per row, landed under the reserved batch_id = -1
    * partition (appended micro-batches each own their batch_id ≥ 0
    * partition — the partition IS the provenance). */
  def incrementalDedupBootstrap(base: DataFrame, idxPath: String): Unit =
    base.select(incrementalFp(col("text")).as("h")).distinct()
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id").parquet(idxPath)

  /** ONE micro-batch of the STREAMING incremental dedup — the
    * foreachBatch body (VERDICT r8 #4: the digest index as state,
    * classify-then-grow). The batch's docs are classified against the
    * index as of all STRICTLY earlier batches — `batch_id < batchId`,
    * never `<=`: a replayed batch must not see its own failed
    * attempt's partition, or every previously-kept doc would
    * reclassify as a dup and the replacement partition would lose
    * them. Both writes land in the batch's OWN batch_id partition
    * under dynamic partition overwrite, so a replay (restart after
    * crash, speculative re-execution) overwrites its prior output
    * byte-for-byte instead of double-appending — exactly-once on the
    * index and the classification without any transaction log.
    * Classification per doc: digest in the base partition → dup_base;
    * in any earlier batch's partition → dup_batch (an earlier
    * micro-batch kept it); first doc_id of its digest within this
    * batch → kept (and its digest joins the index); else dup_batch.
    * At 100 TB the index is ~16 bytes per base doc against KBs of
    * text and each micro-batch is admission-bounded, so the step
    * costs O(batch) + one index-side shuffle on the digest. */
  def incrementalDedupStep(s: SparkSession, idxPath: String, outPath: String)
                          (batch: DataFrame, batchId: Long): Unit = {
    val known = s.read.parquet(idxPath)
      .where(col("batch_id") < batchId)
      .groupBy("h").agg(min(col("batch_id")).as("src_batch"))
    val classified = batch
      .select(col("doc_id"), col("lang"), incrementalFp(col("text")).as("h"))
      .withColumn("first_id", min(col("doc_id")).over(Window.partitionBy("h")))
      .join(known, Seq("h"), "left")
      .withColumn("status",
        when(col("src_batch") === -1L, lit("dup_base"))
          .when(col("src_batch").isNotNull, lit("dup_batch"))
          .when(col("doc_id") =!= col("first_id"), lit("dup_batch"))
          .otherwise(lit("kept")))
      .select("doc_id", "lang", "h", "status")
      .persist()
    try {
      // classification FIRST, index growth LAST: a crash between the
      // two leaves the index without this batch's partition, so the
      // replay recomputes the identical classification (it reads only
      // strictly-earlier index state either way)
      classified.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(outPath)
      classified.where(col("status") === "kept").select("h")
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(idxPath)
    } finally classified.unpersist()
  }

  /** STREAMING dead-letter routing — the per-micro-batch half of
    * source_quarantine (see Scans.quarantineJsonRead): parse the
    * batch's raw JSONL lines PERMISSIVE, land malformed rows in the
    * quarantine sink with the raw payload intact and clean rows in
    * the clean sink. Both writes are batch_id-partitioned dynamic
    * overwrites, so a replayed batch (crash between write and
    * checkpoint commit) is byte-for-byte idempotent — the
    * incrementalDedupStep exactly-once discipline, without the state:
    * routing is stateless, so no ordering or index is involved. */
  def quarantineStep(s: SparkSession, ddl: String,
                     cleanSink: String, qSink: String)
                    (batch: DataFrame, batchId: Long): Unit = {
    val parsed = batch.withColumn("p", from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(ddl + ", _bad STRING"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_bad")))
      .select(col("value"), col("p.*"))
      .persist()
    try {
      parsed.where(col("_bad").isNotNull).select("value")
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(qSink)
      parsed.where(col("_bad").isNull).drop("_bad")
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(cleanSink)
    } finally parsed.unpersist()
  }

  /** Bucket count for the streaming-CDC snapshot layout. Fixture-scale
    * 8; at 100 TB this is the table's real bucket count (thousands) —
    * the step's cost is proportional to the AFFECTED buckets only,
    * never the snapshot size. */
  val CdcSnapshotBuckets = 8L

  /** Normalize an orders change feed into CDC rows: key = o_custkey,
    * version order = (o_orderdate, o_orderkey) — a TOTAL order, so
    * latest-wins is well-defined under any arrival order — and op =
    * 'd' (tombstone) for '5-LOW' priority rows, 'u' otherwise (the
    * merge_cdc_delete stand-in rule, shared with the oracle). */
  /** STATEFUL STREAMING EWMA — the live "current trend per user"
    * feature view as a flatMapGroupsWithState job: state is the user's
    * last ≤ 19 (tsUs, eventId, cents) observations, each arriving
    * event emits its decay-1/2 EWMA over the 20-row frame (exactly
    * [[graft.operators.Windows.ewmaHalving]]'s frame). Because every
    * term cents·2⁻ʲ is an exact double, the incremental fold and the
    * batch window land on IDENTICAL BITS — StreamEwmaSpec asserts
    * byte equality across real micro-batch boundaries, not tolerance
    * equality. Within a batch the group's rows sort by (ts, event_id)
    * (iterator order is not contractual); across batches arrival
    * order must respect event order per user, the file-source
    * discipline the spec stages. State is O(20) per user — the
    * bounded-frame property that keeps the state store flat at
    * 100 TB/day. */
  def ewmaStream(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ev.select(col("user_id").as[Long], col("event_id").as[Long],
              unix_micros(col("ts")).as[Long],
              floor(col("value") * 100).cast("long").as[Long])
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long, Long)], (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[List[(Long, Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Nil) // oldest-first
          val out = rows.toSeq.sortBy(r => (r._3, r._2)).map {
            case (_, eid, ts, cents) =>
              hist = (hist :+ ((ts, eid, cents))).takeRight(20)
              val n = hist.size
              // same left-to-right fold as the batch HOF; terms are
              // dyadic-exact so the sums are exact in any order
              val num = hist.iterator.zipWithIndex
                .map { case ((_, _, c), i) => c * math.pow(0.5, n - 1 - i) }.sum
              val den = hist.iterator.zipWithIndex
                .map { case (_, i) => math.pow(0.5, n - 1 - i) }.sum
              (eid, uid, graft.Tables.round6(num / den / 100.0))
          }
          state.update(hist.takeRight(19))
          out.iterator
      }
      .toDF("event_id", "user_id", "ewma")
  }

  /** Batch declaration of [[ewmaStream]]'s final state: the LAST
    * emission per user — the live feature value a serving store would
    * hold. Shares win_ewma's window frame; both window specs ride one
    * user_id partitioning. */
  def ewmaCurrentBatch(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, Window.currentRow)
    val wLast = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("lst", collect_list(col("cents")).over(w))
      .withColumn("rlast", row_number().over(wLast))
      .where(col("rlast") === 1)
      .select(col("user_id"),
        fround(
          expr("aggregate(transform(lst, (v, i) -> v * pow(0.5, size(lst) - 1 - i)), " +
               "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)") /
          expr("aggregate(transform(lst, (v, i) -> pow(0.5, size(lst) - 1 - i)), " +
               "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)") / 100.0, 6)
          .as("ewma_now"))
      .orderBy("user_id")
  }

  def cdcDelta(orders: DataFrame): DataFrame =
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
      when(col("o_orderpriority") === "5-LOW", lit("d")).otherwise(lit("u")).as("op"))
      .withColumn("bucket", pmod(col("o_custkey"), lit(CdcSnapshotBuckets)))

  /** Latest-wins condensation: one surviving change row per key —
    * the per-key argmax over (o_orderdate, o_orderkey). Tombstones
    * SURVIVE here (soft delete): keeping the winning tombstone as a
    * row makes the merge an idempotent absorption — re-applying any
    * already-applied delta reproduces the same state even when the
    * winner is a delete — and is exactly the merge-on-read tombstone
    * retention of Delta/Hudi-style tables (compaction drops them
    * later). The LIVE view filters `op <> 'd'`. */
  def cdcLatestWins(changes: DataFrame): DataFrame =
    changes
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .where(col("rn") === 1).drop("rn")

  /** ONE micro-batch of the STREAMING CDC apply — the foreachBatch
    * body that keeps a bucketed snapshot current from a change feed
    * (the warehouse "apply the CDC log" job, streaming-native).
    * Scale shape: the batch's affected bucket set is metadata-scale
    * (collected once), the snapshot is read PARTITION-PRUNED to those
    * buckets, merged latest-wins with the batch, and written back via
    * dynamic partition overwrite — cost O(batch + affected buckets),
    * never O(snapshot). Exactly-once without a transaction log: the
    * merge is idempotent (latest-wins over the union absorbs a
    * replayed delta, tombstones retained as soft deletes) and the
    * overwrite replaces affected buckets byte-for-byte, so the
    * crash-window replay (step ran, checkpoint commit lost) lands the
    * identical state. localCheckpoint breaks the read-from/write-to
    * self-dependence on the snapshot path (the affected-bucket slice
    * is batch-scale by construction; a production writer would land a
    * new snapshot version dir and flip a manifest instead).
    * StreamCdcApplySpec drives this through a real checkpointed
    * stream including the replay window. */
  def cdcApplyStep(s: SparkSession, snapPath: String)(batch: DataFrame, batchId: Long): Unit = {
    val delta = cdcDelta(batch)
    val affected = delta.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq
    val existing =
      if (new java.io.File(snapPath).exists())
        s.read.parquet(snapPath)
          .where(col("bucket").isin(affected: _*))
          .select(delta.columns.map(col): _*)
      else delta.limit(0)
    val merged = cdcLatestWins(existing.unionByName(delta)).localCheckpoint()
    merged.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(snapPath)
  }

  val queries: Map[String, Q] = Map(
    // foreachBatch sink: the escape hatch that gives a stream every
    // batch writer Spark has (parquet here; JDBC/upsert in prod).
    // Batch declaration = the same write-then-read roundtrip; the unit
    // test runs the real writeStream.foreachBatch and asserts the
    // landed rows equal the stream input exactly-once under
    // AvailableNow.
    "stream_foreach_batch" -> ((s, dir) => {
      val out = graft.Tables.scratch(dir, "febatch")
      events(s, dir).select("event_id", "event_type", "value")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("event_type")
        .agg(big(count(lit(1))).as("n"), r2(sum(col("value"))).as("val_sum"))
        .orderBy("event_type")
    }),
    "stream_static_join" -> ((s, dir) =>
      staticJoin(events(s, dir), customer(s, dir))
        .orderBy("c_mktsegment", "event_type")),
    "stream_stream_interval" -> ((s, dir) =>
      intervalJoinBatch(events(s, dir))
        .orderBy("user_id")),
    "stream_tumbling" -> ((s, dir) =>
      tumbling(events(s, dir)).orderBy("wstart", "event_type")),
    // In-stream drift monitor: day-bin counts run streaming-native
    // (see [[psiDayBinCounts]], driven stream≡batch by
    // StreamBatchSpec); the per-day PSI finalization is the
    // foreachBatch-side grid arithmetic of [[psiDrift]].
    "stream_drift_psi" -> ((s, dir) => psiDrift(events(s, dir))),
    // In-stream SRM gate: the experiment-validity monitor running
    // CONTINUOUSLY (an assignment bug should page before the readout,
    // not at it) — distinct-user arm counts stream-native (see
    // [[srmArmCounts]], driven stream≡batch by StreamBatchSpec), the
    // χ² readout is the SAME srmReadout as batch events_srm.
    "stream_srm" -> ((s, dir) => srmFromCounts(srmArmCounts(events(s, dir)))),
    // IN-STREAM FRESHNESS/VOLUME MONITOR — dq_freshness as a live job:
    // stage 1 lands the (lane, hour) cell grid (mergeable, bounded by
    // lanes × hours), stage 2 reads verdicts off the grid per
    // micro-batch. See [[freshnessCells]]/[[freshnessFromCells]];
    // StreamBatchSpec drives the real file-source job to equality.
    "stream_freshness" -> ((s, dir) =>
      freshnessFromCells(freshnessCells(events(s, dir)))),
    // LIVE MULTIMODAL INGEST: the media lane's real-PNG decode running
    // as a streaming stage — per micro-batch, ImageIO decodes actual
    // container bytes and the per-lang grid merges (count/dim sums/
    // mean gray are all mergeable aggregates; complete-mode or a
    // foreachBatch upsert in production). StreamBatchSpec drives the
    // REAL file-source job to equality with this batch declaration;
    // the oracle predicts the grid from the planted doc_id params.
    "stream_media_decode" -> ((s, dir) =>
      mediaDecodeGrid(documents(s, dir)).orderBy("lang")),

    // STREAMING AVRO INGEST (r19 — the Avro lane's streaming half,
    // the stream_delta_tail posture for event-log containers): Avro
    // object containers arrive as a file-source stream (binaryFile
    // assigns whole containers to tasks; decode = strict frame
    // validation + the official decoder, row-local), and the
    // per-container accounting grid merges (counts/key sums/decimal
    // totals are all mergeable — any micro-batch chunking composes).
    // Batch-declared here over the staged container set;
    // StreamAvroTailSpec drives the REAL binaryFile file-source job
    // (maxFilesPerTrigger=1 → AvailableNow → foreachBatch sink) to
    // the same totals with per-file batch attribution. The oracle
    // predicts every container's content from the orders table (the
    // staging rule is a closed-form residue split).
    "stream_avro_tail" -> ((s, dir) => {
      import s.implicits._
      val src = stageAvroTail(s, dir)
      s.read.format("binaryFile").option("pathGlobFilter", "*.avro")
        .load(src)
        .select(col("path"), col("content")).as[(String, Array[Byte])]
        .flatMap { case (p, bytes) =>
          val b = "batch-(\\d+)\\.avro$".r.findFirstMatchIn(p)
            .get.group(1).toLong
          graft.sources.AvroContainer.decodeRows(bytes).map(a =>
            (b, a(0).asInstanceOf[Long], a(1).asInstanceOf[Double]))
        }
        .toDF("batch", "o_orderkey", "o_totalprice")
        .groupBy("batch")
        .agg(big(count(lit(1))).as("n"),
             big(sum("o_orderkey")).as("key_sig"),
             dsum(col("o_totalprice")).as("total"))
        .orderBy("batch")
    }),

    // THE DEFLATE-CODED TAIL (r20 — the codec production event-log
    // streams actually arrive in): the same tail lane over
    // avro.codec=deflate containers — strict validation now includes
    // the per-block clean-inflate check, the official decoder's
    // DeflateCodec independently decompresses each arriving file, and
    // decode stays row-local so the streaming shape is unchanged.
    // Identical oracle to the uncompressed tail: the codec must be
    // invisible to the consumed rows.
    "stream_avro_tail_deflate" -> ((s, dir) => {
      import s.implicits._
      val src = stageAvroTailDeflate(s, dir)
      s.read.format("binaryFile").option("pathGlobFilter", "*.avro")
        .load(src)
        .select(col("path"), col("content")).as[(String, Array[Byte])]
        .flatMap { case (p, bytes) =>
          val b = "batch-(\\d+)\\.avro$".r.findFirstMatchIn(p)
            .get.group(1).toLong
          graft.sources.AvroContainer.decodeRows(bytes).map(a =>
            (b, a(0).asInstanceOf[Long], a(1).asInstanceOf[Double]))
        }
        .toDF("batch", "o_orderkey", "o_totalprice")
        .groupBy("batch")
        .agg(big(count(lit(1))).as("n"),
             big(sum("o_orderkey")).as("key_sig"),
             dsum(col("o_totalprice")).as("total"))
        .orderBy("batch")
    }),

    // STREAMING CDC CONSUMER over the exported Delta log — the tail
    // job a downstream sync runs against the lake: new _delta_log
    // files arrive as a file-source stream, dataChange=true adds
    // merge into the per-version ingested grid (the rewrite commit
    // contributes nothing — exactly-once per row), and the readout is
    // the tail position. Batch-declared here (the grid is plain
    // mergeable sums, so any micro-batch chunking composes);
    // StreamBatchSpec drives the REAL json file-source job
    // (AvailableNow → memory sink) to row equality.
    "stream_delta_tail" -> ((s, dir) => {
      val root = graft.operators.Scans.deltaFixture(s, dir)
      val logDir = graft.operators.Scans.deltaLogDir(root)
      val acts = s.read.schema(DeltaActionSchema)
        // pathGlobFilter on the DIRECTORY, never a glob in the path:
        // DataSource's FileStreamSink.hasMetadata probe getFileStatus-es
        // the literal path string, and a glob there logs a WARN + full
        // FileNotFoundException stack into the bench tail (r17 Wrong #3)
        .option("pathGlobFilter", "*.json").json(logDir)
        .select(col("add"), col("_metadata.file_path").as("log_file"))
      deltaTailFinalize(deltaTailGrid(acts))
    }),
    // Windowed top-k: top-3 event types per tumbling hour (see
    // [[topkCounts]]/[[rankTop3]] for the streaming split).
    "stream_topk_windowed" -> ((s, dir) =>
      rankTop3(topkCounts(events(s, dir))).orderBy("wstart", "rn")),
    "stream_freq_sketch" -> ((s, dir) =>
      freqSketchWindowed(events(s, dir)).orderBy("wstart", "rn")),
    "stream_outer_interval" -> ((s, dir) =>
      intervalJoinOuter(events(s, dir), withWatermarks = false)
        .groupBy("user_id")
        .agg(big(count(lit(1))).as("n_rows"),
             big(sum(when(col("click_id").isNull, 1).otherwise(0))).as("n_unattributed"))
        .orderBy("user_id")),
    "stream_sliding" -> ((s, dir) =>
      sliding(events(s, dir)).orderBy("wstart")),
    "stream_session" -> ((s, dir) =>
      sessionsBatch(events(s, dir)).orderBy("user_id", "session_start")),
    // Abandoned-session detection, batch-declared; the REAL
    // EventTimeTimeout flatMapGroupsWithState job is driven to
    // row-equality with this by StreamSessionTimeoutSpec.
    "stream_session_timeout" -> ((s, dir) =>
      abandonedSessionsBatch(events(s, dir))),
    // Per-user top-3 spend live view, batch-declared; the REAL Spark 4
    // transformWithState (StatefulProcessor + ListState, RocksDB) job
    // is driven to equality by StreamTwsTopkSpec.
    "stream_tws_topk" -> ((s, dir) => twsTopkBatch(events(s, dir))),
    // STREAMING dead-letter lane, batch-declared: the same planted
    // dirty JSONL as source_quarantine, with per-MICRO-BATCH
    // accounting (bid = key % 3 models the arrival chunking; the key
    // is regex-recovered from the RAW line so dead letters attribute
    // to their batch too). Routing is stateless/row-local, so any
    // chunking composes to the global rule trivially — the batch
    // declaration is exact; StreamQuarantineSpec drives the REAL
    // file-source foreachBatch job ([[quarantineStep]]) through
    // 3 micro-batches plus a replayed batch to the same totals.
    "stream_quarantine" -> ((s, dir) => {
      val src = scratch(dir, "stream_quarantine_src")
      val o = orders(s, dir).where(col("o_orderkey") % 7 === 0)
      val line = when(col("o_orderkey") % 13 === 0,
          concat(lit("{\"o_orderkey\": "), col("o_orderkey").cast("string"),
                 lit(", \"o_totalprice\": ")))
        .otherwise(to_json(struct(col("o_orderkey"), col("o_orderstatus"),
                                  col("o_totalprice"))))
      o.select(line.as("value")).write.mode("overwrite").text(src)
      val parsed = graft.operators.Scans.quarantineJsonRead(s, src,
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      parsed
        .withColumn("k",
          regexp_extract(col("value"), "\"o_orderkey\":\\s*(\\d+)", 1).cast("long"))
        .withColumn("bid", big(col("k") % 3))
        .withColumn("lane",
          when(col("_bad").isNotNull, "quarantine").otherwise("clean"))
        .groupBy("bid", "lane")
        .agg(big(count(lit(1))).as("n"), big(sum(col("k"))).as("key_sig"))
        .orderBy("bid", "lane")
    }),

    "stream_dedup" -> ((s, dir) =>
      dedupBatch(events(s, dir)).orderBy("user_id", "event_type")),
    "stream_stateful_count" -> ((s, dir) =>
      statefulCountsBatch(events(s, dir)).orderBy("user_id")),
    "stream_watermark_late" -> ((s, dir) =>
      watermarkLateBatch(events(s, dir)).orderBy("event_id")),
    // Live per-user EWMA feature view — batch declaration of the
    // stateful stream's final state (StreamEwmaSpec drives the real
    // flatMapGroupsWithState job to BYTE equality with this).
    "stream_ewma" -> ((s, dir) => ewmaCurrentBatch(events(s, dir))),

    // STREAMING incremental dedup, batch-declared (VERDICT r8 #4 —
    // dedup_incremental composed with the streaming surface): the
    // persisted digest index is the state; each micro-batch
    // classifies against the index as of all strictly-earlier batches
    // and grows it append-only by its newly-kept digests (see
    // [[incrementalDedupStep]]; StreamIncrementalDedupSpec runs the
    // REAL foreachBatch job across a restart and a replayed batch).
    // This batch declaration models the stream exactly because
    // micro-batches arrive in doc_id order: sequential
    // classify-then-grow over ordered chunks equals the global rule —
    // dup_base iff the digest is in the base corpus; kept iff first
    // incoming doc_id of its digest; else dup_batch. Chunk identity
    // (bid) only decides WHERE the kept doc lands, never any status.
    // STREAMING CDC APPLY, batch-declared: the live view of the
    // bucketed snapshot after the whole change feed has streamed
    // through [[cdcApplyStep]]. The declaration models the stream
    // exactly because latest-wins over a TOTAL version order is
    // associative-commutative-idempotent: sequential per-batch merges
    // (any chunking, any arrival order, any replay) equal one global
    // per-key argmax. Tombstone keys drop from the live view;
    // StreamCdcApplySpec runs the REAL checkpointed foreachBatch job
    // across a restart + replayed batch and pins snapshot == this.
    "stream_cdc_apply" -> ((s, dir) =>
      cdcLatestWins(cdcDelta(orders(s, dir)))
        .where(col("op") =!= "d")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey")),

    "stream_incremental_dedup" -> ((s, dir) => {
      val docs = documents(s, dir)
      val fp = incrementalFp(col("text"))
      val base = docs.where(col("doc_id") % 2 === 0)
        .select(fp.as("h")).distinct().withColumn("in_base", lit(1L))
      docs.where(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("lang"), fp.as("h"),
                expr("doc_id DIV 100").as("bid"))
        .withColumn("first_id", min(col("doc_id")).over(Window.partitionBy("h")))
        .join(base, Seq("h"), "left")
        .withColumn("status",
          when(col("in_base") === 1L, lit("dup_base"))
            .when(col("doc_id") =!= col("first_id"), lit("dup_batch"))
            .otherwise(lit("kept")))
        .groupBy("bid", "lang", "status")
        .agg(big(count(lit(1))).as("n"), big(min(col("doc_id"))).as("min_doc"))
        .orderBy("bid", "lang", "status")
    }),

    // Streaming EXTRACT: tail the framed sequential fixture through the
    // FramedSource micro-batch stream (offset = processed-file count
    // over the append-only directory), land typed columns in parquet
    // under AvailableNow, aggregate the landing. The oracle proves the
    // streamed extraction lossless against the original events — the
    // continuous version of source_framed_extract (i3cols' per-file
    // extract loop as a Structured Streaming job). The stream runs once
    // per (JVM, source state); its sink is content-keyed scratch.
    "stream_framed_extract" -> ((s, dir) => {
      val src = graft.operators.Scans.framedFixture(s, dir)
      // sink + checkpoint are keyed by the SOURCE fingerprint: a
      // regenerated fixture must get a fresh checkpoint (the old one
      // has the prior state's offsets committed) and a fresh landing
      // dir, never stale rows under a reused path
      val sig = java.security.MessageDigest.getInstance("MD5")
        .digest(graft.Tables.fsSig(s, s"$dir/events.parquet").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val sink = graft.Tables.scratch(dir, s"framed_stream_sink_$sig")
      val ckpt = graft.Tables.scratch(dir, s"framed_stream_ckpt_$sig")
      framedStreamMemo.getOrElseUpdate(sink, {
        // maxFilesPerTrigger bounds each micro-batch to 4 files; with
        // the source's native SupportsTriggerAvailableNow the 8-file
        // fixture drains in 2 bounded batches — the production cadence
        // (a landing job must bound per-batch admission or one huge
        // backlog batch OOMs the executors), not the engine's
        // single-batch fallback (VERDICT r4 #2)
        val q = s.readStream.format("graft.sources.FramedSource")
          .option("maxFilesPerTrigger", "4").load(src)
          .select("event_id", "event_type", "value", "pulses")
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        // loud on timeout: memoizing an unfinished landing would race
        // the still-running stream on every later read
        if (!q.awaitTermination(120000)) {
          q.stop()
          throw new IllegalStateException(
            "stream_framed_extract: AvailableNow landing did not finish in 120s")
        }
        true
      })
      s.read.parquet(sink)
        .groupBy("event_type")
        .agg(big(count(lit(1))).as("n"),
             dsum(col("value")).as("val_sum"),
             big(sum(size(col("pulses")))).as("n_pulses"))
        .orderBy("event_type")
    }),

    // STREAMING COMMITS ON A BRANCH + PUBLISH — the lakehouse
    // streaming-ingest pattern, joining this round's branch API to
    // Structured Streaming: every micro-batch lands as ONE atomic
    // versioned commit on branch `staging` (foreachBatch →
    // commitOnBranch: the batch's files + a manifest + an O(1)
    // pointer advance — readers of `main` never see a half-landed
    // batch, which is the isolation exactly-once landing needs),
    // then the backlog drains under AvailableNow and one PUBLISH
    // fast-forwards main. The oracle proves the streamed,
    // batch-at-a-time committed table equals the batch table —
    // stream ≡ batch through the whole commit protocol, not just
    // through an aggregation. Runs once per (JVM, source state);
    // 4-file staging dir + maxFilesPerTrigger=1 forces a REAL
    // multi-batch drain.
    "stream_branch_publish" -> ((s, dir) => {
      import graft.operators.Scans
      val sig = java.security.MessageDigest.getInstance("MD5")
        .digest(graft.Tables.fsSig(s, s"$dir/orders.parquet").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val stage = graft.Tables.scratch(dir, s"wap_stream_src_$sig")
      val root = graft.Tables.scratch(dir, s"wap_stream_tbl_$sig")
      val ckpt = graft.Tables.scratch(dir, s"wap_stream_ckpt_$sig")
      branchStreamMemo.getOrElseUpdate(root, {
        orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
          .repartition(4).write.mode("overwrite").parquet(stage)
        Scans.initVersionedTable(root)
        Scans.createBranch(root, "main", 1)
        Scans.createBranch(root, "staging", 1)
        val sch = s.read.parquet(stage).schema
        val q = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                           id: Long) =>
            Scans.commitOnBranch(s, root, "staging", df.toDF(), f"sb$id%03d"); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        if (!q.awaitTermination(120000)) {
          q.stop()
          throw new IllegalStateException(
            "stream_branch_publish: AvailableNow drain did not finish in 120s")
        }
        Scans.writeTag(root, "prepublish", Scans.resolveBranch(root, "main"))
        Scans.publishBranch(root, "staging", "main")
        true
      })
      Scans.snapshotRead(s, root, Scans.resolveBranch(root, "main"))
        .groupBy("o_orderstatus")
        .agg(big(count(lit(1))).as("n_orders"),
             big(sum(floor(col("o_totalprice") * 100).cast("long")))
               .as("total_cents"))
        .orderBy("o_orderstatus")
    })
  )

  /** Once-per-(JVM, source-state) guard for the streaming-extract
    * landing job. */
  private val framedStreamMemo =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Once-per-(JVM, source-state) guard for the streaming
    * branch-commit + publish job. */
  private val branchStreamMemo =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** stream_avro_tail's container count — each staged container holds
    * the orders residue class o_orderkey % AvroTailBatches == b, so
    * the oracle predicts every container's content closed-form. */
  val AvroTailBatches = 5

  /** Stage the Avro tail's watched directory: one hand-encoded
    * container per residue class, mtimes strictly increasing so the
    * file-source's batch order is deterministic. Memoized per (JVM,
    * fixture state) — the containers are pure functions of orders. */
  private val avroTailMemo =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  def stageAvroTail(s: SparkSession, dir: String): String = {
    val src = scratch(dir, "stream_avro_src")
    avroTailMemo.getOrElseUpdate(
      s"$src|${graft.Tables.fsSig(s, s"$dir/orders.parquet")}", {
        val A = graft.sources.AvroContainer
        val fields = Seq(A.Field("o_orderkey", A.ALong),
                         A.Field("o_totalprice", A.ADouble))
        val d = java.nio.file.Paths.get(src)
        java.nio.file.Files.createDirectories(d)
        val rows = orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice")).collect()
        (0 until AvroTailBatches).foreach { b =>
          val recs = rows
            .filter(_.getLong(0) % AvroTailBatches == b)
            .sortBy(_.getLong(0)).iterator
            .map(r => Seq[Any](r.getLong(0), r.getDouble(1)))
          val f = d.resolve(s"batch-$b.avro")
          java.nio.file.Files.write(f,
            A.encode("order_tail", fields, recs, s"avrotail:$b"))
          f.toFile.setLastModified(1700000000000L + b * 60000L)
        }
      })
    src
  }

  /** The deflate twin of [[stageAvroTail]] — same residue split and
    * mtime ladder, containers deflate-coded (distinct sync seeds so
    * the two stage dirs never share bytes). Memoized per (JVM,
    * fixture state). */
  private val avroTailDeflateMemo =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  def stageAvroTailDeflate(s: SparkSession, dir: String): String = {
    val src = scratch(dir, "stream_avro_deflate_src")
    avroTailDeflateMemo.getOrElseUpdate(
      s"$src|${graft.Tables.fsSig(s, s"$dir/orders.parquet")}", {
        val A = graft.sources.AvroContainer
        val fields = Seq(A.Field("o_orderkey", A.ALong),
                         A.Field("o_totalprice", A.ADouble))
        val d = java.nio.file.Paths.get(src)
        java.nio.file.Files.createDirectories(d)
        val rows = orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice")).collect()
        (0 until AvroTailBatches).foreach { b =>
          val recs = rows
            .filter(_.getLong(0) % AvroTailBatches == b)
            .sortBy(_.getLong(0)).iterator
            .map(r => Seq[Any](r.getLong(0), r.getDouble(1)))
          val f = d.resolve(s"batch-$b.avro")
          java.nio.file.Files.write(f,
            A.encode("order_tail", fields, recs, s"avrotailz:$b",
                     codec = "deflate"))
          f.toFile.setLastModified(1700000000000L + b * 60000L)
        }
      })
    src
  }

  /** stream_avro_tail's per-batch step, shared with the REAL
    * streaming job in StreamAvroTailSpec: decode each arriving
    * container row-locally and append its rows with the batch id. */
  def avroTailStep(spark: SparkSession, sink: String)(
      df: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    df.select(col("content")).as[Array[Byte]]
      .flatMap(bytes => graft.sources.AvroContainer.decodeRows(bytes)
        .map(a => (a(0).asInstanceOf[Long], a(1).asInstanceOf[Double])))
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(sink)
  }

  val oracle: Map[String, String] = Map(
    // each staged container is a closed-form residue class of orders
    "stream_avro_tail" ->
      (s"SELECT CAST(o_orderkey % $AvroTailBatches AS BIGINT) AS batch, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(o_orderkey) AS BIGINT) AS key_sig, " +
       s"${dsumSql("o_totalprice")} AS total " +
       "FROM orders GROUP BY 1 ORDER BY batch"),
    // the codec must be invisible: identical oracle to the
    // uncompressed tail
    "stream_avro_tail_deflate" ->
      (s"SELECT CAST(o_orderkey % $AvroTailBatches AS BIGINT) AS batch, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(o_orderkey) AS BIGINT) AS key_sig, " +
       s"${dsumSql("o_totalprice")} AS total " +
       "FROM orders GROUP BY 1 ORDER BY batch"),

    // the streamed, commit-at-a-time table must equal the batch table
    "stream_branch_publish" ->
      ("SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents " +
       "FROM orders GROUP BY 1 ORDER BY o_orderstatus"),

    // win_ewma's pair-join formulation restricted to each user's last
    // event — the stream's final state per user
    "stream_ewma" ->
      ("WITH r AS (SELECT event_id, user_id, " +
       "CAST(FLOOR(value * 100) AS BIGINT) AS cents, " +
       "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, " +
       "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rlast " +
       "FROM events), " +
       "p AS (SELECT r1.user_id, " +
       "SUM(r2.cents * POWER(0.5, r1.rn - r2.rn)) AS num, " +
       "SUM(POWER(0.5, r1.rn - r2.rn)) AS den " +
       "FROM r r1 JOIN r r2 ON r2.user_id = r1.user_id " +
       "AND r1.rn - r2.rn BETWEEN 0 AND 19 " +
       "WHERE r1.rlast = 1 GROUP BY 1) " +
       "SELECT user_id, " + froundSql("num / den / 100.0", 6) + " AS ewma_now " +
       "FROM p ORDER BY user_id"),
    // global latest-wins over the total (o_orderdate, o_orderkey)
    // version order, tombstones ('5-LOW') excluded from the live view
    "stream_cdc_apply" ->
      ("WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority, " +
       "ROW_NUMBER() OVER (PARTITION BY o_custkey " +
       "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) " +
       "SELECT o_custkey, o_orderkey, o_totalprice FROM r " +
       "WHERE rn = 1 AND o_orderpriority <> '5-LOW' ORDER BY o_custkey"),
    // the chunk-sequential stream equals this global classification
    // (chunks arrive in doc_id order; see the query comment)
    "stream_incremental_dedup" ->
      ("WITH fp AS (SELECT doc_id, lang, MD5(SUBSTRING(LOWER(text), 1, 32)) AS h, " +
       "CAST(doc_id // 100 AS BIGINT) AS bid FROM documents), " +
       "base AS (SELECT DISTINCT h FROM fp WHERE doc_id % 2 = 0), " +
       "inc AS (SELECT doc_id, lang, h, bid FROM fp WHERE doc_id % 2 <> 0), " +
       "fi AS (SELECT h, MIN(doc_id) AS first_id FROM inc GROUP BY h), " +
       "cls AS (SELECT i.bid, i.lang, i.doc_id, " +
       "CASE WHEN b.h IS NOT NULL THEN 'dup_base' " +
       "WHEN i.doc_id <> fi.first_id THEN 'dup_batch' ELSE 'kept' END AS status " +
       "FROM inc i JOIN fi USING (h) LEFT JOIN base b ON i.h = b.h) " +
       "SELECT bid, lang, status, CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(MIN(doc_id) AS BIGINT) AS min_doc " +
       "FROM cls GROUP BY bid, lang, status ORDER BY bid, lang, status"),
    // the streamed extraction must be lossless: aggregates over the
    // landed columns equal the same aggregates over the source events
    // (pulses count has the closed form event_id % 5)
    "stream_framed_extract" ->
      ("SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       s"${dsumSql("value")} AS val_sum, " +
       "CAST(SUM(event_id % 5) AS BIGINT) AS n_pulses " +
       "FROM events GROUP BY event_type ORDER BY event_type"),
    // micro-batch watermark model (see watermarkLateBatch): batch id =
    // arrival-order event_id DIV 1000, watermark for a batch = max
    // event time over all PRIOR batches − 1h. Deterministic, so the
    // streaming-semantics model is fully oracle-checked (it was a
    // property-tested no_oracle row through r3).
    "stream_watermark_late" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, ts, event_id // 1000 AS bid FROM events), " +
       "bmax AS (SELECT bid, MAX(epoch_us(ts)) AS mx FROM e GROUP BY bid), " +
       "wm AS (SELECT x.bid, MAX(p.mx) AS prev_max FROM bmax x " +
       "LEFT JOIN bmax p ON p.bid < x.bid GROUP BY x.bid) " +
       "SELECT e.event_id, e.user_id, e.event_type, e.ts " +
       "FROM e JOIN wm USING (bid) " +
       "WHERE prev_max IS NULL OR epoch_us(e.ts) >= prev_max - 3600000000 " +
       "ORDER BY event_id"),
    "stream_foreach_batch" ->
      ("SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS val_sum " +
       "FROM events GROUP BY event_type ORDER BY event_type"),
    "stream_static_join" ->
      ("SELECT c_mktsegment, event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       "ROUND(SUM(value), 2) AS val_sum " +
       "FROM events JOIN customer ON user_id = c_custkey " +
       "GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type"),
    "stream_outer_interval" ->
      ("SELECT b.user_id, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
       "CAST(SUM(CASE WHEN c.click_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unattributed " +
       "FROM (SELECT user_id, ts AS buy_ts, event_id FROM events WHERE event_type = 'purchase') b " +
       "LEFT JOIN (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c " +
       "ON b.user_id = c.user_id " +
       "AND c.click_ts >= b.buy_ts - INTERVAL 30 MINUTE AND c.click_ts <= b.buy_ts " +
       "GROUP BY b.user_id ORDER BY b.user_id"),
    "stream_stream_interval" ->
      ("SELECT b.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
       "CAST(COUNT(DISTINCT b.event_id) AS BIGINT) AS n_attributed " +
       "FROM (SELECT user_id, ts AS buy_ts, event_id FROM events WHERE event_type = 'purchase') b " +
       "JOIN (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c " +
       "ON b.user_id = c.user_id " +
       "AND c.click_ts >= b.buy_ts - INTERVAL 30 MINUTE AND c.click_ts <= b.buy_ts " +
       "GROUP BY b.user_id ORDER BY b.user_id"),
    "stream_tumbling" ->
      ("SELECT DATE_TRUNC('hour', ts) AS wstart, event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       "ROUND(SUM(value), 2) AS val_sum FROM events " +
       "GROUP BY wstart, event_type ORDER BY wstart, event_type"),
    // the statistic has ONE definition (srmReadout) and therefore ONE
    // oracle derivation — batch events_srm's, referenced verbatim
    "stream_srm" -> graft.operators.Aggregations.oracle("events_srm"),
    // the ALIGNED-HOUR semantics replayed from raw events: head-hour
    // bucket equality, aligned span, the shared SLA constant
    "stream_freshness" ->
      ("WITH g AS (SELECT MAX(epoch_us(ts)) AS gmax, MIN(epoch_us(ts)) AS gmin " +
       "FROM events), " +
       "t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       "MAX(ts) AS last_seen, MAX(epoch_us(ts)) AS tmax, " +
       "CAST(SUM(CASE WHEN epoch_us(ts) // 3600000000 = g.gmax // 3600000000 " +
       "THEN 1 ELSE 0 END) AS BIGINT) AS n_head_hour, " +
       "MAX(g.gmax) AS gmax, MAX(g.gmin) AS gmin " +
       "FROM events, g GROUP BY event_type) " +
       "SELECT event_type, n, last_seen, " +
       "CAST((gmax - tmax) // 60000000 AS BIGINT) AS minutes_behind, " +
       s"((gmax - tmax) // 60000000) <= ${graft.operators.Relational.FreshnessSlaMinutes} AS is_fresh, " +
       "n_head_hour, " +
       graft.Tables.froundSql(
         "CAST(n AS DOUBLE) / CAST((gmax // 3600000000) - (gmin // 3600000000) + 1 AS DOUBLE)", 2) +
       " AS hourly_avg FROM t ORDER BY event_type"),
    // the streamed grid predicted from the planted PNG parameters —
    // the engine must round-trip real containers to match
    "stream_media_decode" ->
      ("SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_images, " +
       "CAST(SUM(8 + doc_id % 24) AS BIGINT) AS sum_width, " +
       "CAST(SUM(8 + doc_id % 16) AS BIGINT) AS sum_height, " +
       froundSql(dsum6Sql("CAST(doc_id % 251 AS DOUBLE)") + " / COUNT(*)", 4) +
       " AS avg_gray " +
       "FROM documents WHERE doc_id % 3 = 0 GROUP BY lang ORDER BY lang"),
    // the tail sees the base write and the append exactly once each;
    // the OPTIMIZE rewrite contributes nothing (dataChange=false)
    "stream_delta_tail" -> {
      val cutoff = graft.operators.Scans.TimeTravelCutoff
      val pre = "(SELECT COUNT(*) FROM orders WHERE o_orderdate < " +
        s"TIMESTAMP '$cutoff')"
      val post = "(SELECT COUNT(*) FROM orders WHERE o_orderdate >= " +
        s"TIMESTAMP '$cutoff')"
      s"SELECT CAST(0 AS BIGINT) AS version, CAST($pre AS BIGINT) AS rows_ingested, " +
      s"CAST($pre AS BIGINT) AS rows_total " +
      "UNION ALL " +
      s"SELECT CAST(1 AS BIGINT), CAST($post AS BIGINT), " +
      s"CAST($pre + $post AS BIGINT) " +
      "ORDER BY version"
    },
    // identical fixed grid, baseline freeze, union-of-bins semantics
    // and 1e-6 clamp; LN natural, dsum6 term discipline
    "stream_drift_psi" ->
      ("WITH c AS (SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day, " +
       s"LEAST(CAST(FLOOR(value * 100) AS BIGINT) // $StreamPsiBinCents, " +
       s"${graft.operators.Aggregations.PsiBins - 1L}) AS bin, COUNT(*) AS n " +
       "FROM events GROUP BY 1, 2), " +
       "allb AS (SELECT DISTINCT bin FROM c), " +
       s"base AS (SELECT bin, SUM(n) AS n_a FROM c WHERE day < $StreamPsiBaselineDays GROUP BY 1), " +
       "bt AS (SELECT SUM(n_a) AS na_t FROM base), " +
       s"days AS (SELECT day, SUM(n) AS nb_t FROM c WHERE day >= $StreamPsiBaselineDays GROUP BY 1), " +
       "g AS (SELECT d.day, d.nb_t, b.bin FROM days d CROSS JOIN allb b), " +
       "j AS (SELECT g.day, g.nb_t, " +
       "GREATEST(CAST(COALESCE(base.n_a, 0) AS DOUBLE) / bt.na_t, 0.000001) AS p, " +
       "GREATEST(CAST(COALESCE(cur.n, 0) AS DOUBLE) / g.nb_t, 0.000001) AS q " +
       "FROM g CROSS JOIN bt LEFT JOIN base ON base.bin = g.bin " +
       "LEFT JOIN c cur ON cur.day = g.day AND cur.bin = g.bin) " +
       "SELECT CAST(day AS BIGINT) AS day, CAST(MIN(nb_t) AS BIGINT) AS n_events, " +
       froundSql(dsum6Sql("(p - q) * LN(p / q)"), 6) + " AS psi " +
       "FROM j GROUP BY day ORDER BY day"),
    "stream_topk_windowed" ->
      ("WITH counts AS (SELECT DATE_TRUNC('hour', ts) AS wstart, event_type, " +
       "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY wstart, event_type) " +
       "SELECT wstart, event_type, n, rn FROM (SELECT wstart, event_type, n, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY wstart ORDER BY n DESC, event_type) AS BIGINT) AS rn " +
       "FROM counts) WHERE rn <= 3 ORDER BY wstart, rn"),
    // 6-hour tumbling buckets: TIME_BUCKET matches Spark's epoch-aligned
    // window(); capacity 8 > 5 event types, so the sketch is exact and
    // the oracle is a plain ranked count
    "stream_freq_sketch" ->
      ("WITH counts AS (SELECT TIME_BUCKET(INTERVAL 6 HOUR, ts) AS wstart, event_type, " +
       "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY wstart, event_type) " +
       "SELECT wstart, rn, event_type, n FROM (SELECT wstart, event_type, n, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY wstart ORDER BY n DESC, event_type) AS BIGINT) AS rn " +
       "FROM counts) WHERE rn <= 3 ORDER BY wstart, rn"),
    // Every event belongs to exactly 4 sliding windows: starts at
    // floor(ts/15min) - k*15min for k in 0..3. make_timestamp takes µs.
    "stream_sliding" ->
      ("SELECT MAKE_TIMESTAMP((epoch_us(ts) // 900000000) * 900000000 - CAST(k AS BIGINT) * 900000000) AS wstart, " +
       "CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS val_sum " +
       "FROM events, (SELECT UNNEST([0,1,2,3]) AS k) " +
       "GROUP BY wstart ORDER BY wstart"),
    "stream_session" ->
      ("WITH flags AS (SELECT user_id, event_id, ts, " +
       "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 30 MINUTE " +
       "THEN 0 ELSE 1 END AS new_session FROM events), " +
       "ids AS (SELECT user_id, ts, " +
       "SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id " +
       "FROM flags) " +
       "SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events, " +
       "epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us " +
       "FROM ids GROUP BY user_id, session_id ORDER BY user_id, session_start"),
    // same gaps-and-islands partition; the last event resolves by a
    // rank-1 window over the (ts, event_id) total order
    "stream_session_timeout" ->
      ("WITH flags AS (SELECT user_id, event_id, ts, event_type, " +
       "CAST(FLOOR(value * 100) AS BIGINT) AS cents, " +
       "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 30 MINUTE " +
       "THEN 0 ELSE 1 END AS new_session FROM events), " +
       "ids AS (SELECT *, " +
       "SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid " +
       "FROM flags), " +
       "lastt AS (SELECT user_id, sid, event_type AS last_type FROM " +
       "(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY ts DESC, event_id DESC) AS rn FROM ids) " +
       "WHERE rn = 1) " +
       "SELECT i.user_id, MIN(i.ts) AS session_start, MAX(i.ts) AS session_end, " +
       "CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(i.cents) AS BIGINT) AS cents, " +
       "MAX(l.last_type) AS last_type, MAX(l.last_type) <> 'purchase' AS abandoned " +
       "FROM ids i JOIN lastt l ON l.user_id = i.user_id AND l.sid = i.sid " +
       "GROUP BY i.user_id, i.sid ORDER BY 1, 2"),
    // the identical (cents DESC, ts, event_id) total order
    "stream_tws_topk" ->
      ("SELECT user_id, rnk, event_id, cents FROM " +
       "(SELECT user_id, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY user_id " +
       "ORDER BY CAST(FLOOR(value * 100) AS BIGINT) DESC, ts, event_id) AS BIGINT) AS rnk " +
       "FROM events) WHERE rnk <= 3 ORDER BY user_id, rnk"),
    "stream_stateful_count" ->
      ("SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events " +
       "GROUP BY user_id ORDER BY user_id"),
    "stream_dedup" ->
      ("SELECT user_id, event_type, event_id, ts FROM " +
       "(SELECT user_id, event_type, event_id, ts, " +
       "ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events) " +
       "WHERE rn = 1 ORDER BY user_id, event_type"),
    // both lanes and the batch attribution are pure key arithmetic
    // over the planted corruption rule
    "stream_quarantine" ->
      ("WITH src AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 = 0) " +
       "SELECT CAST(k % 3 AS BIGINT) AS bid, " +
       "CASE WHEN k % 13 = 0 THEN 'quarantine' ELSE 'clean' END AS lane, " +
       "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS key_sig " +
       "FROM src GROUP BY 1, 2 ORDER BY bid, lane")
  )
}
