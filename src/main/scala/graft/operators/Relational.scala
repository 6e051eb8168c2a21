package graft.operators

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational surface: pivot/unpivot reshaping, correlated
  * subqueries, lateral joins, ordered string aggregation, deterministic
  * mode, FILTER-clause conditional aggregation, hash-deterministic
  * sampling, and a recursive CTE. These are the SQL-facing operators a
  * user of a full analytics engine expects beyond the core
  * scan/join/agg set (SURVEY.md §2.2 north star). Every query is
  * expressed so Catalyst keeps the scalable plan: correlated
  * subqueries decorrelate into aggregate joins, the lateral top-k
  * becomes a ranked window, pivot is a single hash aggregate over
  * conditional projections.
  */
object Relational {

  /** sample_group_kfold fold count (shared with the oracle). */
  val KFolds = 5

  private val Segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** yyyymmdd BIGINT of a date/timestamp column — the engine-portable
    * day key (raw timestamps never cross the oracle boundary). */
  private def ymd(c: org.apache.spark.sql.Column) =
    big(year(c) * 10000 + month(c) * 100 + dayofmonth(c))

  /** Oracle-SQL fragment matching [[ymd]] — the ONE copy of the
    * yyyymmdd encoding on the SQL side. */
  private def ymdSql(expr: String): String =
    s"EXTRACT(YEAR FROM $expr) * 10000 + EXTRACT(MONTH FROM $expr) * 100 + " +
    s"EXTRACT(DAY FROM $expr)"

  /** Snapshot/delta cutoff shared by the CDC merge family. */
  private val MergeCutoff = lit("1999-01-01").cast("timestamp")

  /** dq_k_anonymity: the minimum equivalence-class size (Sweeney's k).
    * Shared verbatim with the oracle SQL. */
  val KAnonymity = 5

  /** dq_freshness: a lane is fresh while its newest event is within
    * this many minutes of the corpus head. Shared with the oracle. */
  val FreshnessSlaMinutes = 60

  /** dq_dp_noise: the privacy budget ε of the Laplace release
    * (sensitivity 1 ⇒ noise scale b = 1/ε). Shared with the oracle. */
  val DpEpsilon = 0.5

  /** dq_dp_sum: per-unit contribution clamp — the sum's sensitivity
    * after clamping to [0, DpClampHi], so noise scale = DpClampHi/ε.
    * Shared with the oracle. */
  val DpClampHi = 2000.0

  /** dq_dp_quantile's fixed candidate grid: band midpoints spanning
    * the acctbal domain [−1000, 10000) at width 500 — the exponential
    * mechanism selects among FIXED candidates, never data-derived
    * ones (data-derived candidates would leak). Shared verbatim with
    * the oracle. */
  val DpQuantileGrid: Array[Double] =
    (0 until 22).map(i => -750.0 + 500.0 * i).toArray

  /** The DP releases' seeded draw, ONE copy (review catch — the
    * bit-exactness-critical md5→uniform→clamp chain must not drift
    * between release sites): v ∈ (−0.5, 0.49999999], key-stable per
    * (prefix, key); the upper clamp keeps ln(1−2|v|) total. */
  private def dpDraw(prefix: String, key: org.apache.spark.sql.Column) = {
    val u = (conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 8),
                  16, 10).cast("long") + 1).cast("double") / lit(4294967296.0)
    least(u - 0.5, lit(0.49999999))
  }

  /** Laplace(b) noise from a [[dpDraw]] value via the inverse CDF,
    * fround6-pinned (the one transcendental — sample_weighted's ln
    * discipline). */
  private def dpLaplace(b: Double, v: org.apache.spark.sql.Column) =
    fround(-lit(b) * signum(v) * log(lit(1.0) - lit(2.0) * abs(v)), 6)

  /** sample_pack_chunks: tokens per packed training sequence. */
  val PackCtxTokens = 512

  /** sample_neyman_alloc's total draw budget — a LITERAL shared with
    * the oracle (the largest-remainder rounding makes the per-stratum
    * allocations sum to exactly this). */
  val NeymanBudget = 1000

  /** The whole allocation on any (lang, x) frame — factored out so
    * NeymanSpec can plant strata with hand-computable σ and
    * allocations. See the sample_neyman_alloc query comment for the
    * algorithm and pinning discipline. */
  def neymanAlloc(rows: org.apache.spark.sql.DataFrame, budget: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = rows
      .groupBy("lang")
      .agg(big(count(lit(1))).as("n_docs"),
           dsum6(col("x")).as("s1"),
           dsum6(col("x") * col("x")).as("s2"))
      .select(col("lang"), col("n_docs"),
        fround(sqrt(greatest(
          (col("s2") - col("s1") * col("s1") / col("n_docs")) /
            (col("n_docs") - 1), lit(0.0))), 6).as("sd"))
    val tot = st.agg(dsum6(col("n_docs") * col("sd")).as("wtot"))
    val based = st.crossJoin(broadcast(tot))
      .withColumn("exact",
        fround(lit(budget) * col("n_docs") * col("sd") / col("wtot"), 6))
      .withColumn("base", floor(col("exact")).cast("long"))
      .withColumn("rem", fround(col("exact") - col("base"), 6))
    val leftover = based
      .agg((lit(budget) - sum(col("base"))).cast("long").as("lo"))
    val w = Window.orderBy(col("rem").desc, col("lang"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rnk", row_number().over(w))
      .select(col("lang"), col("n_docs"), col("sd"),
              col("exact").as("exact_alloc"),
              big(col("base") +
                  when(col("rnk") <= col("lo"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("lang")
  }

  /** sample_pack_chunks: the bound on level-2 prefix-sum buckets —
    * the global bucket-offset window never sees more rows than this,
    * whatever the corpus size. */
  val PackChunkBuckets = 4096

  /** The packing kernel behind sample_pack_chunks (and the
    * Corpus.packChunks facade): per document, its EXCLUSIVE token
    * offset in the deterministic doc_id-ordered global stream and the
    * [first_c, last_c] chunk span at `ctx`-token capacity — computed
    * as a TWO-LEVEL distributed prefix sum (≤ [[PackChunkBuckets]]
    * order-preserving range buckets; only the bucket-total table
    * crosses a global window). Requires doc_id + text. */
  def packChunkOffsets(docs: org.apache.spark.sql.DataFrame,
                       ctx: Int): org.apache.spark.sql.DataFrame = {
    val d = docs
      .select(col("doc_id"), big(size(split(lower(col("text")), " "))).as("n"))
    val span = d.agg(ceil((max(col("doc_id")) + 1).cast("double") /
                          PackChunkBuckets).cast("long").as("bspan"))
    val b = d.crossJoin(broadcast(span))
      .withColumn("bucket", floor(col("doc_id") / col("bspan")))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inCum = b.withColumn("cum_in", sum(col("n")).over(wIn))
    // bucket totals: ≤ PackChunkBuckets rows — the ONLY global window
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = b.groupBy("bucket").agg(sum(col("n")).as("bt"))
      .withColumn("boff", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select("bucket", "boff")
    val C = lit(ctx)
    inCum.join(broadcast(offs), Seq("bucket"))
      .withColumn("off", col("boff") + col("cum_in") - col("n"))
      .withColumn("first_c", floor(col("off") / C))
      .withColumn("last_c", floor((col("off") + col("n") - 1) / C))
      .select("doc_id", "n", "off", "first_c", "last_c")
  }

  /** dq_freshness's whole pipeline on any (event_type, ts) frame —
    * factored out so DqFreshnessSpec can plant a stale lane. ONE
    * conditional pass: corpus bounds broadcast from a 1-row
    * aggregate, then a single per-type hash aggregate; every gate
    * decides on integer microseconds. */
  def freshnessOf(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bounds = ev.agg(max(unix_micros(col("ts"))).as("gmax"),
                        min(unix_micros(col("ts"))).as("gmin"))
    ev.crossJoin(broadcast(bounds))
      .groupBy("event_type")
      .agg(big(count(lit(1))).as("n"),
           max(col("ts")).as("last_seen"),
           max(unix_micros(col("ts"))).as("tmax"),
           big(sum(when(unix_micros(col("ts")) > col("gmax") - 3600000000L, 1L)
             .otherwise(0L))).as("n_last_hour"),
           max(col("gmax")).as("gmax"), max(col("gmin")).as("gmin"))
      .select(col("event_type"), col("n"), col("last_seen"),
        big(expr("(gmax - tmax) DIV 60000000")).as("minutes_behind"),
        (expr("(gmax - tmax) DIV 60000000") <= FreshnessSlaMinutes)
          .as("is_fresh"),
        col("n_last_hour"),
        fround(col("n").cast("double") /
          expr("(gmax - gmin) DIV 3600000000 + 1").cast("double"), 2)
          .as("hourly_avg"))
      .orderBy("event_type")
  }

  /** agg_incremental_retract: deterministic tombstone rule carving the
    * delete batch out of the pre-cutoff snapshot (the fixture carries
    * no real change feed) — finished orders with key ≡ 0 (mod 7).
    * Shared verbatim with the oracle SQL. */
  val RetractMod = 7

  /** Latest order per customer (the change-feed "condense to one row
    * per key" step shared by merge_upsert and merge_cdc_delete): one
    * ranked window — ONE shuffle on the entity key — columns prefixed
    * so the two merge sides never collide. */
  private def latestPerCustomer(df: org.apache.spark.sql.DataFrame,
                                tag: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("o_custkey").as(s"${tag}_custkey"),
              col("o_orderkey").as(s"${tag}_orderkey"),
              col("o_totalprice").as(s"${tag}_price"),
              col("o_orderpriority").as(s"${tag}_priority"))
  }

  /** SCD2 history over the orders change feed — the ONE definition
    * shared by `scd2_history` (the dump) and `join_pit_scd2` (the
    * point-in-time consumer): per customer, run-compressed priority
    * versions with [valid_from, valid_to) yyyymmdd validity. Both
    * window layers share the o_custkey partitioning → one shuffle. */
  def scd2Of(od: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    od.withColumn("prev", lag(col("o_orderpriority"), 1).over(ord))
      .where(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      .withColumn("version", big(row_number().over(ord)))
      .withColumn("valid_from", ymd(col("o_orderdate")))
      .withColumn("valid_to", lead(ymd(col("o_orderdate")), 1).over(ord))
      .select(col("o_custkey"), col("version"), col("o_orderpriority"),
              col("valid_from"), col("valid_to"))
  }

  /** Point-in-time resolution: each fact row (o_custkey, at, …) gains
    * `prio_at_ship` = the [[scd2Of]] version valid at `at` ('none'
    * before the first version). The as-of union+window pattern — dim
    * version rows (tag 0) and fact rows (tag 1) share ONE shuffle on
    * the entity key, and a running struct-max over (valid_from,
    * version) resolves the newest version at or before each fact
    * row-locally. Same-day version ties resolve to the highest
    * version — exactly the [valid_from, valid_to) interval semantics
    * (a zero-width same-day version matches nothing on either
    * engine); PitScd2Spec pins both edges. */
  def pitPriority(dim: org.apache.spark.sql.DataFrame,
                  facts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = dim.select(col("o_custkey"), lit(0).as("tag"),
      col("valid_from").as("at"), col("version"),
      col("o_orderpriority").as("prio"))
    val f = facts.withColumn("tag", lit(1))
      .withColumn("version", lit(null).cast("long"))
      .withColumn("prio", lit(null).cast("string"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("at"), col("tag"), col("version"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.unionByName(f, allowMissingColumns = true)
      .withColumn("cur", max(when(col("tag") === 0,
        struct(col("at"), col("version"), col("prio")))).over(w))
      .where(col("tag") === 1)
      .withColumn("prio_at_ship", coalesce(col("cur.prio"), lit("none")))
      .drop("tag", "version", "prio", "cur")
  }

  val queries: Map[String, Q] = Map(
    // Wide reshape: one row per nation, one column per market segment.
    // With the value list given explicitly, pivot compiles to ONE
    // hash aggregate of conditional sums — no per-value scan, no
    // driver-side distinct-value collection (which at 100 TB would be
    // a full extra pass before planning even starts).
    "pivot_wide" -> ((s, dir) =>
      customer(s, dir)
        .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment", Segments)
        .agg(dsum(col("c_acctbal")))
        .orderBy("n_name")),

    // Long reshape (inverse): melt three measure columns into
    // (measure, value) rows — Expand multiplies rows 3× map-side, the
    // aggregate collapses immediately; nothing wide ever shuffles.
    "unpivot_long" -> ((s, dir) =>
      lineitem(s, dir)
        .unpivot(Array(col("l_orderkey")),
                 Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
                 "measure", "value")
        .groupBy("measure")
        .agg(big(count(lit(1))).as("n"), dsum6(col("value")).as("total"))
        .orderBy("measure")),

    // Scalar subqueries: an uncorrelated one in the predicate (exact
    // MAX — no float-boundary ambiguity between engines) and a
    // correlated one in the projection. Catalyst decorrelates the
    // projection subquery into a left outer aggregate join keyed on
    // l_orderkey — a per-row point lookup would be the non-scalable
    // reading.
    "subq_scalar" -> ((s, dir) => {
      orders(s, dir).createOrReplaceTempView("graft_sq_orders")
      lineitem(s, dir).createOrReplaceTempView("graft_sq_lineitem")
      s.sql(
        """SELECT o_orderkey, ROUND(o_totalprice, 2) AS total,
          |  (SELECT CAST(COUNT(*) AS BIGINT) FROM graft_sq_lineitem
          |   WHERE l_orderkey = o_orderkey) AS n_items
          |FROM graft_sq_orders
          |WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM graft_sq_orders) * 0.7
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Correlated EXISTS + uncorrelated IN — both rewrite to semi joins
    // (no row multiplication, no distinct pass).
    "subq_exists_in" -> ((s, dir) => {
      customer(s, dir).createOrReplaceTempView("graft_sq_customer")
      orders(s, dir).createOrReplaceTempView("graft_sq_orders2")
      s.sql(
        """SELECT c_custkey, c_name FROM graft_sq_customer c
          |WHERE EXISTS (SELECT 1 FROM graft_sq_orders2 o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderpriority = '1-URGENT')
          |  AND c_custkey IN (SELECT o_custkey FROM graft_sq_orders2
          |                    WHERE o_totalprice > 100000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Lateral join: per-customer top-2 orders as a correlated LATERAL
    // subquery with ORDER BY + LIMIT. Spark plans this as one ranked
    // window over the orders side — per-group top-k with a single
    // shuffle, not a per-customer executed subquery.
    "join_lateral" -> ((s, dir) => {
      customer(s, dir).createOrReplaceTempView("graft_lat_customer")
      orders(s, dir).createOrReplaceTempView("graft_lat_orders")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.total
          |FROM graft_lat_customer c,
          |LATERAL (SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
          |         FROM graft_lat_orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c.c_custkey, t.total DESC, t.o_orderkey""".stripMargin)
    }),

    // Ordered string aggregation (LISTAGG ... WITHIN GROUP): the
    // ANSI-standard form of "concatenate group members sorted".
    "agg_listagg" -> ((s, dir) => {
      orders(s, dir).createOrReplaceTempView("graft_la_orders")
      s.sql(
        """SELECT o_orderpriority,
          |  listagg(DISTINCT o_orderstatus, ',')
          |    WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
          |  CAST(COUNT(*) AS BIGINT) AS n
          |FROM graft_la_orders
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // Deterministic mode: most frequent source per language, ties
    // broken lexicographically. Built as count + ranked window (the
    // built-in mode() leaves tie order engine-specific, which can
    // never be oracle-checked).
    "agg_mode_tiebreak" -> ((s, dir) => {
      val counts = documents(s, dir)
        .groupBy("lang", "source").agg(big(count(lit(1))).as("n_docs"))
      val w = Window.partitionBy("lang").orderBy(col("n_docs").desc, col("source"))
      counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("lang", "source", "n_docs")
        .orderBy("lang")
    }),

    // Conditional aggregation with the ANSI FILTER clause + boolean
    // aggregates — one pass, one hash aggregate, no self-joins.
    "agg_conditional" -> ((s, dir) => {
      lineitem(s, dir).createOrReplaceTempView("graft_cond_lineitem")
      s.sql(
        """SELECT l_returnflag,
          |  CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
          |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
          |  BOOL_OR(l_quantity > 49) AS any_big,
          |  BOOL_AND(l_extendedprice > 0) AS all_pos,
          |  CAST(COUNT(*) AS BIGINT) AS n
          |FROM graft_cond_lineitem
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // Deterministic sampling: hash/modulo on a stable key — unlike
    // TABLESAMPLE (seeded per split, unreproducible across engines and
    // re-partitions), a key-modulo sample is exactly repeatable, joins
    // consistently across tables sharing the key, and pushes to the
    // scan as an ordinary predicate.
    "sample_hash" -> ((s, dir) =>
      lineitem(s, dir)
        .where(pmod(col("l_orderkey"), lit(20)) === 0)
        .groupBy("l_returnflag")
        .agg(big(count(lit(1))).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy("l_returnflag")),

    // NEGATIVE SAMPLING for contrastive/recommender training — per
    // customer, [[NegPerKey]] part ids they never ordered, drawn by a
    // deterministic integer LCG over the part-id span (recomputable
    // forever, engine-portable — no engine RNG in sight). Each key
    // mints [[NegCandidates]] candidates row-locally, the observed
    // interaction pairs (customer×part via orders⋈lineitem — the
    // standard interaction-matrix derivation) drop out via one LEFT
    // ANTI join on the (key, item) pair, and the j-ordered rank keeps
    // the first NegPerKey survivors (a candidate colliding with a
    // positive falls through to the next j — deterministically in
    // both engines). Per-key candidate work is a CONSTANT 8 rows at
    // any corpus size; the data-sized costs are the interaction
    // distinct and the anti-join shuffle on the pair key.
    "sample_negative_pairs" -> ((s, dir) => {
      val bounds = part(s, dir).agg(
        min(col("p_partkey")).as("minp"),
        (max(col("p_partkey")) - min(col("p_partkey")) + 1).as("span"))
      // r21 NOTE (probed, left alone): repartitioning both anti-join
      // inputs by the customer key alone does NOT remove the two-key
      // join exchanges — requireAllClusterKeysForCoPartition (default
      // true) rejects subset-key co-partitioning for joins — and the
      // original shape is already minimal: the distinct's
      // (pk, l_partkey) exchange is EXACTLY the join's required
      // clustering and is reused.
      val pos = lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        .join(orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("pk"), col("l_partkey")).distinct()
      val cand = customer(s, dir).select(col("c_custkey"))
        .crossJoin(broadcast(bounds))
        .withColumn("j", explode(sequence(lit(0), lit(NegCandidates - 1))))
        .withColumn("cand",
          (col("c_custkey") * lit(2654435761L) + col("j") * lit(40503L)) %
            col("span") + col("minp"))
      cand.join(pos,
          cand("c_custkey") === pos("pk") && cand("cand") === pos("l_partkey"),
          "left_anti")
        .withColumn("rnk",
          row_number().over(Window.partitionBy("c_custkey").orderBy("j")))
        .where(col("rnk") <= NegPerKey)
        .select(col("c_custkey"), big(col("rnk")).as("rnk"),
                col("cand").as("neg_partkey"))
        .orderBy("c_custkey", "rnk")
    }),

    // Deterministic train/val/test split — the assignment every
    // training-data pipeline makes exactly once and must be able to
    // recompute forever: bucket = first 8 hex digits of md5(doc_id)
    // mod 100 (engine-portable, key-stable, order-free), 80/10/10.
    // Row-local + one agg shuffle; at 100 TB the split column is
    // computed at ingest and partitioned on, never re-decided.
    "sample_split" -> ((s, dir) =>
      documents(s, dir)
        .withColumn("bucket",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
               lit(100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(big(count(lit(1))).as("n_docs"),
             big(sum(col("n_chars"))).as("n_chars"),
             min(col("doc_id")).as("first_doc"))
        .orderBy("lang", "split")),

    // LEAKAGE-SAFE GROUP K-FOLD — cross-validation assignment keyed
    // by the GROUP (user), not the row: fold = md5-bucket(user) mod
    // K, so every event of a user lands in ONE fold and the
    // train/eval boundary can never split a user's history (the
    // sample_split_cluster leakage rule, generalized to K folds).
    // The fold is a pure row-local function of the on-row group key —
    // no join, no state, recomputable forever on any engine; the
    // only shuffle is the per-fold rollup. At 100 TB the fold column
    // is computed at ingest and partitioned on.
    "sample_group_kfold" -> ((s, dir) =>
      events(s, dir)
        .withColumn("fold",
          pmod(conv(substring(md5(concat(lit("fold:"),
                 col("user_id").cast("string"))), 1, 8), 16, 10).cast("long"),
               lit(KFolds)))
        .groupBy("fold")
        .agg(big(countDistinct(col("user_id"))).as("n_users"),
             big(count(lit(1))).as("n_events"),
             big(sum(floor(col("value") * 100).cast("long"))).as("total_cents"))
        .orderBy("fold")),

    // Fixed-SIZE deterministic sample (the reservoir-sampling analog):
    // the k docs with the smallest seeded md5 keys ARE a uniform
    // without-replacement sample of size k (bottom-k sketch), and
    // unlike a true streaming reservoir the selection is key-stable —
    // any engine, any partitioning, any day recomputes the same k
    // rows. Complements sample_hash (fixed RATE) and
    // sample_stratified (per-stratum): this is the fixed-BUDGET eval
    // set. Spark plans it as TakeOrderedAndProject (pinned): per-
    // partition size-k heaps merged once — no global sort, no second
    // pass, and the same bottom-k structure is a mergeable sketch if
    // per-shard samples need unioning later.
    "sample_reservoir_k" -> ((s, dir) =>
      documents(s, dir)
        .withColumn("rk", md5(concat(lit("res:"), col("doc_id").cast("string"))))
        .select("doc_id", "lang", "n_chars", "rk")
        .orderBy("rk", "doc_id")
        .limit(100)),

    // WEIGHTED without-replacement sample of fixed size k — the
    // Efraimidis–Spirakis A-ES bottom-k: each doc draws u ∈ (0, 1]
    // from a seeded md5 (key-stable — any engine, any partitioning
    // recomputes the same sample) and keeps key = -ln(u)/w with
    // w = n_chars, so a doc's selection probability is proportional
    // to its length — the "sample training tokens, not documents"
    // primitive. The k smallest keys win; same TakeOrderedAndProject
    // plan as sample_reservoir_k (per-partition k-heaps, one merge,
    // no global sort) and the bottom-k keyset is a mergeable sketch
    // across shards. The key is fround8-pinned on both engines
    // BEFORE the top-k ordering (ln is the one transcendental —
    // last-ulp engine differences are absorbed by the rounding, and
    // ties break on doc_id).
    "sample_weighted" -> ((s, dir) => {
      val u = (conv(substring(md5(concat(lit("wres:"),
                 col("doc_id").cast("string"))), 1, 8), 16, 10)
                 .cast("long") + 1).cast("double") / lit(4294967296.0)
      documents(s, dir)
        .withColumn("wkey", fround(-log(u) / col("n_chars"), 8))
        .select("doc_id", "lang", "n_chars", "wkey")
        .orderBy("wkey", "doc_id")
        .limit(100)
    }),

    // CLASS-BALANCED SAMPLE — every language contributes exactly
    // min-class-size docs, chosen by seeded md5 order (key-stable:
    // any engine, any partitioning, any day recomputes the same
    // sample) — the "don't let English drown the mixture" primitive,
    // the fixed-PROPORTION complement of text_mixture_budget's token
    // capping. The per-class cutoff is data-dependent (min over class
    // counts), so it broadcasts as a 1-row aggregate into the rank
    // filter — one lang-partitioned window over the corpus, one
    // broadcast, no self-join; with a LITERAL per-class budget the
    // same rank filter compiles to WindowGroupLimit (the
    // events_user_paths plan). Output is the per-class audit summary.
    "sample_balanced" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = documents(s, dir)
        .withColumn("rk", md5(concat(lit("bal:"), col("doc_id").cast("string"))))
      val minN = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .agg(min(col("cnt")).as("min_n"))
      val w = Window.partitionBy("lang").orderBy(col("rk"), col("doc_id"))
      d.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(minN))
        .where(col("rn") <= col("min_n"))
        .groupBy("lang")
        .agg(big(count(lit(1))).as("n_docs"), big(sum(col("n_chars"))).as("sum_chars"))
        .orderBy("lang")
    }),

    // TEMPERATURE-SCALED LANGUAGE MIXTURE — the multilingual-training
    // sampling law (the mT5/XLM-R α-trick): low-resource languages
    // are upsampled by replacing the raw token-mass shares p_l = n_l/N
    // with p_l ∝ (n_l/N)^α. α is FIXED at 0.5 so the power is
    // SQRT — correctly rounded IEEE in both engines, unlike a general
    // pow whose last ulp is libm-specific — and each sqrt term
    // re-pins through dsum6 before normalizing, so the denominator is
    // bit-identical cross-engine. Shape: one per-lang hash-agg
    // (map-side combinable; the corpus-scale stage), a 1-row total
    // broadcast back, everything after is language-cardinality rows.
    // boost = p_temp/p_raw is the report column a data-mixture sheet
    // actually reads: how much each language is over/under-sampled.
    "sample_temperature" -> ((s, dir) => {
      val t = documents(s, dir)
        .select(col("lang"),
                size(split(lower(col("text")), " ")).cast("long").as("toks"))
        .groupBy("lang").agg(sum(col("toks")).as("n_tokens"))
      val tot = t.agg(sum(col("n_tokens")).as("total"),
                      dsum6(sqrt(col("n_tokens"))).as("ssqrt"))
      t.crossJoin(broadcast(tot))
        .withColumn("p_raw",
          fround(col("n_tokens").cast("double") / col("total").cast("double"), 6))
        .withColumn("p_temp", fround(sqrt(col("n_tokens")) / col("ssqrt"), 6))
        .select(col("lang"), big(col("n_tokens")).as("n_tokens"),
                col("p_raw"), col("p_temp"),
                fround(col("p_temp") / col("p_raw"), 4).as("boost"))
        .orderBy("lang")
    }),

    // NEYMAN OPTIMAL ALLOCATION (Neyman 1934) — the stratified-sample
    // budget sheet a mixture-weighting pipeline reads: stratum h gets
    // the share n_h·σ_h / Σ n·σ of the NeymanBudget draws (minimum-
    // variance allocation for a fixed total budget; sample_temperature
    // reweights probabilities, this allocates exact COUNTS). σ from
    // the dsum6-pinned moment sums; the fractional allocations round
    // by LARGEST REMAINDER so they sum to the budget exactly — the
    // remainder rank runs over ≤ |strata| rows (bounded window), and
    // every compared quantity is fround6-pinned BEFORE floor/rank so
    // the rounding replays identically in both engines. One corpus
    // pass; everything after is strata-sized.
    "sample_neyman_alloc" -> ((s, dir) =>
      neymanAlloc(documents(s, dir)
        .select(col("lang"), col("n_chars").cast("double").as("x")),
        NeymanBudget)),

    // CDC MERGE (upsert, latest-wins): the nightly "apply the change
    // feed onto the snapshot" operator every warehouse pipeline runs.
    // Base = latest pre-cutoff order per customer, delta = latest
    // post-cutoff order per customer; MERGE semantics via one full
    // outer join on the entity key — matched → update, delta-only →
    // insert, base-only → keep. Each side condenses to one row per key
    // with a single ranked window (shuffle on o_custkey), and the join
    // reuses that same key so no third shuffle appears. At 100 TB the
    // delta is normally days-scale vs a years-scale base: broadcast
    // the delta side and the merge touches the base exactly once, or
    // bucket both by entity key and it is exchange-free.
    // COLUMN PROFILING REPORT — the data-quality first-look every
    // ingestion pipeline runs before trusting 100 TB: per column,
    // row/non-null/distinct counts and min/max (stringified to one
    // uniform report schema). ONE scan: all per-column aggregates sit
    // in a single Aggregate node (the exact multi-DISTINCT compiles
    // to Spark's Expand — row-multiplied by #distinct-columns but
    // still one pass, map-side partial per branch; at production
    // scale swap countDistinct for approx_count_distinct and the
    // Expand disappears entirely, same report schema), then the
    // 1-row result pivots to report rows DRIVER-SIDE-FREE via a
    // row-local explode. The oracle is a per-column UNION ALL — a
    // genuinely independent formulation.
    "profile_columns" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_returnflag", "l_shipdate")
      val li = lineitem(s, dir)
      val aggs = big(count(lit(1))).as("n_rows") +:
        cols.flatMap(c => Seq(
          big(count(col(c))).as(s"nn_$c"),
          big(countDistinct(col(c))).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c")))
      li.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"), col("n_rows"),
            col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"),
            col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val"))): _*))
          .as("p"))
        .select(col("p.*"))
        .orderBy("col_name")
    }),

    // DATA-QUALITY EXPECTATION GATE — the Great-Expectations-shaped
    // contract check an ingestion pipeline runs BEFORE any transform
    // trusts a landing: a DECLARED suite of expectations (key
    // uniqueness, value range, accepted set, referential integrity,
    // null rate, non-emptiness), one pass/fail row each. The drift
    // gate watches distributions MOVE; this gate watches the data
    // CONTRACT hold. Scale shape: all of a table's row-local checks
    // collapse into ONE aggregate pass (the profile_columns explode
    // move — no per-expectation rescans); the sole cross-table check
    // (lineitem→orders FK) is one LEFT ANTI join on the key, the
    // join class that rides a runtime bloom / bucket co-location at
    // 100 TB. n_failed counts, not samples: a gate needs the exact
    // violation count, the violating ROWS are a filter away.
    // ROLE-BASED COLUMN MASKING — the governance view policy every
    // lakehouse catalog ships (masking policies / dynamic views):
    // the SAME rows served twice, 'admin' raw and 'analyst' through
    // two standard mask classes — deterministic PSEUDONYMIZATION
    // (md5-token name: joinable, irreversible) and GENERALIZATION
    // (balance banded to 500s — the dq_k_anonymity ladder's middle
    // rung as a serving-time policy). Row-local projections + one
    // tiny ordered union; at 100 TB a policy view costs exactly its
    // projection, nothing else. DqMaskingSpec pins determinism,
    // distinctness, and band membership.
    "dq_column_masking" -> ((s, dir) => {
      val c = customer(s, dir).where(col("c_custkey") < 10)
      val admin = c.select(lit("admin").as("role"), col("c_custkey"),
        col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      val analyst = c.select(lit("analyst").as("role"), col("c_custkey"),
        concat(lit("anon-"), substring(md5(col("c_name").cast("binary")), 1, 8))
          .as("c_name"),
        (floor(col("c_acctbal") / 500) * 500).cast("double").as("c_acctbal"),
        col("c_mktsegment"))
      admin.unionByName(analyst).orderBy("role", "c_custkey")
    }),

    // FRESHNESS / VOLUME SLA MONITOR — the daily-use companion of
    // dq_expectations: per event lane, when did data last arrive
    // (minutes behind the corpus head, exact integer µs DIV), is the
    // lane within its SLA, and is the last hour's volume consistent
    // with the lane's historical hourly rate (the silent-upstream-
    // death detector — a lane can be "fresh" on one straggler event
    // while 95% of its volume is missing). See [[freshnessOf]]. At
    // 100 TB this runs per partition-date slice with the same plan.
    "dq_freshness" -> ((s, dir) => freshnessOf(events(s, dir))),

    "dq_expectations" -> ((s, dir) => {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(explode(col("arr")).as("e")).select(col("e.*"))
      def exp3(name: String, checked: org.apache.spark.sql.Column,
               failed: org.apache.spark.sql.Column) =
        struct(lit(name).as("expectation"), big(checked).as("n_checked"),
               big(failed).as("n_failed"))
      val o = orders(s, dir).agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("nd"),
          count(when(col("o_totalprice").isNull ||
                     col("o_totalprice") <= 0 ||
                     col("o_totalprice") > 1e6, 1)).as("bad_range"),
          count(when(col("o_orderstatus").isNull ||
                     !col("o_orderstatus").isin("O", "F", "P"), 1)).as("bad_set"))
        .select(array(
          exp3("orders.o_orderkey unique", col("n"), col("n") - col("nd")),
          exp3("orders.o_totalprice in (0,1e6]", col("n"), col("bad_range")),
          exp3("orders.o_orderstatus in {O,F,P}", col("n"), col("bad_set"))).as("arr"))
      val li = lineitem(s, dir).agg(
          count(lit(1)).as("n"),
          count(when(col("l_discount").isNull ||
                     col("l_discount") < 0 || col("l_discount") > 1, 1)).as("bad_disc"),
          count(when(col("l_quantity").isNull || col("l_quantity") <= 0, 1)).as("bad_qty"))
        .select(array(
          exp3("lineitem.l_discount in [0,1]", col("n"), col("bad_disc")),
          exp3("lineitem.l_quantity > 0", col("n"), col("bad_qty"))).as("arr"))
      val fk = lineitem(s, dir).select(col("l_orderkey"))
        .join(orders(s, dir).select(col("o_orderkey")),
              col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
        .crossJoin(broadcast(lineitem(s, dir).agg(count(lit(1)).as("n"))))
        .select(array(
          exp3("lineitem.l_orderkey references orders", col("n"), col("orphans"))).as("arr"))
      val ev = events(s, dir).agg(
          count(lit(1)).as("n"),
          count(when(col("value").isNull, 1)).as("bad_null"))
        .select(array(
          exp3("events.value not null", col("n"), col("bad_null"))).as("arr"))
      val doc = documents(s, dir).agg(
          count(lit(1)).as("n"),
          count(when(col("text").isNull || length(col("text")) === 0, 1)).as("bad_empty"))
        .select(array(
          exp3("documents.text non-empty", col("n"), col("bad_empty"))).as("arr"))
      Seq(o, li, fk, ev, doc).map(rows).reduce(_ unionByName _)
        .withColumn("passed", col("n_failed") === 0L)
        .orderBy("expectation")
    }),

    // K-ANONYMITY AUDIT with a generalization ladder — the privacy
    // gate a dataset release runs over its quasi-identifiers (the
    // Sweeney k-anonymity model): every equivalence class of
    // (nation, market-segment) must hold ≥ k individuals or its rows
    // are re-identifiable. Classes below k climb the generalization
    // ladder: level 1 coarsens the segment away (nation only; the
    // class joins the pooled sub-k mass of its nation), and if even
    // that pool is below k the class is level 2 — suppress-only.
    // Scale shape: ONE hash aggregate at quasi-id granularity (the
    // only corpus-sized pass, map-side combinable); the ladder then
    // operates entirely on the class-count-sized table — the level-1
    // pool is a re-agg of that tiny table and the back-join
    // broadcasts. At 100 TB with high-cardinality quasi-ids the
    // class table is still bounded by the id-combination count,
    // never the row count.
    // REFERENTIAL-INTEGRITY AUDIT across the FK graph — the dq gate
    // that runs after every ingest batch: per FK edge, how many child
    // rows point at a missing parent, and how many distinct missing
    // keys there are (the re-ingest worklist size). One edge carries
    // PLANTED corruption (every o_orderkey % 13 order's custkey
    // shifted out of domain — the source_quarantine arithmetic-plant
    // convention, so the audit provably FINDS what's broken rather
    // than reporting zeros on clean fixtures); two lineitem edges
    // audit clean. Shapes at 100 TB: each check is one LEFT ANTI join
    // of child FKs against distinct parent keys — dimension-sized
    // parents BROADCAST (pinned); a fact-sized parent would fall back
    // to the same anti join shuffled on the key, still one exchange
    // per edge. Orphan tallies are one hash-agg per edge.
    "dq_referential" -> ((s, dir) => {
      def edge(name: String, child: org.apache.spark.sql.DataFrame, fk: String,
               parent: org.apache.spark.sql.DataFrame, pk: String) = {
        val orphans = child.join(broadcast(parent.select(col(pk)).distinct()),
            child(fk) === col(pk), "left_anti")
        orphans.agg(big(count(lit(1))).as("n_orphans"),
            big(countDistinct(col(fk))).as("n_missing_keys"))
          .crossJoin(broadcast(child.agg(big(count(lit(1))).as("n_child"))))
          .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
                  col("n_missing_keys"),
                  (col("n_orphans") === 0L).as("ok"))
      }
      val dirtyOrders = orders(s, dir).select(
        when(col("o_orderkey") % 13 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("o_custkey"))
      Seq(
        edge("orders.o_custkey->customer", dirtyOrders, "o_custkey",
             customer(s, dir), "c_custkey"),
        edge("lineitem.l_partkey->part", lineitem(s, dir), "l_partkey",
             part(s, dir), "p_partkey"),
        edge("lineitem.l_suppkey->supplier", lineitem(s, dir), "l_suppkey",
             supplier(s, dir), "s_suppkey")
      ).reduce(_ unionByName _).orderBy("edge")
    }),

    "dq_k_anonymity" -> ((s, dir) => {
      val classes = customer(s, dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val pooled = classes.where(col("n") < KAnonymity)
        .groupBy("c_nationkey").agg(sum(col("n")).as("n1"))
      classes.join(broadcast(pooled), Seq("c_nationkey"), "left")
        .select(col("c_nationkey"), col("c_mktsegment"),
          big(col("n")).as("n_rows"),
          big(when(col("n") >= KAnonymity, 0L)
            .when(col("n1") >= KAnonymity, 1L)
            .otherwise(2L)).as("gen_level"))
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // JOIN-KEY SKEW PROFILER — the "should this join be salted?"
    // advisor, run on a key BEFORE committing a 100-TB shuffle to it:
    // the corpus collapses to the per-key frequency grid in one
    // map-side-combinable hash-agg (key-cardinality-bounded), and the
    // report derives entirely from that grid — row/key counts, the
    // heaviest key and its share of all rows, exact p50/p99 of the
    // frequency distribution, and max/p50 as the skew ratio (the
    // number that says how unbalanced the heaviest shuffle partition
    // will be vs the median). The salting decision reads ONE row.
    "profile_key_skew" -> ((s, dir) => {
      val freq = lineitem(s, dir)
        .groupBy("l_suppkey").agg(count(lit(1)).as("f"))
      freq.agg(
          big(sum(col("f"))).as("n_rows"),
          big(count(lit(1))).as("n_keys"),
          big(max(col("f"))).as("max_freq"),
          fround(expr("percentile(f, 0.5)"), 4).as("p50_freq"),
          fround(expr("percentile(f, 0.99)"), 4).as("p99_freq"))
        .select(col("n_rows"), col("n_keys"), col("max_freq"),
                col("p50_freq"), col("p99_freq"),
                fround(col("max_freq").cast("double") / col("n_rows").cast("double"), 6)
                  .as("top_share"),
                fround(col("max_freq").cast("double") / col("p50_freq"), 4)
                  .as("skew_ratio"))
    }),

    // INCREMENTAL AGGREGATE-VIEW MAINTENANCE: keep a per-customer
    // stats view current by MERGING the stored snapshot state with the
    // delta's partial state — never rescanning history. Works because
    // every component is a commutative monoid (count/sum add, max
    // joins): merge(partial(old), partial(new)) ≡ full(old ∪ new) —
    // the algebra behind every streaming materialized view and the
    // only shape that survives when "recompute the view" means
    // rescanning 100 TB. The oracle IS the full recompute over all
    // rows, so CORRECTNESS checks the monoid law end-to-end, not a
    // mirrored implementation. Money stays exact floor-cents. Scale
    // shape: the delta agg touches only delta rows; the merge is a
    // union + re-agg on the view key (in storage terms: the snapshot
    // re-reads ONLY to merge — bucketed by custkey it is
    // exchange-free, and the union'd re-agg is map-side combinable).
    "agg_incremental_maintain" -> ((s, dir) => {
      val o = orders(s, dir)
        .withColumn("cents", floor(col("o_totalprice") * 100).cast("long"))
      def state(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_custkey").agg(
          count(lit(1)).as("n"), sum(col("cents")).as("c"),
          max(col("o_orderdate")).as("d"))
      val snapshot = state(o.where(col("o_orderdate") < MergeCutoff))
      val delta    = state(o.where(col("o_orderdate") >= MergeCutoff))
      snapshot.unionByName(delta)
        .groupBy("o_custkey")
        .agg(big(sum(col("n"))).as("n_orders"),
             big(sum(col("c"))).as("total_cents"),
             max(col("d")).as("last_order_d"))
        .orderBy("o_custkey")
    }),

    // INCREMENTAL AGGREGATE MAINTENANCE WITH RETRACTIONS: the delta
    // batch carries DELETES, not just inserts — the general IVM case
    // every streaming materialized view with a changelog input hits.
    // count/sum are abelian groups, so deletes apply as SIGNED partial
    // state (+1/cents for inserts, -1/-cents for retractions) merged
    // into the stored snapshot exactly like agg_incremental_maintain's
    // monoid merge. max is NOT retractable — deleting the max row
    // invalidates the stored bound — so the engine uses the standard
    // dirty-key repair: ONLY keys touched by a delete re-derive max
    // from their surviving rows (tombstone keys are a semi-join
    // filter; the delete-key anti-join broadcasts the delete-batch-
    // sized key list); untouched keys keep the monoid max merge. Keys
    // whose signed count reaches zero leave the view. The oracle IS
    // the full recompute over (base ∖ deletes) ∪ inserts, so the
    // comparison proves group-merge + dirty-key repair ≡ recompute
    // end-to-end. Scale shape: signed agg touches delta rows only;
    // the repair rescans only delete-affected keys (delete-sized, not
    // corpus-sized); the final merge is one key-partitioned re-agg —
    // at 100 TB the snapshot re-reads only to merge, never to rescan.
    "agg_incremental_retract" -> ((s, dir) => {
      val o = orders(s, dir)
        .withColumn("cents", floor(col("o_totalprice") * 100).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
                col("o_orderdate"), col("cents"))
      val base    = o.where(col("o_orderdate") < MergeCutoff)
      val inserts = o.where(col("o_orderdate") >= MergeCutoff)
      val deletes = base.where(col("o_orderstatus") === "F" &&
                               col("o_orderkey") % RetractMod === 0)
      // stored snapshot state (production reads this; the fixture
      // recomputes it because no state persists between queries)
      val snapshot = base.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"),
             max(col("o_orderdate")).as("d"))
      // signed delta state: one pass over delta rows only
      val signed = inserts.select(col("o_custkey"), lit(1L).as("sgn"),
                                  col("cents"), col("o_orderdate"))
        .unionByName(deletes.select(col("o_custkey"), lit(-1L).as("sgn"),
                                    col("cents"), col("o_orderdate")))
        .groupBy("o_custkey")
        .agg(sum(col("sgn")).as("n"), sum(col("sgn") * col("cents")).as("c"),
             max(when(col("sgn") === 1, col("o_orderdate"))).as("d"))
      val merged = snapshot.unionByName(signed).groupBy("o_custkey")
        .agg(sum(col("n")).as("n_orders"), sum(col("c")).as("total_cents"),
             max(col("d")).as("monoid_d"))
      // dirty-key max repair: surviving rows of delete-touched keys
      val repaired = base
        .join(broadcast(deletes.select(col("o_orderkey").as("__delk"))),
              col("o_orderkey") === col("__delk"), "left_anti")
        .unionByName(inserts)
        .join(deletes.select("o_custkey").distinct(), Seq("o_custkey"), "left_semi")
        .groupBy("o_custkey").agg(max(col("o_orderdate")).as("repaired_d"))
      merged.join(repaired, Seq("o_custkey"), "left")
        .where(col("n_orders") > 0)
        .select(col("o_custkey"), big(col("n_orders")).as("n_orders"),
                big(col("total_cents")).as("total_cents"),
                coalesce(col("repaired_d"), col("monoid_d")).as("last_order_d"))
        .orderBy("o_custkey")
    }),

    // INCREMENTAL JOIN-VIEW MAINTENANCE: keep a materialized JOIN
    // current from insert deltas without rejoining history — the
    // bilinear delta rule (A∪ΔA)⋈(B∪ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB,
    // the join sibling of agg_incremental_maintain's monoid law. The
    // oracle IS the one-shot full join over all rows, so CORRECTNESS
    // proves the decomposition end-to-end, never a mirrored
    // implementation. Scale shape: the stored view (here recomputed as
    // the old⋈old arm only because the fixture carries no persisted
    // state) is READ, not rejoined; the two cross arms each pair a
    // day-sized delta against history — broadcast the delta side and
    // history streams through once — and ΔA⋈ΔB is delta×delta. Every
    // arm is an equi-join on the view key; the final per-customer
    // rollup is map-side combinable.
    "join_incremental_maintain" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
                                    col("o_orderdate"))
      val l = lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val oOld = o.where(col("o_orderdate") < MergeCutoff)
      val oNew = o.where(col("o_orderdate") >= MergeCutoff)
      val lOld = l.where(col("l_shipdate") < MergeCutoff)
      val lNew = l.where(col("l_shipdate") >= MergeCutoff)
      def arm(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.join(b, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("cents"))
      arm(oOld, lOld).unionByName(arm(oNew, lOld))
        .unionByName(arm(oOld, lNew)).unionByName(arm(oNew, lNew))
        .groupBy("o_custkey")
        .agg(big(count(lit(1))).as("n_items"), big(sum(col("cents"))).as("item_cents"))
        .orderBy("o_custkey")
    }),

    "merge_upsert" -> ((s, dir) => {
      val base  = latestPerCustomer(orders(s, dir).where(col("o_orderdate") < MergeCutoff), "b")
      val delta = latestPerCustomer(orders(s, dir).where(col("o_orderdate") >= MergeCutoff), "d")
      base.join(delta, col("b_custkey") === col("d_custkey"), "full_outer")
        .select(
          coalesce(col("d_custkey"), col("b_custkey")).as("o_custkey"),
          when(col("d_custkey").isNull, "keep")
            .when(col("b_custkey").isNull, "insert")
            .otherwise("update").as("action"),
          coalesce(col("d_orderkey"), col("b_orderkey")).as("o_orderkey"),
          round(coalesce(col("d_price"), col("b_price")), 2).as("total"),
          coalesce(col("d_priority"), col("b_priority")).as("o_orderpriority"))
        .orderBy("o_custkey")
    }),

    // CDC MERGE with a DELETE arm (the full four-way change-feed
    // apply): a real CDC stream carries tombstones, not just upserts.
    // The fixture has no delete flag, so the tombstone rule is a
    // deterministic stand-in both engines share: a delta row whose
    // latest order priority is '5-LOW' is a delete record. MERGE
    // semantics over the same one-full-outer-join shape as
    // merge_upsert: base-only → keep, matched + tombstone → DELETE
    // (the key leaves the snapshot; emitted with NULL payload so the
    // action split is auditable), matched otherwise → update,
    // delta-only + live → insert, and delta-only + tombstone — a
    // delete of a key that never existed — is a NO-OP and emits
    // nothing (idempotent delete, exactly ANSI MERGE's WHEN NOT
    // MATCHED THEN DO NOTHING). Same scale shape as merge_upsert:
    // each side condenses on one entity-key shuffle, the full outer
    // join reuses that partitioning, no third exchange.
    "merge_cdc_delete" -> ((s, dir) => {
      val base  = latestPerCustomer(orders(s, dir).where(col("o_orderdate") < MergeCutoff), "b")
      val delta = latestPerCustomer(orders(s, dir).where(col("o_orderdate") >= MergeCutoff), "d")
        .withColumn("tomb", col("d_priority") === "5-LOW")
      val matched = col("b_custkey").isNotNull && col("d_custkey").isNotNull
      val del = matched && col("tomb")
      base.join(delta, col("b_custkey") === col("d_custkey"), "full_outer")
        .where(!(col("b_custkey").isNull && col("tomb")))
        .select(
          coalesce(col("d_custkey"), col("b_custkey")).as("o_custkey"),
          when(col("d_custkey").isNull, "keep")
            .when(col("b_custkey").isNull, "insert")
            .when(col("tomb"), "delete")
            .otherwise("update").as("action"),
          when(del, lit(null).cast("long"))
            .otherwise(coalesce(col("d_orderkey"), col("b_orderkey"))).as("o_orderkey"),
          when(del, lit(null).cast("double"))
            .otherwise(round(coalesce(col("d_price"), col("b_price")), 2)).as("total"),
          when(del, lit(null).cast("string"))
            .otherwise(coalesce(col("d_priority"), col("b_priority"))).as("o_orderpriority"))
        .orderBy("o_custkey")
    }),

    // SCD2 history build (changelog compaction): per entity, collapse
    // the raw change feed into versioned validity intervals — keep only
    // rows where the tracked attribute actually changed (run
    // compression via lag), then derive valid_from/valid_to from
    // consecutive kept rows (lead) and flag the open interval as
    // current. Both window layers share the o_custkey partitioning, so
    // the whole history build is ONE shuffle on the entity key followed
    // by two in-partition sorted passes — at 100 TB that is the floor
    // for any per-entity temporal operator. Dates project as yyyymmdd
    // ints (engine-portable; raw timestamps never cross the oracle).
    "scd2_history" -> ((s, dir) =>
      scd2Of(orders(s, dir))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("o_custkey", "version")),

    // POINT-IN-TIME (temporal) join: each lineitem resolves the
    // customer's order-priority version valid ON ITS SHIP DATE — the
    // feature-store lookup ("attribute as of event time", no leakage
    // from the future). Implementation is the as-of union+window
    // pattern, NOT an interval join: SCD2 version rows (tag 0) and
    // fact rows (tag 1) union on the customer key, the corpus shuffles
    // ONCE on o_custkey, and a running struct-max over
    // (valid_from, version) resolves the newest version at or before
    // each fact row-locally — no interval explosion, no per-row range
    // probe, and the dim side never broadcasts (at 100 TB the dim is
    // itself huge). Same-day version ties resolve to the highest
    // version — exactly the [valid_from, valid_to) interval semantics
    // the oracle joins on (a zero-width same-day version matches
    // nothing on either engine).
    "join_pit_scd2" -> ((s, dir) => {
      val facts = lineitem(s, dir)
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), ymd(col("l_shipdate")).as("at"),
                col("l_extendedprice").as("price"))
      pitPriority(scd2Of(orders(s, dir)), facts)
        .groupBy(col("prio_at_ship"))
        .agg(big(count(lit(1))).as("n_items"), dsum(col("price")).as("revenue"))
        .orderBy("prio_at_ship")
    }),

    // Recursive CTE: a 12-row month spine generated by iteration, LEFT
    // JOINed to order counts — the relational fixed-point surface
    // (org charts, BOM explosions, graph reachability at bounded depth).
    "cte_recursive" -> ((s, dir) => {
      orders(s, dir).createOrReplaceTempView("graft_rc_orders")
      s.sql(
        """WITH RECURSIVE m(mo) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT mo + 1 FROM m WHERE mo < 12
          |)
          |SELECT mo, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
          |FROM m LEFT JOIN graft_rc_orders
          |  ON EXTRACT(MONTH FROM o_orderdate) = mo
          |GROUP BY mo ORDER BY mo""".stripMargin)
    }),

    // DIFFERENTIALLY-PRIVATE COUNT RELEASE (Dwork et al. 2006's
    // Laplace mechanism, the governance twin of dq_k_anonymity): each
    // per-nation customer count is released only after adding
    // Laplace(Δ/ε) noise (Δ = 1: one customer moves one count). The
    // noise draw is the repo's seeded-md5 uniform (key-stable — any
    // engine, any partitioning, any day re-derives the SAME release,
    // so a re-run never leaks a fresh-noise average) pushed through
    // the Laplace inverse CDF −b·sign(v)·ln(1−2|v|); the one
    // transcendental is fround6-pinned before release (the
    // sample_weighted ln discipline). Scale: one map-side-combinable
    // hash-agg to the 25-nation grid, then row-local noise — the
    // release never touches row-level data again. The TRUE counts are
    // deliberately NOT in the output: the released view is all a
    // consumer may see.
    "dq_dp_noise" -> ((s, dir) => {
      val v = dpDraw("dp:", col("c_nationkey"))
      customer(s, dir)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), lit(DpEpsilon).as("epsilon"),
          fround(col("n") + dpLaplace(1.0 / DpEpsilon, v), 6).as("noisy_count"))
        .orderBy("c_nationkey")
    }),

    // DP SUM RELEASE WITH CONTRIBUTION CLAMPING — the mechanism
    // detail dq_dp_noise's counts don't exercise: a SUM's sensitivity
    // is unbounded until each unit's contribution is CLAMPED (one
    // customer's balance moves the total by at most DpClampHi after
    // clamping to [0, DpClampHi]), and the Laplace scale is
    // sensitivity/ε — the Δf/ε calibration of Dwork et al. 2006.
    // Same seeded-md5 draw discipline as dq_dp_noise (distinct seed
    // prefix: composing two releases must not reuse noise); the
    // clamped sum itself is decimal-pinned before the noise lands.
    // One hash-agg to the nation grid, row-local everything else.
    "dq_dp_sum" -> ((s, dir) => {
      val v = dpDraw("dpsum:", col("c_nationkey"))
      customer(s, dir)
        .withColumn("clamped",
          least(greatest(col("c_acctbal"), lit(0.0)), lit(DpClampHi)))
        .groupBy("c_nationkey").agg(dsum(col("clamped")).as("csum"))
        .select(col("c_nationkey"), lit(DpEpsilon).as("epsilon"),
          lit(DpClampHi).as("clamp_hi"),
          fround(col("csum") + dpLaplace(DpClampHi / DpEpsilon, v), 4)
            .as("noisy_sum"))
        .orderBy("c_nationkey")
    }),

    // DP MEDIAN via the EXPONENTIAL MECHANISM (McSherry–Talwar 2007 —
    // the third mechanism class: selection among candidates by
    // utility, where Laplace releases perturb numbers): candidates
    // are the fixed DpQuantileGrid band midpoints, a candidate's
    // utility is −|#{values ≤ c} − n/2| (how close to the true
    // median; sensitivity 1 — one unit moves any rank by one), and
    // the released candidate maximizes ε·u/2 + Gumbel noise — the
    // Gumbel-max trick IS exponential-mechanism sampling, and the
    // repo's seeded-md5 draw makes the selection key-stable (a re-run
    // releases the same median; the oracle replays the argmax). Rank
    // counts are one conditional pass over the grid×nation cells
    // (grid-bounded, map-side combinable); selection is a bounded
    // per-nation argmax.
    "dq_dp_quantile" -> ((s, dir) => {
      val cands = typedLit(DpQuantileGrid)
      val expanded = customer(s, dir)
        .select(col("c_nationkey"), col("c_acctbal"),
                explode(cands).as("cand"))
      val ranked = expanded.groupBy("c_nationkey", "cand")
        .agg(count(lit(1)).as("n"),
             count(when(col("c_acctbal") <= col("cand"), 1)).as("rk"))
      val v = dpDraw("dpq:", concat(col("c_nationkey").cast("string"),
                                    lit("|"), col("cand").cast("string")))
      // Gumbel from the uniform in (0,1): g = −ln(−ln(u)); reuse the
      // clamped v ∈ (−0.5, 0.49999999] as u = v + 0.5 ∈ (0, 1).
      // TWO-STAGE pin (r17 ADVICE): the inner −ln(u) is fround6-pinned
      // BEFORE the outer −ln so each engine feeds the second
      // transcendental the identical 6-decimal double — nesting two
      // unpinned lns could let a last-ulp Math.log↔LN divergence
      // cross a .5e-6 boundary and flip a per-nation argmax. u is
      // additionally capped at 0.999999 so the pinned inner value
      // stays ≥ 1e-6 (fround6 of −ln(0.99999999) ≈ 1e-8 would round
      // to 0 and blow the outer ln to −∞). The oracle mirrors both
      // stages verbatim.
      val u = least(v + lit(0.5), lit(0.999999))
      val gumbel = -log(fround(-log(u), 6))
      val key = fround(lit(DpEpsilon / 2.0) *
                  (-abs(col("rk").cast("double") - col("n") / lit(2.0))) +
                  gumbel, 6)
      ranked.withColumn("k", key)
        .groupBy("c_nationkey")
        .agg(max(struct(col("k"), col("cand"))).as("best"))
        .select(col("c_nationkey"), lit(DpEpsilon).as("epsilon"),
                col("best.cand").as("released_median"))
        .orderBy("c_nationkey")
    }),

    // SEQUENCE PACKING FOR TRAINING (the GPT-2/T5 concat-and-chunk
    // recipe: concatenate every document's tokens in a deterministic
    // order, slice the stream into fixed PackCtx-token training
    // sequences): each doc needs its EXCLUSIVE OFFSET in the global
    // token stream — a corpus-wide prefix sum, which a single ordered
    // window would serialize onto one partition. The engine computes
    // it as the classic TWO-LEVEL distributed prefix sum instead:
    // doc_ids group into ≤ PackChunkBuckets order-preserving range
    // buckets (the span derives from max(doc_id), a 1-row broadcast),
    // intra-bucket cumsums run as bucket-partitioned windows (fully
    // parallel), and only the bucket-TOTAL table — bounded at
    // PackChunkBuckets rows by construction — crosses a global window
    // for the bucket offsets (at 100 TB the same trick recurses: a
    // third level caps level-2 too). The report is what a pretraining
    // pipeline signs off on: chunk count, docs straddling a chunk
    // boundary (their loss spans two sequences), the widest doc span,
    // and the fill factor of the packed stream. The oracle computes
    // the SAME offsets with one global window — two formulations, one
    // answer, which is exactly the prefix-sum decomposition law.
    "sample_pack_chunks" -> ((s, dir) => {
      val C = lit(PackCtxTokens)
      packChunkOffsets(documents(s, dir), PackCtxTokens)
        .agg(big(count(lit(1))).as("n_docs"),
             big(sum(col("n"))).as("total_tokens"),
             big(floor((sum(col("n")) + PackCtxTokens - 1) / C)).as("n_chunks"),
             big(count(when(col("first_c") =!= col("last_c"), 1))).as("n_straddling"),
             big(max(col("last_c") - col("first_c") + 1)).as("max_doc_span"))
        .select(col("n_docs"), col("total_tokens"), col("n_chunks"),
          col("n_straddling"), col("max_doc_span"),
          fround(col("total_tokens").cast("double") /
                 (col("n_chunks") * PackCtxTokens).cast("double"), 6).as("fill_factor"))
    })
  )

  /** Oracle mirror of [[scd2Of]] — ends in CTE `v`. */
  private val Scd2Cte: String =
    "ord AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority, " +
    "LAG(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev " +
    "FROM orders), " +
    "chg AS (SELECT * FROM ord WHERE prev IS NULL OR prev <> o_orderpriority), " +
    "v AS (SELECT o_custkey, o_orderpriority, " +
    "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version, " +
    s"CAST(${ymdSql("o_orderdate")} AS BIGINT) AS valid_from, " +
    s"CAST(LEAD(${ymdSql("o_orderdate")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS valid_to " +
    "FROM chg)"

  /** sample_negative_pairs' knobs — LITERALS shared with the oracle
    * (the KnnRefSetSize discipline): 8 candidates minted per key, the
    * first 5 non-positive survivors kept. */
  val NegCandidates = 8
  val NegPerKey = 5

  val oracle: Map[String, String] = Map(
    // same seeded-md5 uniform, same clamped Laplace inverse CDF, same
    // fround6 pin before and after adding the true count
    "dq_dp_noise" ->
      ("WITH g AS (SELECT c_nationkey, COUNT(*) AS n, " +
       "LEAST((CAST(CONCAT('0x', SUBSTRING(MD5('dp:' || CAST(c_nationkey AS VARCHAR)), 1, 8)) " +
       "AS BIGINT) + 1) / 4294967296.0 - 0.5, 0.49999999) AS v " +
       "FROM customer GROUP BY c_nationkey) " +
       s"SELECT c_nationkey, $DpEpsilon AS epsilon, " +
       froundSql("n + " +
         froundSql(s"-(1.0 / $DpEpsilon) * SIGN(v) * LN(1.0 - 2.0 * ABS(v))", 6), 6) +
       " AS noisy_count FROM g ORDER BY c_nationkey"),

    // same fixed candidate grid, same rank utilities, same seeded
    // Gumbel-max selection — the argmax replayed with a ranked window
    "dq_dp_quantile" -> {
      val grid = DpQuantileGrid.mkString("[", ", ", "]")
      ("WITH cand AS (SELECT UNNEST(CAST(" + grid + " AS DOUBLE[])) AS cand), " +
       "rk AS (SELECT c_nationkey, cand, COUNT(*) AS n, " +
       "COUNT(CASE WHEN c_acctbal <= cand THEN 1 END) AS rk " +
       "FROM customer, cand GROUP BY 1, 2), " +
       // two-stage pin mirrored from the engine: inner -LN fround6'd
       // before the outer -LN, u capped at 0.999999
       "scored AS (SELECT c_nationkey, cand, " +
       froundSql(s"($DpEpsilon / 2.0) * (-ABS(rk - n / 2.0)) + " +
         "(-LN(" +
         froundSql("-LN(LEAST(LEAST((CAST(CONCAT('0x', SUBSTRING(MD5('dpq:' || " +
           "CAST(c_nationkey AS VARCHAR) || '|' || CAST(cand AS VARCHAR)), 1, 8)) " +
           "AS BIGINT) + 1) / 4294967296.0 - 0.5, 0.49999999) + 0.5, 0.999999))", 6) +
         "))", 6) +
       " AS k FROM rk) " +
       s"SELECT c_nationkey, $DpEpsilon AS epsilon, cand AS released_median " +
       "FROM (SELECT c_nationkey, cand, " +
       "ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY k DESC, cand DESC) AS rn " +
       "FROM scored) WHERE rn = 1 ORDER BY c_nationkey")
    },

    // same clamp bounds, same decimal-pinned sum, same seeded draw
    // with the dpsum: prefix, same Δ/ε = 4000 noise scale
    "dq_dp_sum" ->
      ("WITH g AS (SELECT c_nationkey, " +
       dsumSql(s"LEAST(GREATEST(c_acctbal, 0.0), $DpClampHi)") + " AS csum, " +
       "LEAST((CAST(CONCAT('0x', SUBSTRING(MD5('dpsum:' || CAST(c_nationkey AS VARCHAR)), 1, 8)) " +
       "AS BIGINT) + 1) / 4294967296.0 - 0.5, 0.49999999) AS v " +
       "FROM customer GROUP BY c_nationkey) " +
       s"SELECT c_nationkey, $DpEpsilon AS epsilon, $DpClampHi AS clamp_hi, " +
       froundSql("csum + " +
         froundSql(s"-(${DpClampHi / DpEpsilon}) * SIGN(v) * LN(1.0 - 2.0 * ABS(v))", 6), 4) +
       " AS noisy_sum FROM g ORDER BY c_nationkey"),

    // ONE global ordered window computes the offsets the engine
    // derived via the two-level decomposition — same answer by the
    // prefix-sum law; chunk algebra identical
    "sample_pack_chunks" ->
      ("WITH d AS (SELECT doc_id, CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS BIGINT) AS n " +
       "FROM documents), " +
       "o AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS off FROM d), " +
       s"c AS (SELECT n, off, CAST(FLOOR(off / $PackCtxTokens) AS BIGINT) AS first_c, " +
       s"CAST(FLOOR((off + n - 1) / $PackCtxTokens) AS BIGINT) AS last_c FROM o) " +
       "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, " +
       "CAST(SUM(n) AS BIGINT) AS total_tokens, " +
       s"CAST(FLOOR((SUM(n) + $PackCtxTokens - 1) / $PackCtxTokens) AS BIGINT) AS n_chunks, " +
       "CAST(COUNT(CASE WHEN first_c <> last_c THEN 1 END) AS BIGINT) AS n_straddling, " +
       "CAST(MAX(last_c - first_c + 1) AS BIGINT) AS max_doc_span, " +
       froundSql("CAST(SUM(n) AS DOUBLE) / " +
         s"(FLOOR((SUM(n) + $PackCtxTokens - 1) / $PackCtxTokens) * $PackCtxTokens)", 6) +
       " AS fill_factor FROM c ORDER BY n_docs"),

    "sample_negative_pairs" ->
      ("WITH bounds AS (SELECT MIN(p_partkey) AS minp, " +
       "MAX(p_partkey) - MIN(p_partkey) + 1 AS span FROM part), " +
       "pos AS (SELECT DISTINCT o_custkey AS pk, l_partkey FROM lineitem " +
       "JOIN orders ON l_orderkey = o_orderkey), " +
       "cand AS (SELECT c_custkey, j, " +
       "(c_custkey * 2654435761 + j * 40503) % span + minp AS cand " +
       "FROM customer, bounds, " +
       s"(SELECT UNNEST(generate_series(0, ${NegCandidates - 1})) AS j)), " +
       "neg AS (SELECT * FROM cand c WHERE NOT EXISTS (SELECT 1 FROM pos p " +
       "WHERE p.pk = c.c_custkey AND p.l_partkey = c.cand)), " +
       "r AS (SELECT c_custkey, cand, " +
       "ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY j) AS rnk FROM neg) " +
       "SELECT c_custkey, CAST(rnk AS BIGINT) AS rnk, cand AS neg_partkey " +
       s"FROM r WHERE rnk <= $NegPerKey ORDER BY c_custkey, rnk"),
    "pivot_wide" ->
      ("SELECT n_name, " +
       Segments.map(seg =>
         s"""CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (WHERE c_mktsegment = '$seg') AS DOUBLE) AS "$seg"""")
         .mkString(", ") +
       " FROM customer JOIN nation ON c_nationkey = n_nationkey " +
       "GROUP BY n_name ORDER BY n_name"),
    "unpivot_long" ->
      ("SELECT measure, n, total FROM (" +
       s"SELECT 'l_quantity' AS measure, CAST(COUNT(*) AS BIGINT) AS n, ${dsum6Sql("l_quantity")} AS total FROM lineitem " +
       "UNION ALL " +
       s"SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT), ${dsum6Sql("l_extendedprice")} FROM lineitem " +
       "UNION ALL " +
       s"SELECT 'l_discount', CAST(COUNT(*) AS BIGINT), ${dsum6Sql("l_discount")} FROM lineitem" +
       ") ORDER BY measure"),
    "subq_scalar" ->
      ("SELECT o_orderkey, ROUND(o_totalprice, 2) AS total, " +
       "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items " +
       "FROM orders WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.7 " +
       "ORDER BY o_orderkey"),
    "subq_exists_in" ->
      ("SELECT c_custkey, c_name FROM customer c " +
       "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
       "AND o.o_orderpriority = '1-URGENT') " +
       "AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000) " +
       "ORDER BY c_custkey"),
    "join_lateral" ->
      ("SELECT c.c_custkey, t.o_orderkey, t.total FROM customer c, " +
       "LATERAL (SELECT o_orderkey, ROUND(o_totalprice, 2) AS total FROM orders " +
       "WHERE o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t " +
       "ORDER BY c.c_custkey, t.total DESC, t.o_orderkey"),
    "agg_listagg" ->
      ("SELECT o_orderpriority, " +
       "STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses, " +
       "CAST(COUNT(*) AS BIGINT) AS n " +
       "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "agg_mode_tiebreak" ->
      ("SELECT lang, source, n_docs FROM (" +
       "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
       "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, source) AS rn " +
       "FROM documents GROUP BY lang, source) WHERE rn = 1 ORDER BY lang"),
    "agg_conditional" ->
      ("SELECT l_returnflag, " +
       "CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f, " +
       "BOOL_OR(l_quantity > 49) AS any_big, " +
       "BOOL_AND(l_extendedprice > 0) AS all_pos, " +
       "CAST(COUNT(*) AS BIGINT) AS n " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "sample_hash" ->
      ("SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
       s"${dsumSql("l_extendedprice")} AS total " +
       "FROM lineitem WHERE l_orderkey % 20 = 0 " +
       "GROUP BY l_returnflag ORDER BY l_returnflag"),
    // same md5-prefix bucket: DuckDB parses the 8 hex digits with
    // from_hex → blob → big-endian int reconstruction is avoided by
    // CASTing via base-16 string arithmetic (hex literal concat)
    "sample_split" ->
      ("WITH b AS (SELECT lang, doc_id, n_chars, " +
       "CAST(CONCAT('0x', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket " +
       "FROM documents), " +
       "s AS (SELECT lang, doc_id, n_chars, " +
       "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM b) " +
       "SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
       "CAST(SUM(n_chars) AS BIGINT) AS n_chars, MIN(doc_id) AS first_doc " +
       "FROM s GROUP BY lang, split ORDER BY lang, split"),
    "sample_reservoir_k" ->
      ("SELECT doc_id, lang, n_chars, " +
       "MD5('res:' || CAST(doc_id AS VARCHAR)) AS rk FROM documents " +
       "ORDER BY rk, doc_id LIMIT 100"),
    // same md5-prefix bucket, keyed by the GROUP (user), seeded
    "sample_group_kfold" ->
      ("WITH f AS (SELECT CAST(CONCAT('0x', SUBSTRING(MD5('fold:' || " +
       s"CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % $KFolds AS fold, " +
       "user_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events) " +
       "SELECT fold, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, " +
       "CAST(COUNT(*) AS BIGINT) AS n_events, " +
       "CAST(SUM(cents) AS BIGINT) AS total_cents " +
       "FROM f GROUP BY fold ORDER BY fold"),
    // same A-ES key: u from the md5 prefix via the hex-literal CAST,
    // -LN(u)/n_chars fround8-pinned before the bottom-k
    "sample_weighted" ->
      ("WITH b AS (SELECT doc_id, lang, n_chars, " +
       froundSql("-LN((CAST(CONCAT('0x', SUBSTRING(MD5('wres:' || " +
       "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1) / 4294967296.0) " +
       "/ n_chars", 8) + " AS wkey FROM documents) " +
       "SELECT doc_id, lang, n_chars, wkey FROM b ORDER BY wkey, doc_id LIMIT 100"),
    // same seeded order, same data-dependent min-class cutoff
    "sample_balanced" ->
      ("WITH d AS (SELECT doc_id, lang, n_chars, " +
       "MD5('bal:' || CAST(doc_id AS VARCHAR)) AS rk FROM documents), " +
       "m AS (SELECT MIN(cnt) AS min_n FROM " +
       "(SELECT COUNT(*) AS cnt FROM d GROUP BY lang)), " +
       "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rn FROM d) " +
       "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
       "CAST(SUM(n_chars) AS BIGINT) AS sum_chars " +
       "FROM r, m WHERE rn <= min_n GROUP BY lang ORDER BY lang"),
    // same α=0.5 chain: sqrt is correctly-rounded IEEE on both
    // engines, the denominator re-pins each term through dsum6, and
    // boost divides the two already-pinned shares
    // same moment sums, same fround6 pins before floor and rank, same
    // largest-remainder distribution over the 5-row strata table
    "sample_neyman_alloc" ->
      ("WITH st AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
       dsum6Sql("CAST(n_chars AS DOUBLE)") + " AS s1, " +
       dsum6Sql("CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)") + " AS s2 " +
       "FROM documents GROUP BY 1), " +
       "sd AS (SELECT lang, n_docs, " +
       froundSql("SQRT(GREATEST((s2 - s1 * s1 / n_docs) / (n_docs - 1), 0.0))", 6) +
       " AS sd FROM st), " +
       "tot AS (SELECT " + dsum6Sql("n_docs * sd") + " AS wtot FROM sd), " +
       "b AS (SELECT lang, n_docs, sd, exact, " +
       "CAST(FLOOR(exact) AS BIGINT) AS base, " +
       froundSql("exact - FLOOR(exact)", 6) + " AS rem FROM (" +
       "SELECT lang, n_docs, sd, " +
       froundSql(s"$NeymanBudget * n_docs * sd / (SELECT wtot FROM tot)", 6) +
       " AS exact FROM sd)), " +
       s"lo AS (SELECT $NeymanBudget - SUM(base) AS lo FROM b), " +
       "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rnk FROM b) " +
       "SELECT lang, n_docs, sd, exact AS exact_alloc, " +
       "CAST(base + CASE WHEN rnk <= (SELECT lo FROM lo) THEN 1 ELSE 0 END " +
       "AS BIGINT) AS alloc FROM r ORDER BY lang"),

    "sample_temperature" ->
      ("WITH t AS (SELECT lang, " +
       "CAST(SUM(LEN(STRING_SPLIT(LOWER(text), ' '))) AS BIGINT) AS n_tokens " +
       "FROM documents GROUP BY 1), " +
       "tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, " +
       dsum6Sql("SQRT(n_tokens)") + " AS ssqrt FROM t), " +
       "p AS (SELECT lang, n_tokens, " +
       froundSql("CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)", 6) + " AS p_raw, " +
       froundSql("SQRT(n_tokens) / ssqrt", 6) + " AS p_temp FROM t, tot) " +
       "SELECT lang, n_tokens, p_raw, p_temp, " +
       froundSql("p_temp / p_raw", 4) + " AS boost " +
       "FROM p ORDER BY lang"),

    // independent per-column UNION ALL formulation of the one-pass
    // profiling aggregate
    "profile_columns" -> {
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_returnflag", "l_shipdate")
      cols.map(c =>
        s"SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(COUNT($c) AS BIGINT) AS n_nonnull, " +
        s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, " +
        s"CAST(MIN($c) AS VARCHAR) AS min_val, " +
        s"CAST(MAX($c) AS VARCHAR) AS max_val FROM lineitem"
      ).mkString("", " UNION ALL ", " ORDER BY col_name")
    },

    // one independent SELECT per expectation — the n_failed counts
    // re-derive from scratch, never from the engine's single-pass
    // aggregate shape
    // identical md5 pseudonym, 500-band generalization, and union
    "dq_column_masking" ->
      ("WITH c AS (SELECT * FROM customer WHERE c_custkey < 10) " +
       "SELECT * FROM (" +
       "SELECT 'admin' AS role, c_custkey, c_name, c_acctbal, c_mktsegment FROM c " +
       "UNION ALL " +
       "SELECT 'analyst' AS role, c_custkey, " +
       "'anon-' || SUBSTRING(MD5(c_name), 1, 8) AS c_name, " +
       "CAST(FLOOR(c_acctbal / 500) * 500 AS DOUBLE) AS c_acctbal, " +
       "c_mktsegment FROM c) " +
       "ORDER BY role, c_custkey"),

    // identical corpus bounds, integer-µs lag division, SLA constant
    // interpolated, and the same floor-rounded hourly rate
    "dq_freshness" ->
      ("WITH g AS (SELECT MAX(epoch_us(ts)) AS gmax, MIN(epoch_us(ts)) AS gmin " +
       "FROM events), " +
       "t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       "MAX(ts) AS last_seen, MAX(epoch_us(ts)) AS tmax, " +
       "CAST(SUM(CASE WHEN epoch_us(ts) > g.gmax - 3600000000 THEN 1 ELSE 0 END) " +
       "AS BIGINT) AS n_last_hour, MAX(g.gmax) AS gmax, MAX(g.gmin) AS gmin " +
       "FROM events, g GROUP BY event_type) " +
       "SELECT event_type, n, last_seen, " +
       "CAST((gmax - tmax) // 60000000 AS BIGINT) AS minutes_behind, " +
       s"((gmax - tmax) // 60000000) <= $FreshnessSlaMinutes AS is_fresh, " +
       "n_last_hour, " +
       froundSql("CAST(n AS DOUBLE) / CAST((gmax - gmin) // 3600000000 + 1 AS DOUBLE)", 2) +
       " AS hourly_avg FROM t ORDER BY event_type"),

    "dq_expectations" -> {
      def e(name: String, from: String, failed: String) =
        s"SELECT '$name' AS expectation, CAST(COUNT(*) AS BIGINT) AS n_checked, " +
        s"CAST($failed AS BIGINT) AS n_failed, ($failed) = 0 AS passed FROM $from"
      Seq(
        e("documents.text non-empty", "documents",
          "COUNT(CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 1 END)"),
        e("events.value not null", "events",
          "COUNT(CASE WHEN value IS NULL THEN 1 END)"),
        e("lineitem.l_discount in [0,1]", "lineitem",
          "COUNT(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 1 THEN 1 END)"),
        e("lineitem.l_orderkey references orders", "lineitem",
          "COUNT(CASE WHEN l_orderkey NOT IN (SELECT o_orderkey FROM orders) THEN 1 END)"),
        e("lineitem.l_quantity > 0", "lineitem",
          "COUNT(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 END)"),
        e("orders.o_orderkey unique", "orders",
          "COUNT(*) - COUNT(DISTINCT o_orderkey)"),
        e("orders.o_orderstatus in {O,F,P}", "orders",
          "COUNT(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 END)"),
        e("orders.o_totalprice in (0,1e6]", "orders",
          "COUNT(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 OR o_totalprice > 1e6 THEN 1 END)")
      ).mkString("", " UNION ALL ", " ORDER BY expectation")
    },

    // independent CTE derivation of the class grid + pooled sub-k mass
    // same planted-arithmetic corruption, same anti-join semantics via
    // NOT IN over the parent key set (NULL-free keys, so NOT IN is the
    // exact anti join)
    "dq_referential" ->
      ("WITH d AS (SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 10000000 " +
       "ELSE o_custkey END AS fk FROM orders), " +
       "e1 AS (SELECT 'orders.o_custkey->customer' AS edge, " +
       "CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_child, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orphans, " +
       "CAST(COUNT(DISTINCT fk) AS BIGINT) AS n_missing_keys " +
       "FROM d WHERE fk NOT IN (SELECT c_custkey FROM customer)), " +
       "e2 AS (SELECT 'lineitem.l_partkey->part' AS edge, " +
       "CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orphans, " +
       "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_missing_keys " +
       "FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)), " +
       "e3 AS (SELECT 'lineitem.l_suppkey->supplier' AS edge, " +
       "CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orphans, " +
       "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_missing_keys " +
       "FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) " +
       "SELECT edge, n_child, n_orphans, n_missing_keys, n_orphans = 0 AS ok " +
       "FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3) " +
       "ORDER BY edge"),

    "dq_k_anonymity" ->
      (s"WITH c0 AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n " +
       "FROM customer GROUP BY 1, 2), " +
       s"c1 AS (SELECT c_nationkey, SUM(n) AS n1 FROM c0 WHERE n < $KAnonymity GROUP BY 1) " +
       "SELECT c0.c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n_rows, " +
       s"CAST(CASE WHEN n >= $KAnonymity THEN 0 " +
       s"WHEN n1 >= $KAnonymity THEN 1 ELSE 2 END AS BIGINT) AS gen_level " +
       "FROM c0 LEFT JOIN c1 ON c0.c_nationkey = c1.c_nationkey " +
       "ORDER BY 1, 2"),

    // independent derivation over the same per-key frequency CTE
    "profile_key_skew" ->
      ("WITH f AS (SELECT l_suppkey, COUNT(*) AS f FROM lineitem GROUP BY 1), " +
       "s AS (SELECT CAST(SUM(f) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys, " +
       "CAST(MAX(f) AS BIGINT) AS max_freq, " +
       "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY f) AS p50r, " +
       "PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY f) AS p99r FROM f) " +
       "SELECT n_rows, n_keys, max_freq, " +
       froundSql("p50r", 4) + " AS p50_freq, " +
       froundSql("p99r", 4) + " AS p99_freq, " +
       froundSql("CAST(max_freq AS DOUBLE) / CAST(n_rows AS DOUBLE)", 6) + " AS top_share, " +
       froundSql("CAST(max_freq AS DOUBLE) / (" + froundSql("p50r", 4) + ")", 4) + " AS skew_ratio " +
       "FROM s ORDER BY n_rows"),

    // the oracle is the FULL recompute — the monoid law
    // merge(partial(snapshot), partial(delta)) == full(all rows) is
    // what the comparison proves
    "agg_incremental_maintain" ->
      ("SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents, " +
       "MAX(o_orderdate) AS last_order_d " +
       "FROM orders GROUP BY 1 ORDER BY 1"),

    // the oracle is the full recompute over (base MINUS deletes) UNION
    // inserts — comparing it against the engine's signed-group merge +
    // dirty-key max repair proves the retraction algebra end-to-end
    "agg_incremental_retract" ->
      ("WITH base AS (SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate, " +
       "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents " +
       "FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'), " +
       "final AS (" +
       "SELECT o_custkey, o_orderdate, cents FROM base " +
       s"WHERE NOT (o_orderstatus = 'F' AND o_orderkey % $RetractMod = 0) " +
       "UNION ALL " +
       "SELECT o_custkey, o_orderdate, CAST(FLOOR(o_totalprice * 100) AS BIGINT) " +
       "FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01') " +
       "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(SUM(cents) AS BIGINT) AS total_cents, " +
       "MAX(o_orderdate) AS last_order_d " +
       "FROM final GROUP BY 1 ORDER BY 1"),

    // the oracle is the ONE-SHOT full join — comparing it against the
    // engine's four-arm union proves the bilinear delta rule itself
    "join_incremental_maintain" ->
      ("SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_items, " +
       "CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS item_cents " +
       "FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
       "GROUP BY 1 ORDER BY 1"),

    "merge_upsert" ->
      ("WITH base AS (SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority, " +
       "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
       "FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01') WHERE rn = 1), " +
       "delta AS (SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority, " +
       "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
       "FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01') WHERE rn = 1) " +
       "SELECT COALESCE(d.o_custkey, b.o_custkey) AS o_custkey, " +
       "CASE WHEN d.o_custkey IS NULL THEN 'keep' WHEN b.o_custkey IS NULL THEN 'insert' " +
       "ELSE 'update' END AS action, " +
       "COALESCE(d.o_orderkey, b.o_orderkey) AS o_orderkey, " +
       "ROUND(COALESCE(d.o_totalprice, b.o_totalprice), 2) AS total, " +
       "COALESCE(d.o_orderpriority, b.o_orderpriority) AS o_orderpriority " +
       "FROM base b FULL OUTER JOIN delta d ON b.o_custkey = d.o_custkey " +
       "ORDER BY o_custkey"),
    // same four-way CASE; delta-only tombstones (deletes of absent
    // keys) filtered out as the MERGE no-op arm; deleted keys keep a
    // NULL payload so the action split stays auditable
    "merge_cdc_delete" ->
      ("WITH base AS (SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority, " +
       "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
       "FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01') WHERE rn = 1), " +
       "delta AS (SELECT *, o_orderpriority = '5-LOW' AS tomb FROM " +
       "(SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority, " +
       "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
       "FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01') WHERE rn = 1) " +
       "SELECT o_custkey, action, o_orderkey, total, o_orderpriority FROM (" +
       "SELECT COALESCE(d.o_custkey, b.o_custkey) AS o_custkey, " +
       "CASE WHEN d.o_custkey IS NULL THEN 'keep' " +
       "WHEN b.o_custkey IS NULL THEN 'insert' " +
       "WHEN d.tomb THEN 'delete' ELSE 'update' END AS action, " +
       "CASE WHEN b.o_custkey IS NOT NULL AND d.tomb THEN NULL " +
       "ELSE COALESCE(d.o_orderkey, b.o_orderkey) END AS o_orderkey, " +
       "CASE WHEN b.o_custkey IS NOT NULL AND d.tomb THEN NULL " +
       "ELSE ROUND(COALESCE(d.o_totalprice, b.o_totalprice), 2) END AS total, " +
       "CASE WHEN b.o_custkey IS NOT NULL AND d.tomb THEN NULL " +
       "ELSE COALESCE(d.o_orderpriority, b.o_orderpriority) END AS o_orderpriority " +
       "FROM base b FULL OUTER JOIN delta d ON b.o_custkey = d.o_custkey " +
       "WHERE NOT (b.o_custkey IS NULL AND d.tomb)) " +
       "ORDER BY o_custkey"),
    "scd2_history" ->
      ("WITH " + Scd2Cte + " " +
       "SELECT o_custkey, version, o_orderpriority, valid_from, valid_to, " +
       "valid_to IS NULL AS is_current FROM v ORDER BY o_custkey, version"),
    // interval-semantics formulation of the same point-in-time
    // resolution the query's running struct-max computes: the SCD2
    // intervals partition each customer's timeline, so the LEFT JOIN
    // matches at most one version per fact
    "join_pit_scd2" ->
      ("WITH " + Scd2Cte + ", " +
       "f AS (SELECT o.o_custkey, " +
       s"CAST(${ymdSql("l_shipdate")} AS BIGINT) AS s, l.l_extendedprice AS price " +
       "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), " +
       "j AS (SELECT COALESCE(v.o_orderpriority, 'none') AS prio_at_ship, f.price " +
       "FROM f LEFT JOIN v ON v.o_custkey = f.o_custkey " +
       "AND v.valid_from <= f.s AND (v.valid_to IS NULL OR f.s < v.valid_to)) " +
       "SELECT prio_at_ship, CAST(COUNT(*) AS BIGINT) AS n_items, " +
       dsumSql("price") + " AS revenue " +
       "FROM j GROUP BY 1 ORDER BY 1"),
    "cte_recursive" ->
      ("WITH RECURSIVE m(mo) AS (SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12) " +
       "SELECT mo, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders " +
       "FROM m LEFT JOIN orders ON EXTRACT(MONTH FROM o_orderdate) = mo " +
       "GROUP BY mo ORDER BY mo")
  )
}
