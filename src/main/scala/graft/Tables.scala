package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central catalog for the driver-provided parquet tables.
  *
  * Carries the reference's load surface (i3cols `cols.load`, lazy mmap —
  * see SURVEY.md §2.1 R5) re-expressed as lazy, column-pruned,
  * predicate-pushed Parquet scans. At 100 TB these reads become
  * multi-executor file splits with row-group skipping; nothing here
  * collects to the driver.
  */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  /** Lazy parquet scan of one driver table. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives in whatever parquet timestamp flavor the driver
    * generated this round, so the load is TYPE-ADAPTIVE; downstream
    * code always sees a session-TZ (UTC) µs TIMESTAMP:
    *  - timestamp[ns] (rounds 1–9): Spark 4.x refuses it natively
    *    (PARQUET_TYPE_ILLEGAL) → `nanosAsLong` reads BIGINT nanos,
    *    truncated with `ts DIV 1000` (integer division — `/1000` would
    *    route through DOUBLE and lose precision at 1.7e18 magnitudes).
    *  - timestamp[us] (round-10 regeneration): read natively as
    *    TIMESTAMP_NTZ, cast to TIMESTAMP — with the session TZ pinned
    *    to UTC the micros value is unchanged, matching DuckDB's naive
    *    read bit-for-bit.
    * Both shapes agree with the oracle exactly (FIXTURES.md).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanosAsLong only fires for parquet timestamp[ns]; a plain
        // BIGINT micros column would land here too and be divided 1000×
        // wrong. Row-local magnitude guard (ADVICE r10): nanos for any
        // post-1973 instant exceed 1e17 while micros stay below 1e14
        // until year ~5138 — a sub-threshold value means the fixture is
        // NOT nanos, so fail loudly on the first row instead of
        // silently corrupting every timestamp 1000×. The CASE folds
        // into the same codegen'd projection: no extra scan, no action.
        raw.withColumn("ts", expr(
          "timestamp_micros((CASE WHEN ts < 100000000000000000 THEN " +
          "CAST(raise_error(concat('events.ts BIGINT value ', CAST(ts AS STRING), " +
          "' is below nanos magnitude (1e17) — a micros-as-BIGINT fixture? " +
          "Teach Tables.events the new shape instead of dividing it 1000x wrong')) AS BIGINT) " +
          "ELSE ts END) DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => sys.error(
        s"events.ts arrived as unsupported type $other — teach Tables.events " +
        "the new fixture shape instead of letting it flow unvalidated")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** Content fingerprint of a table path: file names + sizes + mtimes.
    * Shared by every cross-query memo/catalog key (bucketed-table reuse
    * in Joins, the near-dup pair memo in Dedup, the skip manifest in
    * Scans): a regenerated fixture at the same path changes the
    * fingerprint, so stale cached artifacts are never served. */
  def fsSig(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else fs.listStatus(p).sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString(",")
  }

  /** Run `f` with adaptive query execution disabled, restoring the
    * previous value after (r22, guide §1.2 step 1). For CAP-BOUNDED
    * iterative operators (NND descent, beam walks, HITS/score loops)
    * AQE buys nothing — per-round volumes are bounded by construction
    * (degree caps, beam width, node cardinality), the joins are
    * explicitly broadcast-hinted or key-bounded, and skew is capped by
    * the same constants — while its per-stage materialize-and-replan
    * turns every exchange into its own job: one NND build measured 26
    * jobs with AQE on vs 9 off, 3.50 s vs 2.40 s median (Opt22Probe).
    * Disabling it ALSO makes the loop's lazy localCheckpoints truly
    * lazy (with AQE on, execute() materializes every shuffle stage at
    * checkpoint-call time), so a whole build collapses into the
    * consumer's job instead of a driver barrier per round. Scoped to
    * the operator: fleet queries keep AQE (coalescing/skew handling
    * matter for unbounded scans and joins at 100 TB). */
  def withAqeOff[T](spark: SparkSession)(f: => T): T = {
    val k = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  /** getOrElseUpdate for the per-(applicationId, fixture-signature)
    * artifact memos that EVICTS superseded entries (ADVICE r21 #2):
    * when a new signature shows up for the same (applicationId,
    * prefix) — a fixture dir regenerated within one JVM — the stale
    * entry's checkpointed blocks are unpersisted and the entry
    * dropped, bounding retention to one live artifact per memo per
    * fixture. In the Bench/Verify lifecycle signatures never change
    * mid-JVM, so this costs nothing there; it exists for long-lived
    * sessions over mutable fixture dirs. */
  def memoArtifact[V](
      memo: scala.collection.concurrent.TrieMap[(String, String), V],
      appId: String, prefix: String, sig: String)(unpersist: V => Unit)
      (build: => V): V = {
    val key = (appId, prefix + sig)
    memo.get(key).getOrElse {
      memo.keysIterator
        .filter(k => k._1 == appId && k._2.startsWith(prefix) && k._2 != key._2)
        .toList
        .foreach(k => memo.remove(k).foreach(v =>
          try unpersist(v) catch { case _: Throwable => () }))
      memo.getOrElseUpdate(key, build)
    }
  }

  /** Unpersist every checkpointed RDD a memoized frame's plan holds —
    * the eviction callback for [[memoArtifact]]. */
  def freeCheckpoints(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false); ()
      case _ => ()
    }

  /** Scratch path for sink/roundtrip operators, scoped by input dir and
    * JVM: two scale factors or a concurrent Bench+Verify pair never
    * collide on the same output location (ADVICE r1). */
  def scratch(dir: String, name: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val pid = ProcessHandle.current().pid()
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_${name}_${tag}_$pid"
  }

  // ---- oracle-parity helpers (SURVEY.md §2.6) ----

  /** Round a float aggregate for hash-stable comparison. */
  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)

  /** Spark count()/rank() et al. return Int or Long inconsistently vs
    * DuckDB's BIGINT; normalize every integer aggregate to LongType. */
  def big(c: Column): Column = c.cast("long")

  /** Order-independent money sum. Double summation over ~1e5 rows at
    * ~1e5 magnitudes carries ~1e-4..1e-3 accumulation error that depends
    * on partition/merge order — enough to flip a round(x, 2) at the .005
    * boundary and fail hash-parity. Summing as DECIMAL(18,2) is exact and
    * associative; the single final cast to double is deterministic on
    * both engines. Oracle side: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Oracle-SQL fragment matching [[dsum]]. */
  def dsumSql(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"

  /** Like [[dsum]] but for COMPUTED money expressions (products of
    * 2-decimal values have up to 6 exact decimals; casting those to
    * DECIMAL(…,2) hits exact .xx5 midpoints, where Spark rounds the
    * double's shortest string repr half-up while DuckDB rounds the exact
    * binary value — systematic mismatches). DECIMAL(24,6) holds the
    * product exactly, so no midpoint is ever hit. */
  def dsum6(c: Column): Column = sum(c.cast("decimal(24,6)")).cast("double")
  def dsum6Sql(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(24,6))) AS DOUBLE)"

  /** Engine-agnostic rounding for computed doubles. Spark's round()
    * rounds the value's shortest decimal repr (HALF_UP via
    * BigDecimal.valueOf), DuckDB rounds the exact binary value — they
    * disagree whenever the true value terminates at the midpoint digit
    * (structural for cents arithmetic). floor(x*10^n + 0.5)/10^n is the
    * SAME IEEE arithmetic on both engines → bit-identical results.
    * Do not use on possibly-NaN input (Spark floor(NaN)→0, DuckDB→NaN). */
  def fround(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * f + 0.5) / f
  }

  /** JVM-scalar twin of [[fround]] at n=6 — ONE definition of the
    * 6-decimal pin shared by batch Column expressions and streaming
    * JVM-side folds (ADVICE r11: a hand-inlined copy in a stream's
    * emission could drift from the batch declaration silently). Same
    * NaN caveat as [[fround]]. */
  def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** JVM-scalar twin of [[dsum6]] — ONE definition shared by every
    * driver-side budget-gated arm (the PCA eigensolve, HITS): each
    * IEEE term pinned to DECIMAL(24,6) exactly as Spark's
    * double→decimal cast does (shortest decimal repr via
    * Double.toString — java.math.BigDecimal.valueOf is that exact
    * call — then HALF_UP at scale 6), summed exactly in decimal, one
    * final doubleValue — bit-identical to
    * sum(cast(x as decimal(24,6))).cast("double"). */
  def dsum6Local(xs: Iterator[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    while (xs.hasNext)
      acc = acc.add(java.math.BigDecimal.valueOf(xs.next())
        .setScale(6, java.math.RoundingMode.HALF_UP))
    acc.doubleValue
  }
  def froundSql(expr: String, n: Int): String =
    s"FLOOR(($expr) * 1e$n + 0.5) / 1e$n"

  /** Exact average: decimal sum (order-independent) over count, floor-
    * rounded. Plain AVG of cents values is sum/count whose decimal
    * expansion often terminates near the rounding digit → see [[fround]]. */
  def avgExact(c: Column, n: Int): Column =
    fround(sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1)), n)
  def avgExactSql(expr: String, n: Int): String =
    froundSql(s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", n)
}
