package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions module: functions reachable from pure
  * SQL and the injected optimizer rule actually firing. Builds a
  * second session over the shared context (public API only) so the
  * extension wiring — not a hand-registered UDF — is what's tested. */
class ExtensionsSpec extends SparkSpec {

  private lazy val extended: SparkSession = {
    val base = spark // force the shared context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new plans.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("graft kernels are callable from pure SQL via the extension") {
    val r = extended.sql(
      """SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c,
        |       graft_simhash64(array(42L)) AS h,
        |       size(graft_minhash_sig(array(1L, 2L, 3L), 16)) AS nsig,
        |       size(graft_hyperplane_lsh(array(cast(1.0 as float), cast(-2.0 as float)), 4, 8)) AS ntab
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == 42L)
    assert(r.getInt(2) == 16)
    assert(r.getInt(3) == 4)
  }

  test("graft_freq_topk aggregate is callable from SQL (exact below capacity)") {
    val rows = extended.sql(
      """SELECT e.key, e.est, e.err
        |FROM (SELECT graft_freq_topk(k, 8) AS sk
        |      FROM VALUES ('a'),('a'),('a'),('b'),('b'),('c') AS t(k))
        |LATERAL VIEW explode(sk) AS e
        |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  // inputs below are id-dependent (non-foldable) so built-in constant
  // folding can't evaluate the expression into a LocalRelation before
  // the plan-shape assertions run

  test("SelfCosineIsOne strength-reduces cosine(x, x) in the optimized plan") {
    val df = extended.sql(
      """SELECT graft_cosine(v, v) AS c FROM
        |(SELECT array(cast(id AS double) + 3.0d, 4.0d) AS v FROM range(1))""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_selfcos"), optimized)
    assert(!optimized.contains("graft_cosine("), optimized)
    assert(df.collect()(0).getDouble(0) == 1.0)
  }

  test("the rewrite preserves degenerate cosine semantics (ADVICE r2)") {
    // all-zero vector: kernel yields 0/0 = NaN — the rewritten plan must too
    val zero = extended.sql( // range(1) ⇒ id = 0 ⇒ the vector is (0.0, 0.0) at runtime
      """SELECT graft_cosine(v, v) AS c FROM
        |(SELECT array(cast(id AS double), 0.0d) AS v FROM range(1))""".stripMargin)
    assert(zero.queryExecution.optimizedPlan.toString.contains("graft_selfcos"))
    assert(zero.collect()(0).getDouble(0).isNaN)
    // null array: null in, null out
    val nul = extended.sql(
      """SELECT graft_cosine(v, v) AS c FROM
        |(SELECT if(id < 0, array(1.0d), cast(null AS array<double>)) AS v FROM range(1))""".stripMargin)
    assert(nul.collect()(0).isNullAt(0))
    // null element: the kernel throws — the rewritten form must not
    // silently return 1.0 (that was the unsound fold)
    val bad = extended.sql(
      """SELECT graft_cosine(v, v) AS c FROM
        |(SELECT array(1.0d, if(id < 0, 1.0d, cast(null AS double))) AS v FROM range(1))""".stripMargin)
    val e = intercept[Exception] { bad.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).map(x => x +: causes(x.getCause)).getOrElse(Nil)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("null element"))), e.toString)
  }

  test("graft_ngrams generator is callable from SQL and matches the HOF bigrams") {
    val got = extended.sql(
      """SELECT ngram FROM (SELECT split('a b c d', ' ') AS t)
        |LATERAL VIEW graft_ngrams(t, 2) g AS ngram ORDER BY ngram""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a b", "b c", "c d"))
    // < n tokens emits nothing
    val none = extended.sql(
      """SELECT ngram FROM (SELECT split('solo', ' ') AS t)
        |LATERAL VIEW graft_ngrams(t, 2) g AS ngram""".stripMargin).count()
    assert(none == 0)
  }

  test("the injected planner strategy plans the custom top-k node (no per-call registration)") {
    import org.apache.spark.sql.graftx.shims
    val df = extended.range(100).selectExpr("id % 5 AS g", "id AS v")
    val plan = plans.TopKPerGroupPlan(
      Seq(shims.expression(df("g"))), shims.expression(df("v")),
      descending = true, tie = Nil, k = 2, child = shims.analyzed(df))
    val out = shims.ofRows(extended, plan)
    assert(out.count() == 10) // 5 groups x top-2
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("PartialTopKPerGroup"), p)
  }

  test("the rule leaves cosine(x, y) with distinct children untouched") {
    // non-foldable children (id-dependent) so built-in constant folding
    // can't collapse the expression before the check
    val df = extended.sql(
      """SELECT graft_cosine(a, b) AS c FROM
        |(SELECT array(cast(id AS double), 1.0d) AS a,
        |        array(1.0d, cast(id AS double)) AS b FROM range(3))""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"), optimized)
    assert(math.abs(df.where("c = 1.0").count() - 1) <= 1) // id=1 gives parallel vectors
  }
}
