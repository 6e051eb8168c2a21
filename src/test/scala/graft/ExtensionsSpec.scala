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

  test("SelfCosineIsOne folds cosine(x, x) out of the optimized plan") {
    val df = extended.sql(
      "SELECT graft_cosine(v, v) AS c FROM VALUES (array(3.0d, 4.0d)) t(v)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_cosine"), optimized)
    assert(df.collect()(0).getDouble(0) == 1.0)
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
