package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** k-core peeling (graph_kcore): planted graphs pin the peel
  * semantics — a pendant chain needs one round PER LINK to strip
  * (peeling is genuinely iterative, not a single degree filter), and
  * the fixture's co-occurrence graph converges inside the shipped
  * [[Analytics.KCorePeelRounds]] cap, so the fixed-round oracle
  * contract ("both engines run exactly N rounds") equals the true
  * k-core there. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def bidir(pairs: Seq[(Long, Long)]) = {
    val p = pairs.toDF("u", "v")
    p.unionByName(p.select(col("v").as("u"), col("u").as("v")))
  }

  // triangle 1-2-3 with a pendant chain 3-4-5-6
  private val planted = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))

  test("2-core of triangle + pendant chain is exactly the triangle") {
    val core = Analytics.kcorePeel(bidir(planted), 2, 4)
      .groupBy("u").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("each peel round strips one chain link (iterative, not one filter)") {
    // after 1 round only the leaf 6 is gone; node 5 still present
    val one = Analytics.kcorePeel(bidir(planted), 2, 1)
      .select("u").distinct().as[Long].collect().toSet
    assert(one == Set(1L, 2L, 3L, 4L, 5L))
    val two = Analytics.kcorePeel(bidir(planted), 2, 2)
      .select("u").distinct().as[Long].collect().toSet
    assert(two == Set(1L, 2L, 3L, 4L))
  }

  test("3-core of the triangle is empty (degree threshold honored)") {
    assert(Analytics.kcorePeel(bidir(planted), 3, 4).count() == 0)
  }

  test("a graph needing more rounds than the cap fails LOUDLY under requireConverged") {
    // pendant chain of 8 nodes: the 2-core is empty but stripping it
    // takes 4 rounds (one link pair per round) — at 2 rounds nodes
    // 3..6 survive with chain-end degrees < 2, so the check must
    // refuse to return the partial peel as the k-core
    val chain = bidir((1L to 7L).map(i => (i, i + 1)))
    val e = intercept[RuntimeException] {
      Analytics.kcorePeel(chain, 2, 2, requireConverged = true)
    }
    assert(e.getMessage.contains("NOT converged"), e.getMessage)
  }

  test("requireConverged is inert on a converged graph (fixture path unchanged)") {
    assertSameRows(
      Analytics.kcorePeel(bidir(planted), 2, 4, requireConverged = true),
      Analytics.kcorePeel(bidir(planted), 2, 4),
      "requireConverged changed a converged result")
  }

  test("fixture co-occurrence graph converges inside the shipped round cap") {
    val pairs = Analytics.cooccurEdges(Tables.lineitem(spark, sf001))
    val b = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
    val atCap = Analytics.kcorePeel(b, Analytics.KCoreK, Analytics.KCorePeelRounds)
    val beyond = Analytics.kcorePeel(b, Analytics.KCoreK, Analytics.KCorePeelRounds + 2)
    assertSameRows(atCap, beyond, "peel not converged at the shipped cap")
  }

  test("convergence at the cap holds on the larger sf0.01 fixture too") {
    // ADVICE r10: the equals-the-true-k-core property was pinned only
    // at sf0.001; a regenerated larger fixture could silently need
    // more rounds (requireConverged would catch it at run time — this
    // pins it at test time on the SF the driver verifies)
    val pairs = Analytics.cooccurEdges(Tables.lineitem(spark, sf01))
    val b = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
    val atCap = Analytics.kcorePeel(b, Analytics.KCoreK, Analytics.KCorePeelRounds)
    val beyond = Analytics.kcorePeel(b, Analytics.KCoreK, Analytics.KCorePeelRounds + 2)
    assertSameRows(atCap, beyond, "sf0.01 peel not converged at the shipped cap")
  }
}
