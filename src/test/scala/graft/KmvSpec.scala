package graft

import graft.operators.Aggregations
import org.apache.spark.sql.functions._

/** KMV distinct-intersection sketch (agg_kmv_intersection): the oracle
  * pins exact output on the shipped fixture (where every pair fully
  * overlaps); these plant audiences with KNOWN partial overlaps and
  * exercise both code paths — the exact branch (union below sketch
  * size) and the estimate branch (saturated sketches), with the error
  * certificate bounding the estimate. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]) =
    Aggregations.kmvIntersections(rows.toDF("event_type", "user_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap

  test("small audiences take the exact branch: estimate IS the truth") {
    // |A|=10, |B|=8, |A∩B|=4 — union 14 < k=32, so sketches are the
    // full sets and both estimates must equal the exact counts
    val rows = (0L until 10L).map(("a", _)) ++ (6L until 14L).map(("b", _))
    val m = run(rows)
    val (nBoth, estU, estI, exact) = m(("a", "b"))
    assert(exact == 4L && nBoth == 4L)
    assert(estU == 14.0 && estI == 4.0, m)
  }

  test("saturated sketches estimate a planted half-overlap within 3 stderr") {
    // |A|=|B|=600, |A∩B|=200, |A∪B|=1000 — far above k, so the
    // (k−1)/h_k branch runs; KMV stderr ≈ |A∪B|/sqrt(k−2)
    val rows = (0L until 600L).map(("a", _)) ++ (400L until 1000L).map(("b", _))
    val m = run(rows)
    val (nBoth, estU, estI, exact) = m(("a", "b"))
    assert(exact == 200L)
    val k = Aggregations.KmvK
    val tolU = 3.0 * 1000.0 / math.sqrt(k - 2.0)
    assert(math.abs(estU - 1000.0) < tolU, s"est_union=$estU")
    // intersection estimate: ρ·est_union with binomial ρ noise on top
    assert(estI > 0.0 && math.abs(estI - 200.0) < 200.0, s"est_inter=$estI")
    assert(nBoth <= k)
  }

  test("disjoint audiences report zero intersection in both lanes") {
    val rows = (0L until 100L).map(("a", _)) ++ (1000L until 1100L).map(("b", _))
    val m = run(rows)
    val (nBoth, _, estI, exact) = m(("a", "b"))
    assert(nBoth == 0L && estI == 0.0 && exact == 0L, m)
  }

  test("fixture run: estimate within 4 stderr of the exact certificate") {
    val out = SparkEntry.queries("agg_kmv_intersection")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val estU = r.getDouble(3); val estI = r.getDouble(4); val exact = r.getLong(5)
      val tol = 4.0 * estU / math.sqrt(Aggregations.KmvK - 2.0)
      assert(math.abs(estI - exact) <= tol + 1.0,
        s"${r.getString(0)}/${r.getString(1)}: est=$estI exact=$exact tol=$tol")
    }
  }
}
