package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Degree-ordered triangle orientation (graph_triangles): a planted
  * hub graph pins the skew bound — wedges form only at each
  * triangle's order-LOWEST node, never fanning out at the hub — and
  * the enumeration result is orientation-independent (equal to the
  * naive a<b wedge join on the fixture graph). */
class TriangleOrientationSpec extends SparkSpec {
  import spark.implicits._

  // hub 50 with 40 leaves (ids both below and above the hub, so id
  // orientation splits them in/out), three triangles closed by the
  // leaf edges (1,2), (3,4), (5,6); canonical a < b throughout
  private val hubEdges: Seq[(Long, Long)] =
    (1L to 20L).map(l => (l, 50L)) ++ (81L to 100L).map(h => (50L, h)) ++
      Seq((1L, 2L), (3L, 4L), (5L, 6L))
  private def edgesDf = hubEdges.toDF("a", "b")

  test("degree orientation bounds hub wedge fan-out (id orientation does not)") {
    val byDeg = Analytics.orientedWedges(Analytics.orientByDegree(edgesDf)).count()
    // control: orient by id instead of degree (ddeg := dst id) — the
    // hub's 20 higher-id neighbors become out-edges and the hub alone
    // fans out C(20,2) = 190 wedges
    val byId = Analytics.orientedWedges(
      edgesDf.select(col("a").as("src"), col("b").as("dst"),
                     col("b").as("ddeg"))).count()
    assert(byDeg == 3, s"degree-ordered wedges = $byDeg, want 3 (one per triangle)")
    assert(byId >= 190, s"id-ordered control should fan out at the hub, got $byId")
  }

  test("planted triangles enumerate exactly, as id-sorted triples") {
    val tris = Analytics.trianglesOf(edgesDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tris == Set((1L, 2L, 50L), (3L, 4L, 50L), (5L, 6L, 50L)))
  }

  test("fixture triangles: degree-ordered result equals the naive a<b wedge join") {
    val edges = Analytics.cooccurEdges(Tables.lineitem(spark, sf001)).localCheckpoint()
    val naive = edges
      .join(edges.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(edges.select(col("a").as("a3"), col("b").as("c3")),
            col("a") === col("a3") && col("c") === col("c3"))
      .select("a", "b", "c")
    assertSameRows(Analytics.trianglesOf(edges), naive,
      "degree-ordered triangles diverge from the naive enumeration")
  }
}
