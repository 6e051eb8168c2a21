package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** graph_ktruss pins: the planted graphs make the peel's two defining
  * behaviors hand-checkable — support counts closed wedges (so a
  * clique survives while its decorations peel), and removal CASCADES
  * (an edge can lose its last triangle only because another edge
  * peeled first, which no single-round support cut can express). */
class KTrussSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  test("a 4-clique survives the 4-truss; its pendant triangle peels") {
    // K4 on {1,2,3,4}: every edge sits in exactly 2 triangles — the
    // minimal 4-truss. Node 5 hangs off edge (3,4) forming ONE
    // triangle {3,4,5}: (3,5)/(4,5) have support 1 and peel; (3,4)
    // keeps its two clique triangles and stays.
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
                  (3L, 4L), (3L, 5L), (4L, 5L))
    val out = Analytics.ktrussPeel(e, 4,
        Analytics.TrussPeelRounds, requireConverged = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
                      (2L, 4L), (3L, 4L)), out)
  }

  test("peeling cascades: a triangle strip dissolves over two rounds") {
    // triangles {1,2,3},{2,3,4},{3,4,5}: round 1 peels every
    // support-1 edge, leaving only (2,3) and (3,4) — whose triangles
    // just died — so round 2 peels them too. A single support pass
    // would wrongly keep the two shared edges.
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
                  (3L, 4L), (3L, 5L), (4L, 5L))
    val out = Analytics.ktrussPeel(e, 4,
        Analytics.TrussPeelRounds, requireConverged = true)
    assert(out.count() == 0L, "the strip must dissolve completely")
  }

  test("fixture query: truss degrees positive, truss ⊆ 2-core node set") {
    val rows = SparkEntry.queries("graph_ktruss")(spark, sf001).collect()
    // in a converged 3-truss every edge sits in >= 1 surviving
    // triangle, so every member node keeps >= 2 surviving incident
    // edges
    assert(rows.nonEmpty, "the 3-truss must be non-empty at sf0.001")
    assert(rows.forall(_.getLong(1) >= 2),
      "every 3-truss member keeps >= 2 surviving incident edges")
    // every truss node also appears in the k-core readout's graph
    // (truss is the stricter core) — compare against kcore nodes
    val core = SparkEntry.queries("graph_kcore")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val truss = rows.map(_.getLong(0)).toSet
    assert(truss.subsetOf(core),
      s"truss nodes must be a subset of the 2-core: ${truss -- core}")
  }
}
