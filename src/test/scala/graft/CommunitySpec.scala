package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** graph_label_propagation + graph_neighbor_jaccard behavior pins on
  * planted graphs (the KCoreSpec discipline: tiny graphs whose answer
  * is hand-checkable, driven through the SAME closures the shipped
  * queries run).
  *
  * LPA contract reminder: synchronous, fixed [[Analytics.LpaRounds]]
  * rounds, most-frequent neighbor label, ties to the SMALLEST label —
  * no fixpoint claim (synchronous LPA can 2-cycle), so the tests pin
  * the exact after-N-rounds state, including the oscillation case.
  */
class CommunitySpec extends SparkSpec {
  import spark.implicits._

  private def bidir(edges: Seq[(Long, Long)]) =
    edges.toDF("a", "b").select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.toDF("a", "b").select(col("b").as("u"), col("a").as("v")))

  // two 4-cliques bridged by one edge (4, 11)
  private val twoCliques: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L), (12L, 14L), (13L, 14L),
        (4L, 11L))

  test("LPA: bridged cliques converge to their min-id labels inside the round cap") {
    // hand-simulated: round 1 {1→2, 2→1, 3→1, 4→1, 11→4, 12..14→11},
    // round 2 reaches the fixpoint {A→1, B→11}, rounds 3..4 identity
    val got = Analytics.labelPropagate(bidir(twoCliques), Analytics.LpaRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Seq(1L, 2L, 3L, 4L).map(_ -> 1L).toMap ++
               Seq(11L, 12L, 13L, 14L).map(_ -> 11L).toMap
    assert(got == want, s"got $got")
  }

  test("LPA: a single edge 2-cycles — even round counts return identity (the fixed-round contract)") {
    val pair = bidir(Seq((1L, 2L)))
    val even = Analytics.labelPropagate(pair, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(even == Map(1L -> 1L, 2L -> 2L), s"even rounds: $even")
    val odd = Analytics.labelPropagate(pair, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(odd == Map(1L -> 2L, 2L -> 1L), s"odd rounds: $odd")
  }

  test("LPA: min-label tie rule — an isolated triangle lands on its smallest id") {
    val got = Analytics.labelPropagate(
        bidir(Seq((7L, 8L), (7L, 9L), (8L, 9L))), Analytics.LpaRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 8L -> 7L, 9L -> 7L), s"got $got")
  }

  test("modularity: bridged cliques score the hand-computed Newman-Girvan contributions") {
    // m = 13 edges; each community: 6 internal edges, degree sum
    // 3·3 + 4 = 13 → q = 6/13 − (13/26)² = 0.2115384…, fround6
    val got = Analytics.modularityOf(twoCliques.toDF("a", "b"), Analytics.LpaRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == Seq((1L, 4L, 6L, 13L, 0.211538), (11L, 4L, 6L, 13L, 0.211538)),
      s"got $got")
  }

  test("neighbor Jaccard: planted triangle + pendant + isolated edge") {
    // triangle {1,2,3}, pendant 4 on 1, isolated edge (5,6):
    // degrees d1=3 d2=d3=2 d4=1 d5=d6=1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L)).toDF("a", "b")
    val got = Analytics.neighborJaccard(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Set(
      (1L, 2L, 1L, 0.5),  // common {3}; union {2,3}∪{1,3} \ pair = {3,4}∪{3} = 2
      (1L, 3L, 1L, 0.5),
      (2L, 3L, 1L, 1.0),  // N(2)\{3} = N(3)\{2} = {1}
      (1L, 4L, 0L, 0.0),  // pendant: no shared neighbor
      (5L, 6L, 0L, 0.0))  // isolated edge: empty union → defined 0
    assert(got == want, s"got $got")
  }
}
