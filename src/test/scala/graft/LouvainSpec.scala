package graft

import graft.operators.Analytics

/** One synchronous Louvain round (graph_louvain): the oracle replays
  * the identical rule; this hand-traces a two-clique-plus-bridge graph
  * through the move rule and pins every report field. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  test("two 4-cliques with a bridge: moves, contraction and Q match the hand trace") {
    // cliques {1,2,3,4} and {5,6,7,8}, bridge (4,5); m = 13
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (4L, 5L)).toDF("a", "b")
    val r = Analytics.louvainRound(edges).collect()(0)
    assert(r.getLong(0) == 8L && r.getLong(1) == 13L)
    // hand trace (min-degree neighbor, ties by id):
    // 1→{2}, 2→{1}, 3→{1}, 4→{1}; 5→{6}, 6→{7}, 7→{6}, 8→{6}
    // → 4 communities {2},{1:{2,3,4}} plus the mirror in the B clique
    assert(r.getLong(2) == 4L, r.toString)
    // cross-community super edges: (1,2), (1,6), (6,7)
    assert(r.getLong(3) == 3L, r.toString)
    // Q_singleton = -(6·9 + 2·16)/(4·13²); Q_after = (4·13·6 − 218)/(4·13²)
    assert(r.getDouble(4) == Tables.round6(-86.0 / 676.0), r.toString)
    assert(r.getDouble(5) == Tables.round6(94.0 / 676.0), r.toString)
    assert(r.getDouble(5) > r.getDouble(4), "one round must improve modularity here")
  }

  test("an edgeless-gain graph (star) stays put only when no move gains") {
    // star center 1 with leaves 2..6: m=5, k_c=5, k_leaf=1;
    // leaf→center gain: 5·1 < 10 ✓ (moves); center→leaf: 5·1 < 10 ✓
    // center moves to leaf 2; all leaves move to the center's label 1
    val edges = (2L to 6L).map(l => (1L, l)).toDF("a", "b")
    val r = Analytics.louvainRound(edges).collect()(0)
    // labels: 1→2, leaves→1 ⇒ communities {2:{1}, 1:{2..6}}
    assert(r.getLong(2) == 2L, r.toString)
    // every star edge crosses (center in {2}, leaves in {1}) except none internal
    assert(r.getLong(3) == 1L, r.toString)
  }
}
