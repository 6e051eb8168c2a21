package graft

import graft.operators.Dedup

/** Drives the PageRank lineage hatch for REAL (VERDICT r9 #5: at the
  * shipped 2 rounds the `i % PageRankCheckpointEvery == 0` branch had
  * never executed): 10 rounds on a planted hub-and-ring graph fire the
  * localCheckpoint at round 8, and the result must equal an unhatched
  * 10-round run bit-for-bit — per-round fround6 (the Lloyd/PQ
  * discipline) makes both runs deterministic, so lineage truncation
  * can only change the PLAN, never a value. */
class DeepPageRankSpec extends SparkSpec {
  import spark.implicits._

  test("10-round PageRank through the localCheckpoint hatch equals the unhatched run") {
    // hub 0 connected to every ring node 1..10; ring closed; both
    // directions passed (the graph_pagerank edge convention)
    val undirected = (1L to 10L).map(i => (i, i % 10 + 1)) ++
      (1L to 10L).map(i => (0L, i))
    val edges = (undirected ++ undirected.map(_.swap)).toDF("u", "v")

    val hatched = Dedup.pageRankRounds(edges, 10).orderBy("node")
    // non-vacuous: the checkpoint truncated lineage — the final plan
    // builds on a LogicalRDD scan, not a 10-round join tree
    assert(hatched.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "hatch did not fire: no LogicalRDD in the analyzed plan")
    val plain = Dedup.pageRankRounds(edges, 10, checkpointEvery = 0).orderBy("node")
    assert(!plain.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "control run must NOT checkpoint")

    val a = hatched.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.length == 11 && a.sameElements(b),
      s"hatched run diverged from unhatched:\n${a.toSeq}\nvs\n${b.toSeq}")
    // algorithm sanity on the planted shape: the hub dominates
    val top = a.maxBy(_._3)
    assert(top._1 == 0L && top._2 == 10L,
      s"hub must carry the top rank, got $top")
  }

  test("personalized PageRank concentrates mass near the seed; disconnected mass is zero") {
    // two components: hub-and-ring 0..10 (seed lives here: min node
    // 0), and a far 3-clique 100..102 the teleport must never reach
    val near = (1L to 10L).map(i => (i, i % 10 + 1)) ++ (1L to 10L).map(i => (0L, i))
    val far = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val und = near ++ far
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val r = Dedup.pprRounds(edges, 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // seed's own score dominates (restart mass returns every round)
    assert(r(0L) == r.values.max, s"seed must top the ranking: $r")
    // the disconnected clique gets exactly zero — no uniform teleport
    Seq(100L, 101L, 102L).foreach(n => assert(r(n) == 0.0, s"node $n leaked mass"))
    // ring nodes (seed's neighbors) all score equal and positive
    val ring = (1L to 10L).map(r)
    assert(ring.forall(_ > 0.0) && ring.distinct.size == 1, ring.toString)
  }
}
