package graft

import graft.operators.Aggregations

/** Market-concentration index (agg_hhi): the oracle replays the
  * fixture; these pin the scale's two analytic anchors. */
class HhiSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)]) =
    Aggregations.hhiOf(rows.toDF("n_name", "s_suppkey", "rev")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap

  test("monopoly scores 10000; a uniform 4-way split scores 2500") {
    val out = run(Seq(
      ("MONO", 1L, 500.0),
      ("QUAD", 1L, 25.0), ("QUAD", 2L, 25.0),
      ("QUAD", 3L, 25.0), ("QUAD", 4L, 25.0)))
    assert(out("MONO") == ((1L, 10000.0, 100.0)))
    assert(out("QUAD") == ((4L, 2500.0, 25.0)))
  }

  test("fixture query: HHI bounded by (10000/n, 10000] and top share consistent") {
    val out = SparkEntry.queries("agg_hhi")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(hhi >= 10000.0 / n - 1e-6 && hhi <= 10000.0 + 1e-6,
        s"${r.getString(0)}: hhi=$hhi n=$n")
      // top share² is one of the summed terms
      assert(top * top <= hhi + 1e-6)
    }
  }
}
