package graft

import graft.operators.TextOps

/** Competence-based curriculum staging (sample_curriculum): the oracle
  * pins exact cohort manifests; these pin the two structural
  * guarantees any pacing consumer relies on. */
class CurriculumSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("sample_curriculum")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getDouble(3), r.getDouble(4)))

  test("stages are difficulty-ordered within every language") {
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byStage = rs.sortBy(_._2)
      byStage.sliding(2).foreach {
        case Array((_, s1, _, _, max1), (_, s2, _, min2, _)) =>
          assert(s1 < s2 && max1 <= min2, s"$lang: stage $s1 max=$max1 vs stage $s2 min=$min2")
        case _ =>
      }
    }
  }

  test("cohort sizes follow the root pacing within rounding slack") {
    val S = TextOps.CurriculumStages
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.map(_._3).sum.toDouble
      (1 to S).foreach { s =>
        val want = (math.sqrt(s.toDouble / S) - math.sqrt((s - 1).toDouble / S)) * n
        val got = rs.find(_._2 == s).map(_._3.toDouble).getOrElse(0.0)
        assert(math.abs(got - want) <= math.max(3.0, 0.15 * n),
          s"$lang stage $s: got $got expected ~$want of $n")
      }
    }
  }
}
