package graft

/** Role-based masking policy (dq_column_masking): the oracle replays
  * the masks; these pin the mask-class properties. */
class DqMaskingSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("dq_column_masking")(spark, sf001).collect()

  test("pseudonymization is deterministic, distinct, and irreversible-shaped") {
    val analyst = out.filter(_.getString(0) == "analyst")
    val admin = out.filter(_.getString(0) == "admin")
    assert(analyst.length == 10 && admin.length == 10)
    val tokens = analyst.map(_.getString(2))
    assert(tokens.forall(_.startsWith("anon-")))
    assert(tokens.distinct.length == tokens.length) // joinability preserved
    assert(tokens.forall(t => !admin.exists(_.getString(2) == t)))
  }

  test("generalization bands to 500s; admin rows pass through unmodified") {
    val byKey = out.groupBy(_.getLong(1))
    byKey.values.foreach { rows =>
      val a = rows.find(_.getString(0) == "admin").get
      val m = rows.find(_.getString(0) == "analyst").get
      val band = m.getDouble(3)
      assert(band % 500 == 0.0, s"band $band")
      assert(band <= a.getDouble(3) && a.getDouble(3) < band + 500)
      assert(a.getString(4) == m.getString(4)) // segment unmasked
    }
  }
}
