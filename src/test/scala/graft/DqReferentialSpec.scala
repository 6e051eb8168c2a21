package graft

/** FK referential audit (dq_referential): the oracle pins values; this
  * pins the planted-corruption accounting against independent counts. */
class DqReferentialSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("dq_referential")(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap

  test("the planted edge reports exactly the corrupted rows, others audit clean") {
    val o = Tables.orders(spark, sf001)
    val planted = o.where(org.apache.spark.sql.functions.col("o_orderkey") % 13 === 0).count()
    val (nChild, nOrphans, nMissing, ok) = rows("orders.o_custkey->customer")
    assert(nChild == o.count() && nOrphans == planted && !ok, rows)
    assert(nMissing > 0 && nMissing <= nOrphans)
    for (e <- Seq("lineitem.l_partkey->part", "lineitem.l_suppkey->supplier")) {
      val (_, orphans, missing, okc) = rows(e)
      assert(orphans == 0L && missing == 0L && okc, s"$e: ${rows(e)}")
    }
  }
}
