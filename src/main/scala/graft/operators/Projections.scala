package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._

/** Projection / filter operators (reference analog: i3cols vectorized
  * per-event transforms, SURVEY.md §2.1 R9). All expressions stay inside
  * whole-stage codegen; filters compile to pushed parquet predicates.
  */
object Projections {

  /** Typed view of the orders table — the Dataset[T] API edge
    * (SURVEY.md §1.2: typed at edges, Catalyst-optimizable DataFrame in
    * the core). */
  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                      o_totalprice: Double)

  val queries: Map[String, Q] = Map(
    // Typed Dataset surface: case-class Encoder + column-expression
    // filters. Filters stay Column-based (not closures) so pushdown and
    // pruning survive the typed boundary — the plan is identical to the
    // untyped form, which is the point of doing typed-at-the-edges.
    "typed_dataset" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .as[OrderRow]
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000)
        .map(o => (o.o_orderkey, o.o_custkey, math.floor(o.o_totalprice / 1000).toLong))
        .toDF("o_orderkey", "o_custkey", "price_k")
        .orderBy("o_orderkey")
    }),
    // Derived-column arithmetic — the classic TPC-H revenue expression.
    "project_arith" -> ((s, dir) =>
      lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          fround(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("gross"),
          fround(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("disc_price"),
          fround(col("l_quantity") * col("l_discount"), 4).as("qty_disc"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Boolean algebra + BETWEEN + IN + LIKE + null-safe equality.
    "filter_complex" -> ((s, dir) =>
      orders(s, dir)
        .where(
          (col("o_orderstatus").isin("F", "O") &&
           col("o_totalprice").between(50000, 200000) &&
           col("o_orderpriority").like("1-%")) ||
          (!col("o_orderstatus").isin("P") &&
           col("o_orderpriority") <=> "5-LOW" &&
           col("o_totalprice") < 30000))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
                r2(col("o_totalprice")).as("total"), col("o_orderpriority"))
        .orderBy("o_orderkey")),

    // CASE WHEN price bands + coalesce + nullif.
    "project_case" -> ((s, dir) =>
      orders(s, dir)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("status_c"),
          nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")).as("pri_n"))
        .orderBy("o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
    "typed_dataset" ->
      ("SELECT o_orderkey, o_custkey, CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k " +
       "FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000 " +
       "ORDER BY o_orderkey"),
    "project_arith" ->
      ("SELECT l_orderkey, l_linenumber, " +
       s"${froundSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)} AS gross, " +
       s"${froundSql("l_extendedprice * (1 - l_discount)", 2)} AS disc_price, " +
       s"${froundSql("l_quantity * l_discount", 4)} AS qty_disc " +
       "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "filter_complex" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS total, o_orderpriority " +
       "FROM orders WHERE (o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 50000 AND 200000 " +
       "AND o_orderpriority LIKE '1-%') OR (o_orderstatus NOT IN ('P') " +
       "AND o_orderpriority IS NOT DISTINCT FROM '5-LOW' AND o_totalprice < 30000) " +
       "ORDER BY o_orderkey"),
    "project_case" ->
      ("SELECT o_orderkey, " +
       "CASE WHEN o_totalprice < 50000 THEN 'low' WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS band, " +
       "COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_c, " +
       "NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS pri_n " +
       "FROM orders ORDER BY o_orderkey")
  )
}
