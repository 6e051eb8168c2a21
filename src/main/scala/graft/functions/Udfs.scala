package graft.functions

import graft.Tables._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined function surface: scalar UDF, typed Aggregator UDAF, and
  * the generator (UDTF) extension point.
  *
  * Scale note: a Scala UDF is a codegen black box — Catalyst cannot push
  * filters through it or prune columns it touches, so UDFs are kept out
  * of scan-adjacent positions. The typed Aggregator is the right
  * extension point for custom aggregation state: it gets partial
  * aggregation (map-side combine) and shuffle-merge for free, which is
  * what makes it viable at 100 TB.
  */
object Udfs {

  /** (weighted sum, weight sum) running state for a weighted mean. */
  case class WSum(s: Double, w: Double)

  /** Discount-weighted mean price — the i3cols charge-weighted-mean
    * analog (SURVEY.md §2.1 R8) as a mergeable distributed aggregate. */
  val weightedMean: Aggregator[(Double, Double), WSum, Double] =
    new Aggregator[(Double, Double), WSum, Double] {
      def zero: WSum = WSum(0.0, 0.0)
      def reduce(b: WSum, a: (Double, Double)): WSum = WSum(b.s + a._1 * a._2, b.w + a._2)
      def merge(b1: WSum, b2: WSum): WSum = WSum(b1.s + b2.s, b1.w + b2.w)
      def finish(r: WSum): Double = if (r.w == 0.0) Double.NaN else r.s / r.w
      def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val queries: Map[String, Q] = Map(
    // Pure scalar UDF (price-band labelling).
    "udf_scalar" -> ((s, dir) => {
      val band = udf((d: Double) =>
        if (d < 50000) "low" else if (d < 150000) "mid" else "high")
      orders(s, dir)
        .select(col("o_orderkey"), band(col("o_totalprice")).as("band"),
                r2(col("o_totalprice")).as("total"))
        .orderBy("o_orderkey")
    }),

    // Typed Aggregator registered as an untyped UDAF column.
    "udaf_weighted_mean" -> ((s, dir) => {
      val wm = udaf(weightedMean)
      lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(fround(wm(col("l_extendedprice"), col("l_discount")), 4).as("disc_weighted_price"),
             big(count(lit(1))).as("n"))
        .orderBy("l_returnflag")
    }),

    // Generator/UDTF surface: per-order date spine via the CUSTOM
    // Catalyst Generator (graft.functions.DateSpineGen) — the oracle is
    // the same SQL that checked the built-in explode(sequence()) form,
    // so the hash match proves the extension point end-to-end.
    "udtf_generate" -> ((s, dir) =>
      orders(s, dir)
        .where(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
                DateSpineGen(
                  to_date(col("o_orderdate")),
                  date_add(to_date(col("o_orderdate")), 3)).as("d"))
        .orderBy("o_orderkey", "d"))
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice < 50000 THEN 'low' " +
       "WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS band, " +
       "ROUND(o_totalprice, 2) AS total FROM orders ORDER BY o_orderkey"),
    "udaf_weighted_mean" ->
      ("SELECT l_returnflag, " +
       froundSql("SUM(l_extendedprice * l_discount) / SUM(l_discount)", 4) +
       " AS disc_weighted_price, " +
       "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem " +
       "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "udtf_generate" ->
      ("SELECT o_orderkey, CAST(gs.d AS DATE) AS d FROM orders, " +
       "LATERAL (SELECT UNNEST(GENERATE_SERIES(CAST(o_orderdate AS DATE), CAST(o_orderdate AS DATE) + 3, INTERVAL 1 DAY)) AS d) gs " +
       "WHERE o_orderkey <= 200 ORDER BY o_orderkey, d")
  )
}
