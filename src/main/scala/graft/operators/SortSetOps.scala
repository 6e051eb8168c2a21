package graft.operators

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / limit / top-k and set operations (reference analog: i3cols
  * offset-aware concat = union, SURVEY.md §2.1 R4; sort-by-time).
  * Global sorts are range-partitioned samples (scales linearly); global
  * top-k compiles to TakeOrderedAndProject (per-partition heap + tiny
  * driver merge — no global sort at all). Per-group top-k is one window
  * shuffle, never a self-join.
  */
object SortSetOps {

  val queries: Map[String, Q] = Map(
    // Multi-column sort with an explicitly null-producing key and
    // explicit null placement (Spark and DuckDB disagree on defaults).
    "sort_multi_nulls" -> ((s, dir) =>
      orders(s, dir)
        .select(col("o_orderkey"),
                nullif(col("o_orderpriority"), lit("5-LOW")).as("pri"),
                r2(col("o_totalprice")).as("total"))
        .orderBy(col("pri").asc_nulls_last, col("total").desc, col("o_orderkey"))),

    // Global top-k: TakeOrderedAndProject, not a full sort.
    "topk_global" -> ((s, dir) =>
      orders(s, dir)
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(25)),

    // Per-group top-k via ranked window.
    "topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), r2(col("o_totalprice")).as("total"),
                big(row_number().over(w)).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // Per-group top-k as a CUSTOM WHOLE OPERATOR (logical node +
    // planner strategy + two-stage physical exec with map-side
    // k-bounded heaps). Spark's WindowGroupLimit already bounds the
    // window plan's shuffle; the custom exec further drops both full
    // partition sorts and the Window itself (O(n log k) vs
    // O(n log n)). Same rows as topk_per_group (deterministic
    // tie-break) — the oracle proves the custom operator exact.
    "topk_per_group_native" -> ((s, dir) => {
      val o = orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice")
      graft.plans.TopKPerGroup(o, Seq("o_custkey"), "o_totalprice", 3,
          descending = true, tieCols = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("o_custkey"), col("total").desc, col("o_orderkey"))
    }),

    // Keyset-stable pagination: OFFSET+LIMIT over a total order. At
    // scale the offset still evaluates the full prefix — the scan
    // remains a top-(offset+limit) heap, so keep offsets shallow and
    // use keyset (WHERE key > last_seen) pagination for deep pages.
    "sort_paginate" -> ((s, dir) =>
      orders(s, dir)
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .offset(100).limit(20)),

    // PARETO FRONTIER (2-D skyline) per brand: the parts no other
    // same-brand part beats on BOTH price (lower better) and size
    // (higher better) — the multi-objective shortlist primitive
    // (cheapest-per-capability curve). Never the quadratic dominance
    // join: collapsing to per-(brand, price) maxima first makes
    // prices unique within a brand, so the frontier is exactly the
    // strictly-increasing-size prefix — one running-max window over
    // the strictly-preceding frame decides survival. Scale shape:
    // the window runs over the AGGREGATED (brand × distinct-price)
    // domain — bounded by the price grid, not the corpus — after one
    // hash-agg pass; the oracle is the independent NOT-EXISTS
    // dominance formulation over the same candidate set.
    "topk_pareto_frontier" -> ((s, dir) =>
      paretoFrontier(part(s, dir).select(
          col("p_brand").as("grp"), col("p_retailprice").as("price"),
          col("p_size").cast("long").as("sz")))
        .select(col("grp").as("brand"), r2(col("price")).as("price"),
                col("max_size"))
        .orderBy("brand", "price")),

    // UNION ALL of two time slices, re-aggregated — the i3cols
    // combine-runs analog: union is plan-level only, no shuffle of its own.
    "set_union_all" -> ((s, dir) => {
      val ev = events(s, dir)
      val a = ev.where(dayofmonth(col("ts")).between(1, 10))
      val b = ev.where(dayofmonth(col("ts")).between(11, 20))
      a.unionByName(b)
        .groupBy("event_type")
        .agg(big(count(lit(1))).as("n"), r2(sum(col("value"))).as("val_sum"))
        .orderBy("event_type")
    }),

    "set_union_distinct" -> ((s, dir) => {
      val urgent = orders(s, dir).where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val rich = orders(s, dir).where(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      urgent.union(rich).distinct().orderBy("custkey")
    }),

    "set_intersect" -> ((s, dir) => {
      val urgent = orders(s, dir).where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val rich = orders(s, dir).where(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      urgent.intersect(rich).orderBy("custkey")
    }),

    "set_except" -> ((s, dir) => {
      val all = customer(s, dir).select(col("c_custkey").as("custkey"))
      val buyers = orders(s, dir).select(col("o_custkey").as("custkey"))
      all.except(buyers).orderBy("custkey")
    })
  )

  /** 2-D skyline over (grp, price↓-better, sz↑-better) points —
    * exposed for ParetoSpec's planted dominance cases. Collapsing to
    * per-(grp, price) maxima makes prices unique within a group, so
    * the frontier is exactly the rows whose size strictly exceeds the
    * running max over all strictly-cheaper candidates: one hash-agg +
    * one bounded window, never the quadratic dominance join. */
  def paretoFrontier(points: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cand = points.groupBy("grp", "price").agg(big(max(col("sz"))).as("max_size"))
    val w = Window.partitionBy("grp").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("m", max(col("max_size")).over(w))
      .where(col("m").isNull || col("m") < col("max_size"))
      .drop("m")
  }

  val oracle: Map[String, String] = Map(
    "sort_multi_nulls" ->
      ("SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS pri, ROUND(o_totalprice, 2) AS total " +
       "FROM orders ORDER BY pri ASC NULLS LAST, total DESC, o_orderkey"),
    "topk_global" ->
      ("SELECT o_orderkey, ROUND(o_totalprice, 2) AS total FROM orders " +
       "ORDER BY total DESC, o_orderkey LIMIT 25"),
    "topk_per_group" ->
      ("SELECT * FROM (SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total, " +
       "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn " +
       "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "topk_per_group_native" ->
      ("SELECT o_custkey, o_orderkey, total FROM " +
       "(SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total, " +
       "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
       "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, total DESC, o_orderkey"),
    "sort_paginate" ->
      ("SELECT o_orderkey, ROUND(o_totalprice, 2) AS total FROM orders " +
       "ORDER BY total DESC, o_orderkey LIMIT 20 OFFSET 100"),
    // independent dominance formulation: NOT EXISTS over the same
    // per-(brand, price) candidate maxima
    "topk_pareto_frontier" ->
      ("WITH cand AS (SELECT p_brand, p_retailprice AS price, " +
       "CAST(MAX(p_size) AS BIGINT) AS max_size FROM part GROUP BY 1, 2) " +
       "SELECT p_brand AS brand, ROUND(price, 2) AS price, max_size " +
       "FROM cand c WHERE NOT EXISTS (" +
       "SELECT 1 FROM cand o WHERE o.p_brand = c.p_brand " +
       "AND o.price <= c.price AND o.max_size >= c.max_size " +
       "AND (o.price < c.price OR o.max_size > c.max_size)) " +
       "ORDER BY brand, price"),
    "set_union_all" ->
      ("SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS val_sum FROM (" +
       "SELECT * FROM events WHERE EXTRACT(day FROM ts) BETWEEN 1 AND 10 " +
       "UNION ALL SELECT * FROM events WHERE EXTRACT(day FROM ts) BETWEEN 11 AND 20" +
       ") GROUP BY event_type ORDER BY event_type"),
    "set_union_distinct" ->
      ("SELECT custkey FROM (" +
       "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "UNION SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000" +
       ") ORDER BY custkey"),
    "set_intersect" ->
      ("SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "INTERSECT SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000 " +
       "ORDER BY custkey"),
    "set_except" ->
      ("SELECT c_custkey AS custkey FROM customer " +
       "EXCEPT SELECT o_custkey AS custkey FROM orders ORDER BY custkey")
  )
}
