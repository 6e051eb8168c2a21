package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._

/** Ragged / jagged-array operators — the i3cols signature moves
  * (SURVEY.md §1.1, §2.1 R3/R6/R8): the reference stores variable-length
  * per-event data as a flat array + offsets (`data.npy` + `index.npy`);
  * Spark's ArrayType over Parquet uses the *same* offsets encoding, so
  * pack = collect_list, explode = posexplode, and per-event reductions
  * run as higher-order functions over the packed array — row-local, no
  * shuffle after the pack, fully codegen'd.
  * Fixture mapping: order = event, lineitem = pulse.
  */
object Ragged {

  val queries: Map[String, Q] = Map(
    // Pack pulses per event, sorted by pulse ordinal; emit scalar
    // reductions of the packed array (hash-stable projection).
    "ragged_pack" -> ((s, dir) =>
      lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity"),
                                            col("l_extendedprice")))).as("pulses"))
        .select(
          col("l_orderkey"),
          big(size(col("pulses"))).as("n"),
          col("pulses").getItem(0).getField("l_linenumber").as("first_ln"),
          element_at(col("pulses"), -1).getField("l_linenumber").as("last_ln"),
          r2(aggregate(col("pulses"), lit(0.0),
                       (acc, x) => acc + x.getField("l_quantity"))).as("qty_sum"))
        .orderBy("l_orderkey")),

    // Inverse: explode with position — index.npy ordinal semantics.
    "ragged_explode" -> ((s, dir) =>
      lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
        .select(col("l_orderkey"), posexplode(col("lns")).as(Seq("pos", "l_linenumber")))
        .orderBy("l_orderkey", "pos")),

    // Per-event reduction WITHOUT re-shuffle: charge-weighted mean via a
    // higher-order aggregate over the packed array. The accumulator is
    // DECIMAL so the reduction is exact and order-independent (double
    // accumulation would diverge from the oracle at structural .xxx5
    // midpoints of the cents arithmetic); one final double division.
    "ragged_reduce_hof" -> ((s, dir) =>
      lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_quantity"), col("l_extendedprice"))).as("pulses"))
        .select(
          col("l_orderkey"),
          fround(aggregate(
            col("pulses"),
            struct(lit(0).cast("decimal(24,6)").as("s"), lit(0).cast("decimal(18,2)").as("w")),
            (acc, x) => struct(
              (acc.getField("s") +
                x.getField("l_extendedprice").cast("decimal(18,2)") *
                x.getField("l_quantity").cast("decimal(18,2)")).cast("decimal(24,6)").as("s"),
              (acc.getField("w") + x.getField("l_quantity").cast("decimal(18,2)"))
                .cast("decimal(18,2)").as("w")),
            acc => acc.getField("s").cast("double") / acc.getField("w").cast("double")), 4)
            .as("qty_weighted_price"))
        .orderBy("l_orderkey")),

    // Category-index analog (i3cols R6): per-category member count,
    // bounds, and a deterministic sorted sample — the (cat, start, stop)
    // grouped-access capability as aggregates + partition pruning.
    "categ_index" -> ((s, dir) =>
      customer(s, dir)
        .groupBy("c_nationkey")
        .agg(big(count(lit(1))).as("n_members"),
             min(col("c_custkey")).as("min_key"),
             max(col("c_custkey")).as("max_key"),
             array_join(transform(slice(sort_array(collect_list(col("c_custkey"))), 1, 5),
                                  _.cast("string")), ",").as("sample5"))
        .orderBy("c_nationkey")),

    // Positional alignment of two ragged columns (the reference's
    // charge×flag pulse-series move, i3cols R3/R8): pack ONCE as a
    // struct array sorted by linenumber — both fields inherit the same
    // offsets by construction — then project the parallel arrays and
    // zip_with them row-locally. The decimal fold makes the per-event
    // reduction order-independent, so the zipped result is oracle-
    // exact. One pack shuffle; alignment itself never shuffles.
    "ragged_zip" -> ((s, dir) => {
      val packed = lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(struct(
          col("l_linenumber"), col("l_quantity"), col("l_discount")))).as("xs"))
        .select(col("l_orderkey"),
          transform(col("xs"), x => x.getField("l_quantity")).as("qtys"),
          transform(col("xs"), x => x.getField("l_discount")).as("discs"))
      packed.select(col("l_orderkey"),
          big(size(col("qtys"))).as("n_items"),
          aggregate(
            zip_with(col("qtys"), col("discs"), (q, d) => q * (lit(1) - d)),
            lit(0).cast("decimal(24,6)"),
            (acc, x) => (acc + x.cast("decimal(24,6)")).cast("decimal(24,6)"))
            .cast("double").as("eff_qty"))
        .orderBy("l_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "ragged_pack" ->
      ("SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n, " +
       "MIN(l_linenumber) AS first_ln, MAX(l_linenumber) AS last_ln, " +
       "ROUND(SUM(l_quantity), 2) AS qty_sum " +
       "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"),
    "ragged_explode" ->
      ("SELECT l_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS INT) AS pos, " +
       "l_linenumber FROM lineitem ORDER BY l_orderkey, pos"),
    "ragged_reduce_hof" ->
      ("SELECT l_orderkey, " +
       froundSql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) " +
                 "/ CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)", 4) +
       " AS qty_weighted_price " +
       "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"),
    "categ_index" ->
      ("SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_members, " +
       "MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key, " +
       "ARRAY_TO_STRING(LIST_TRANSFORM((LIST(c_custkey ORDER BY c_custkey))[1:5], x -> CAST(x AS VARCHAR)), ',') AS sample5 " +
       "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"),
    "ragged_zip" ->
      ("SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items, " +
       dsum6Sql("l_quantity * (1 - l_discount)") + " AS eff_qty " +
       "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey")
  )
}
