package graft.operators

import graft.Tables._
import org.apache.spark.sql.functions._

/** Scan / source / sink operators (reference analog: i3cols save/load of
  * `.npy` column dirs and category-index grouped slicing — SURVEY.md §2.1
  * R5/R6/R7). Spark-first: lazy parquet scans with column pruning and
  * predicate pushdown; partitioned writes give the category-index O(1)
  * grouped-slice capability via partition pruning.
  */
object Scans {

  val queries: Map[String, Q] = Map(
    // Full scan, stable projection, total order. At scale: a pure
    // range-partitioned sort of the projected columns only (ReadSchema is
    // pruned to 4 of 11 columns).
    "scan_parquet" -> ((s, dir) =>
      lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    // Column pruning + predicate pushdown: filter must reach the parquet
    // scan (PushedFilters on l_shipdate), pruning row groups by min/max.
    "scan_pruned_filtered" -> ((s, dir) =>
      lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
                r2(col("l_extendedprice")).as("price"))
        .orderBy("l_orderkey", "l_linenumber")),

    // i3cols R5 analog: write columns out, read them back, aggregate.
    // The roundtrip must preserve values exactly (columnar fidelity).
    "sink_roundtrip" -> ((s, dir) => {
      val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_roundtrip"
      lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy("l_returnflag")
        .agg(big(count(lit(1))).as("n"), r2(sum("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // i3cols R6/R7 analog: category-index build = partitionBy on write;
    // index application = partition-pruned read of one category dir.
    "scan_partitioned_write" -> ((s, dir) => {
      val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_partitioned"
      lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
      s.read.parquet(out)
        .where(col("l_returnflag") === "R") // partition-pruned: reads one dir
        .groupBy("l_returnflag")
        .agg(big(count(lit(1))).as("n"), r2(sum("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_pruned_filtered" ->
      ("SELECT l_orderkey, l_linenumber, l_shipdate, ROUND(l_extendedprice, 2) AS price FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' " +
       "ORDER BY l_orderkey, l_linenumber"),
    "sink_roundtrip" ->
      ("SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "scan_partitioned_write" ->
      ("SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty " +
       "FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag ORDER BY l_returnflag")
  )
}
