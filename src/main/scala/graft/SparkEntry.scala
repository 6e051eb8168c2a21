package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7 (build plan). Each operator group lives in its own object; this is
  * the single aggregation point the driver calls.
  */
object SparkEntry {

  /** Flagship query on sf0.001 (driver smoke-checks rows > 0):
    * the TPC-H-Q1-shaped hash aggregate. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregations.queries("agg_hash_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Scans.queries ++
    operators.Projections.queries ++
    operators.Joins.queries ++
    operators.Relational.queries ++
    operators.Aggregations.queries ++
    operators.Windows.queries ++
    operators.SortSetOps.queries ++
    operators.Ragged.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.Vectors.queries ++
    operators.TextOps.queries ++
    operators.Multimodal.queries ++
    operators.Analytics.queries ++
    functions.ScalarFns.queries ++
    functions.Udfs.queries ++
    streaming.Streams.queries

  /** DuckDB oracle SQL per query key (omitted for non-SQL-expressible /
    * engine-hash-specific ops, which are unit- and property-tested). */
  def oracleSql: Map[String, String] =
    operators.Scans.oracle ++
    operators.Projections.oracle ++
    operators.Joins.oracle ++
    operators.Relational.oracle ++
    operators.Aggregations.oracle ++
    operators.Windows.oracle ++
    operators.SortSetOps.oracle ++
    operators.Ragged.oracle ++
    operators.Dedup.oracle ++
    operators.Similarity.oracle ++
    operators.Vectors.oracle ++
    operators.TextOps.oracle ++
    operators.Multimodal.oracle ++
    operators.Analytics.oracle ++
    functions.ScalarFns.oracle ++
    functions.Udfs.oracle ++
    streaming.Streams.oracle
}
