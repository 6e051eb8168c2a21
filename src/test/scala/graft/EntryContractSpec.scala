package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: `SparkEntry.queries` is built
  * by ++ over per-family maps, which would silently DROP a query if
  * two families ever declared the same key; oracle keys must reference
  * real queries or the driver records a phantom failure. Pure-JVM,
  * runs in milliseconds. */
class EntryContractSpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _])] = Seq(
    "Scans" -> operators.Scans.queries,
    "Projections" -> operators.Projections.queries,
    "Joins" -> operators.Joins.queries,
    "Relational" -> operators.Relational.queries,
    "Aggregations" -> operators.Aggregations.queries,
    "Windows" -> operators.Windows.queries,
    "SortSetOps" -> operators.SortSetOps.queries,
    "Ragged" -> operators.Ragged.queries,
    "Dedup" -> operators.Dedup.queries,
    "Similarity" -> operators.Similarity.queries,
    "Vectors" -> operators.Vectors.queries,
    "TextOps" -> operators.TextOps.queries,
    "Multimodal" -> operators.Multimodal.queries,
    "Analytics" -> operators.Analytics.queries,
    "ScalarFns" -> functions.ScalarFns.queries,
    "Udfs" -> functions.Udfs.queries,
    "Streams" -> streaming.Streams.queries)

  test("no query key is declared by two families (++ would silently drop one)") {
    val all = families.flatMap { case (fam, m) => m.keys.map(_ -> fam) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate keys: ${dups.map { case (k, fs) => s"$k in ${fs.map(_._2)}" }}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key references a shipped query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every oracle statement ends in a total ORDER BY (determinism rule §2.6)") {
    val bad = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      sql.toUpperCase.contains("ORDER BY")
    }.keySet
    assert(bad.isEmpty, s"oracles without ORDER BY: $bad")
  }
}
