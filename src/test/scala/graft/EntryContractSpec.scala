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

  test("SURVEY.md's shipping count matches the code (the r10 drift gate, executable)") {
    // "Round-N total shipping: **Q queries, M oracle-checked**" must
    // track SparkEntry exactly — the count drifted twice before this
    // test existed (VERDICT r10 #7)
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val ms = """total shipping: \*\*(\d+) queries, (\d+) oracle-checked\*\*""".r
      .findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty, "SURVEY.md shipping-count line not found")
    val m = ms.last // earlier rounds' lines stay as history; the last is current
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"SURVEY says ${m.group(1)} queries, code ships ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"SURVEY says ${m.group(2)} oracle-checked, code ships ${SparkEntry.oracleSql.size}")
  }

  test("every oracle statement ends in a total ORDER BY (determinism rule §2.6)") {
    val bad = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      sql.toUpperCase.contains("ORDER BY")
    }.keySet
    assert(bad.isEmpty, s"oracles without ORDER BY: $bad")
  }
}
