package graft

import org.apache.spark.sql.functions._

/** DSIR importance resampling (text_dsir): the oracle pins exact
  * values on the shipped fixture; these plant a corpus with a SEPARABLE
  * target vocabulary and assert the selection semantics — documents
  * written in the target slice's vocabulary must outweigh documents
  * written off-vocabulary, regardless of which slice they sit in. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // doc_id % DsirTargetMod == 0 rows are the target slice. Target
  // vocabulary = "alpha beta gamma ..."; off-vocabulary = "zork quux
  // ...". Docs 0/7/14 define the target distribution; 1 and 2 are
  // in-vocabulary raw docs, 3 and 4 are off-vocabulary raw docs.
  private val tgtText = "alpha beta gamma delta alpha beta gamma delta"
  private val offText = "zork quux blarg wibble zork quux blarg wibble"
  private lazy val planted = Seq(
    (0L, "en", tgtText), (7L, "en", tgtText), (14L, "en", tgtText),
    // vary in-vocabulary doc lengths so exactly one doc (the double-
    // length pure-target doc 1) sits strictly above the quantile cut
    (1L, "en", tgtText + " " + tgtText), (2L, "en", "alpha beta gamma delta"),
    (3L, "en", offText), (4L, "en", offText),
    (5L, "en", "alpha beta zork quux alpha beta zork quux")
  ).toDF("doc_id", "lang", "text")

  private lazy val rows = operators.TextOps.dsirSelect(planted)
    .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4))).toMap

  test("in-target-vocabulary docs outweigh off-vocabulary docs") {
    val inW = Seq(1L, 2L).map(rows(_)._1)
    val offW = Seq(3L, 4L).map(rows(_)._1)
    assert(inW.min > offW.max, s"$rows")
    // the mixed doc sits strictly between
    assert(rows(5L)._1 < inW.min && rows(5L)._1 > offW.max, s"$rows")
  }

  test("kept flags select the strict-top quantile only") {
    // off-vocabulary docs are never kept; every kept doc's weight
    // strictly exceeds every dropped doc's weight
    assert(Seq(3L, 4L).forall(rows(_)._2 == 0L), s"$rows")
    val kept = rows.values.filter(_._2 == 1L).map(_._1)
    val dropped = rows.values.filter(_._2 == 0L).map(_._1)
    assert(kept.nonEmpty && kept.min > dropped.max, s"$rows")
  }

  test("fixture run keeps ~top-20% per language") {
    val out = SparkEntry.queries("text_dsir")(spark, sf001)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("kept").as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (lang, n, k) =>
      assert(k > 0 && k <= math.ceil(n * (1.0 - operators.TextOps.DsirKeepQuantile)).toLong,
        s"$lang n=$n kept=$k")
    }
  }
}
