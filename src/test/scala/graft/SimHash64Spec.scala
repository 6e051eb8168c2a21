package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Native SimHash64 expression: algebraic properties + codegen path.
  * (Fingerprints are engine-hash-specific, hence no DuckDB oracle —
  * SURVEY.md §2.2.) */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private def fp(texts: String*): Seq[Long] =
    texts.toDF("text")
      .select(Dedup.simhash(col("text")).as("fp"))
      .as[Long].collect().toSeq

  test("identical texts get identical fingerprints") {
    val Seq(a, b) = fp("the quick brown fox", "the quick brown fox")
    assert(a == b)
  }

  test("token order does not change the fingerprint (bag-of-words)") {
    val Seq(a, b) = fp("alpha beta gamma delta", "delta gamma beta alpha")
    assert(a == b)
  }

  test("near-identical texts are Hamming-close, unrelated texts are not") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val far = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val Seq(fBase, fNear, fFar) = fp(base, near, far)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(fBase, fNear) < ham(fBase, fFar),
      s"near=${ham(fBase, fNear)} far=${ham(fBase, fFar)}")
    assert(ham(fBase, fNear) <= 16)
  }

  test("null text yields null fingerprint") {
    val rows = Seq[(Integer, String)]((1, null), (2, "x"))
      .toDF("id", "text")
      .select(Dedup.simhash(col("text")).as("fp"))
      .collect()
    assert(rows(0).isNullAt(0) && !rows(1).isNullAt(0))
  }

  test("interpreted eval matches the codegen'd result") {
    val hashes = Seq("a b c", "x y z a b").toDF("text")
      .select(transform(array_distinct(split(lower(trim(col("text"))), " ")),
        t => xxhash64(t)).as("h"))
      .collect().map(_.getSeq[Long](0))
    val viaImpl = hashes.map { hs =>
      functions.SimHashImpl.simhash64(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs.toArray))
    }
    val viaPlan = fp("a b c", "x y z a b")
    assert(viaImpl.toSeq == viaPlan)
  }
}
