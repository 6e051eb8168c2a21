package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** sample_neyman_alloc pins: planted strata make the n·σ weighting and
  * the largest-remainder rounding hand-checkable. */
class NeymanSpec extends SparkSpec {
  import spark.implicits._

  test("planted strata: zero-variance stratum gets nothing, allocations " +
       "track n·σ and sum exactly to the budget") {
    // A: {0,10} → σ = √50 ≈ 7.0711, weight 2·σ ≈ 14.142
    // B: {5,5}  → σ = 0, weight 0 — a constant stratum needs NO draws
    // C: {0,20} → σ = √200 ≈ 14.142, weight 2·σ ≈ 28.284 (2x A's)
    val rows = Seq(("A", 0.0), ("A", 10.0), ("B", 5.0), ("B", 5.0),
                   ("C", 0.0), ("C", 20.0)).toDF("lang", "x")
    val out = Relational.neymanAlloc(rows, 99).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out.values.sum == 99L, s"allocations must sum to the budget: $out")
    assert(out("B") == 0L, s"zero-variance stratum must get 0: $out")
    // C's weight is exactly 2x A's: its allocation is within one
    // largest-remainder unit of double A's
    assert(math.abs(out("C") - 2 * out("A")) <= 1, out.toString)
  }

  test("fixture query: allocations sum to the budget, every stratum positive") {
    val rows = SparkEntry.queries("sample_neyman_alloc")(spark, sf001).collect()
    assert(rows.map(_.getLong(4)).sum == Relational.NeymanBudget)
    assert(rows.forall(_.getLong(4) > 0),
      "every fixture lang has spread, so every stratum draws")
    // the allocation ordering follows the n·σ weight ordering
    val byWeight = rows.sortBy(r => -r.getLong(1) * r.getDouble(2))
      .map(_.getLong(4))
    assert(byWeight.sliding(2).forall(p => p(0) >= p(1)),
      s"allocations must be monotone in n·σ: ${byWeight.toSeq}")
  }
}
