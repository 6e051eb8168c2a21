package graft

import graft.operators.Vectors

/** Seeded JL projection (vec_random_projection): the oracle replays the
  * sign matrix; these pin the matrix's algebra and the fixture's
  * concentration. */
class RandomProjectionSpec extends SparkSpec {

  test("the seeded sign matrix is ±1 and balanced enough to be non-degenerate") {
    val s = for (j <- 0 until 64; k <- 0 until Vectors.RpDim)
      yield Vectors.rpSign(j, k)
    assert(s.forall(x => x == 1.0 || x == -1.0))
    val plus = s.count(_ == 1.0).toDouble / s.size
    assert(plus > 0.35 && plus < 0.65, s"sign balance $plus")
    // no two output dims share their sign column (distinct md5 keys)
    val cols = (0 until Vectors.RpDim)
      .map(k => (0 until 64).map(j => Vectors.rpSign(j, k)))
    assert(cols.distinct.size == Vectors.RpDim)
  }

  test("a pair differing in ONE coordinate projects at ratio exactly 1") {
    // proj diff per dim k is s(j0,k)·Δ with s² = 1, so ‖proj diff‖ =
    // √(RpDim·Δ²) and the 1/√RpDim scale cancels it exactly — the
    // algebraic identity that certifies scale calibration
    val d0 = (0 until 64).map(j => Vectors.rpSign(j, 0) * 0.0) // zeros
    val diff = 3.25
    val y = (0 until Vectors.RpDim).map { k =>
      Vectors.rpSign(5, k) * diff // projection of the difference vector
    }
    val dproj = math.sqrt(y.map(x => x * x).sum) / math.sqrt(Vectors.RpDim)
    assert(math.abs(dproj - diff) < 1e-12, s"dproj=$dproj expected $diff")
    assert(d0.forall(_ == 0.0))
  }

  test("fixture certificate: per-label mean ratios concentrate near 1") {
    val out = SparkEntry.queries("vec_random_projection")(spark, sf001).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (mean, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mean > 0.8 && mean < 1.2, s"label ${r.getInt(0)} mean $mean")
      assert(mn > 0.3 && mx < 2.0, s"spread [$mn, $mx]")
    }
  }
}
