package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven laws for the custom kernels (pure JVM — no Spark
  * session needed, so these run in milliseconds). Uses raw ScalaCheck
  * generators sampled in-loop (the scalatest bridge artifact is not a
  * declared dependency). */
class ExpressionLawsSpec extends AnyFunSuite {

  private def forAllSamples[T](g: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var tried = 0
    var it = 0
    while (tried < n && it < n * 10) {
      g.sample.foreach { v => f(v); tried += 1 }
      it += 1
    }
    assert(tried > n / 2, s"generator too sparse: $tried/$n samples")
  }

  private val hashArrays: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.long).map(_.toArray)

  private val vectors: Gen[Array[Float]] =
    Gen.chooseNum(2, 64)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("sorted-intersect size equals the set-intersection cardinality") {
    val sortedSets: Gen[(Array[Long], Array[Long])] =
      Gen.zip(Gen.listOf(Gen.chooseNum(-100L, 100L)), Gen.listOf(Gen.chooseNum(-100L, 100L)))
        .map { case (a, b) => (a.distinct.sorted.toArray, b.distinct.sorted.toArray) }
    forAllSamples(sortedSets) { case (a, b) =>
      val got = functions.SortedIntersectImpl.intersectSize(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(got == a.toSet.intersect(b.toSet).size)
      // and the derived union identity jaccardSorted relies on
      assert(a.length + b.length - got == a.toSet.union(b.toSet).size)
    }
  }

  test("selfCosine is bit-identical to cosine(x, x), NaN on zero vectors") {
    forAllSamples(vectors) { v =>
      val a = ArrayData.toArrayData(v)
      val self = functions.CosineSimImpl.selfCosine(a, true)
      val both = functions.CosineSimImpl.cosine(a, a, true, true)
      assert(java.lang.Double.doubleToLongBits(self) ==
             java.lang.Double.doubleToLongBits(both))
    }
    val z = ArrayData.toArrayData(Array(0.0f, 0.0f))
    assert(functions.CosineSimImpl.selfCosine(z, true).isNaN)
    assert(functions.CosineSimImpl.cosine(z, z, true, true).isNaN)
  }

  test("simhash is permutation-invariant (bag semantics)") {
    forAllSamples(hashArrays) { hs =>
      val a = functions.SimHashImpl.simhash64(ArrayData.toArrayData(hs))
      val b = functions.SimHashImpl.simhash64(ArrayData.toArrayData(hs.reverse))
      assert(a == b)
    }
  }

  test("simhash of a single hash is that hash itself") {
    forAllSamples(Gen.long) { h =>
      val fp = functions.SimHashImpl.simhash64(ArrayData.toArrayData(Array(h)))
      assert(fp == h)
    }
  }

  test("cosine is symmetric, bounded, and 1 on itself") {
    forAllSamples(vectors) { v =>
      val w = v.map(x => -x * 2.0f + 1.0f)
      val a = ArrayData.toArrayData(v); val b = ArrayData.toArrayData(w)
      val ab = functions.CosineSimImpl.cosine(a, b, true, true)
      val ba = functions.CosineSimImpl.cosine(b, a, true, true)
      assert(ab == ba)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      val aa = functions.CosineSimImpl.cosine(a, a, true, true)
      assert(math.abs(aa - 1.0) < 1e-9)
    }
  }

  test("LSH buckets are scale-invariant (cosine semantics)") {
    forAllSamples(Gen.zip(vectors, Gen.chooseNum(0.1f, 50.0f))) { case (v, c) =>
      val a = functions.HyperplaneLshImpl
        .buckets(ArrayData.toArrayData(v), 8, 8).toLongArray()
      val b = functions.HyperplaneLshImpl
        .buckets(ArrayData.toArrayData(v.map(_ * c)), 8, 8).toLongArray()
      assert(a.sameElements(b))
    }
  }

  test("minhash signature is permutation-invariant and union = elementwise min") {
    forAllSamples(Gen.zip(hashArrays, hashArrays)) { case (a, b) =>
      def sig(xs: Array[Long]) = functions.MinHashSigImpl
        .signature(ArrayData.toArrayData(xs), 16).toLongArray()
      assert(sig(a).sameElements(sig(a.reverse)))
      val u = sig(a ++ b)
      val m = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      assert(u.sameElements(m), "sig(A∪B) must be elementwise min of sigs")
    }
  }

  test("byte-mean is exact, bounded, and invariant to byte order") {
    import graft.functions.ByteMeanImpl
    assert(ByteMeanImpl.mean(Array.empty[Byte]) == 0.0)
    forAllSamples(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = bs.toArray
      val m = ByteMeanImpl.mean(a)
      assert(m >= 0.0 && m <= 255.0, s"out of unsigned-byte range: $m")
      // exact long-sum reference (the documented determinism contract)
      val ref = a.map(b => (b & 0xff).toLong).sum.toDouble / a.length
      assert(m == ref)
      // bag semantics: order cannot change an exact integer sum
      assert(ByteMeanImpl.mean(a.reverse) == m)
    }
  }

  test("l2sq equals the index-order fold bit-for-bit, is symmetric, and is 0 on itself") {
    forAllSamples(vectors) { v =>
      val w = v.map(x => -x * 2.0f + 1.0f)
      val a = ArrayData.toArrayData(v); val b = ArrayData.toArrayData(w)
      val ab = functions.L2SqImpl.l2sq(a, b, true, true)
      // reference: the exact fold the HOF formulation (and DuckDB's
      // LIST_DISTANCE pre-sqrt accumulator) computes, in index order
      var ref = 0.0
      v.indices.foreach { i =>
        val d = v(i).toDouble - w(i).toDouble
        ref += d * d
      }
      assert(java.lang.Double.doubleToLongBits(ab) ==
             java.lang.Double.doubleToLongBits(ref))
      assert(functions.L2SqImpl.l2sq(b, a, true, true) == ab, "symmetry")
      assert(functions.L2SqImpl.l2sq(a, a, true, true) == 0.0)
      assert(ab >= 0.0)
    }
  }

  test("kernels fail fast on dimension mismatch and null slots (no silent zeros)") {
    val a = ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val b = ArrayData.toArrayData(Array(1.0f, 2.0f))
    intercept[IllegalArgumentException] {
      functions.CosineSimImpl.cosine(a, b, true, true)
    }
    intercept[IllegalArgumentException] {
      functions.L2SqImpl.l2sq(a, b, true, true)
    }
    val withNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1.0f, null, 3.0f))
    intercept[IllegalArgumentException] {
      functions.CosineSimImpl.cosine(a, withNull, true, true)
    }
    val hashesWithNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1L, null))
    intercept[IllegalArgumentException] {
      functions.SimHashImpl.simhash64(hashesWithNull)
    }
    intercept[IllegalArgumentException] {
      functions.MinHashSigImpl.signature(hashesWithNull, 4)
    }
    intercept[IllegalArgumentException] {
      functions.HyperplaneLshImpl.buckets(withNull, 2, 4)
    }
  }

  test("LSH bucket arrays have the requested table count, bits bounded") {
    forAllSamples(vectors) { v =>
      val bs = functions.HyperplaneLshImpl
        .buckets(ArrayData.toArrayData(v), 4, 6).toLongArray()
      assert(bs.length == 4)
      assert(bs.forall(b => b >= 0 && b < (1L << 6)))
    }
  }

  private val sketchStreams: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(0, 40).map(i => s"k$i"))

  private def sketchOf(keys: Seq[String], cap: Int) = {
    val agg = functions.FreqSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), cap)
    keys.foldLeft(agg.createAggregationBuffer()) { (b, k) =>
      b.get(k) match {
        case Some((c, e)) => b.update(k, (c + 1, e)); b
        case None if b.size < cap => b.update(k, (1L, 0L)); b
        case None =>
          val (ek, (ec, _)) = b.minBy { case (kk, (c, _)) => (c, kk) }
          b.remove(ek); b.update(k, (ec + 1, ec)); b
      }
    }
  }

  test("FreqSketchAgg serde roundtrip is the identity") {
    val agg = functions.FreqSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    forAllSamples(sketchStreams) { keys =>
      val buf = sketchOf(keys, 8)
      assert(agg.deserialize(agg.serialize(buf)) == buf)
    }
  }

  test("FreqSketchAgg merge is commutative and preserves the overestimate bound") {
    val agg = functions.FreqSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    forAllSamples(Gen.zip(sketchStreams, sketchStreams)) { case (ka, kb) =>
      val truth = (ka ++ kb).groupBy(identity).view.mapValues(_.size.toLong).toMap
      // merge mutates its arguments — build fresh buffers per direction
      val ab = agg.merge(sketchOf(ka, 8), sketchOf(kb, 8))
      val ba = agg.merge(sketchOf(kb, 8), sketchOf(ka, 8))
      assert(ab == ba, s"merge not commutative: $ab vs $ba")
      ab.foreach { case (k, (est, err)) =>
        assert(est >= truth(k), s"$k underestimated: $est < ${truth(k)}")
        assert(est - err <= truth(k), s"$k: est-err exceeds truth")
      }
    }
  }
}
