package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._

/** Random-hyperplane LSH kernel shared by interpreted and codegen paths. */
object HyperplaneLshImpl {
  /** Deterministic plane component in [-1, 1) from (plane, dim) — a
    * splitmix64 finalizer, identical on every executor with no RNG
    * state, so plan reuse and retries see the same hyperplanes. */
  def planeComp(p: Int, j: Int): Double = {
    var z = (p.toLong << 32 | j.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** nTables bucket signatures of `bits` sign-bits each; plane p of
    * table t is global plane index t*bits+p. O(nTables·bits·dim). */
  def buckets(v: ArrayData, nTables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    var k = 0
    while (k < dim) {
      if (v.isNullAt(k))
        throw new IllegalArgumentException(s"graft_hyperplane_lsh: null element at index $k")
      k += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = t * bits + b
        var proj = 0.0
        var j = 0
        while (j < dim) {
          proj += v.getFloat(j) * planeComp(p, j)
          j += 1
        }
        if (proj >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression: `array<float>` embedding → `array<bigint>` of
  * `nTables` LSH bucket signatures (`bits` hyperplane sign-bits each).
  * The multi-table form is what makes ANN recall tunable — a neighbor
  * at angle θ collides in one table with prob (1−θ/π)^bits, and in any
  * of L tables with 1−(1−p^bits)^L — while candidate volume stays
  * ≈ L·n/2^bits, i.e. sublinear scans at 100 TB.
  */
case class HyperplaneLsh(child: Expression, nTables: Int, bits: Int)
    extends UnaryExpression {
  require(nTables > 0 && bits > 0 && bits <= 64)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_lsh"

  override def nullSafeEval(input: Any): Any =
    HyperplaneLshImpl.buckets(input.asInstanceOf[ArrayData], nTables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneLshImpl.buckets($c, $nTables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)
}

object HyperplaneLsh {
  def apply(c: Column, nTables: Int, bits: Int): Column =
    shims.column(HyperplaneLsh(shims.expression(c), nTables, bits))
}
