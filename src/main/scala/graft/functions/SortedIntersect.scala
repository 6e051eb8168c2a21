package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._

/** Merge-scan intersection-size kernel over SORTED `array<bigint>`
  * sets. `size(array_intersect(a, b))` builds a hash set per call —
  * on a pairwise-similarity join that allocation dominates the whole
  * query (dedup_cluster spent ~4 s of 6 at sf0.1 inside the Jaccard
  * predicate). For pre-sorted distinct arrays the intersection size
  * is a single O(n+m) merge scan with zero allocation, and
  * |A∪B| = |A|+|B|−|A∩B| makes the union free.
  *
  * Precondition (enforced by the producer, [[graft.operators.Dedup
  * .withHashedShingles]] sorts after hashing): both inputs ascending,
  * duplicate-free, null-element-free. Null elements throw rather than
  * silently miscounting. */
object SortedIntersectImpl {
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException("graft_sorted_intersect_size: null element")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectImpl.intersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectImpl.intersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    shims.column(SortedIntersectSize(shims.expression(a), shims.expression(b)))
}
