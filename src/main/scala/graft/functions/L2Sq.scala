package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._

/** Imperative squared-L2 kernel. The sum is sequential in index order —
  * the same association as the higher-order `aggregate` formulation and
  * as DuckDB's LIST_DISTANCE internals (which this equals after its
  * sqrt). NOTE: sqrt is monotone but NOT injective in doubles (distinct
  * squared distances can collapse to one double after sqrt), so
  * comparisons that must match an `ORDER BY LIST_DISTANCE, code`
  * oracle tie-break compare `sqrt(l2sq)`, not the raw square — see
  * [[graft.operators.Vectors.pqAssign]]. Mismatched dimensions or
  * null slots throw, exactly like [[CosineSimImpl]] (a null read as 0
  * would be a silently wrong distance). */
object L2SqImpl {
  def l2sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_l2sq: dimension mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_l2sq: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }
}

/** Native codegen'd squared-L2 distance over `array<float|double>`
  * pairs — the PQ assignment hot path evaluates it
  * PqSubspaces×PqCodes times per row, where the interpreted
  * zip_with/aggregate HOF formulation was the dominant cost of
  * `sim_ann_pq` (same lesson as [[CosineSim]], SURVEY.md §4.3). */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  private def elemFloat(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat(left).isDefined && elemFloat(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  private lazy val aF = elemFloat(left).get
  private lazy val bF = elemFloat(right).get

  override def nullSafeEval(a: Any, b: Any): Any =
    L2SqImpl.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.L2SqImpl.l2sq($a, $b, $aF, $bF)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  def apply(a: Column, b: Column): Column =
    shims.column(L2Sq(shims.expression(a), shims.expression(b)))
}
