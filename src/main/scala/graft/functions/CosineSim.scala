package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._

/** Imperative cosine kernel. Sums are sequential in index order — the
  * same association as the higher-order `aggregate` formulation and as
  * DuckDB's list kernel, so results are bit-identical to the oracle.
  * Mismatched dimensions or null slots throw (ADVICE r1): DuckDB's
  * LIST_COSINE_SIMILARITY errors on dim mismatch, and a null slot read
  * as 0 would be a silently wrong score. Parquet declares embedding
  * elements nullable even though no fixture row contains one, so the
  * guard lives here, not in the type check. */
object CosineSimImpl {
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_cosine: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_cosine: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** cosine(x, x) without the redundant arithmetic. Bit-identical to
    * `cosine(a, a, f, f)`: there dot == na == nb (same accumulation
    * order), so the result is na / (sqrt(na) * sqrt(na)) — NOT a
    * constant 1.0 (an all-zero vector gives 0/0 = NaN, and
    * sqrt(na)² can differ from na by an ulp). Null elements throw
    * exactly like the two-argument kernel. */
  def selfCosine(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"graft_cosine: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x
      i += 1
    }
    na / (math.sqrt(na) * math.sqrt(na))
  }
}

/** Native codegen'd cosine similarity over `array<float|double>` pairs
  * (SURVEY.md §4.3: the HOF pipeline is interpreted per element and was
  * the top cost of `sim_topk`/`sim_pairs_threshold` at bench). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

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
  override def prettyName: String = "graft_cosine"

  private lazy val aF = elemFloat(left).get
  private lazy val bF = elemFloat(right).get

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CosineSimImpl.cosine($a, $b, $aF, $bF)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    shims.column(CosineSim(shims.expression(a), shims.expression(b)))
}

/** Strength-reduced `cosine(x, x)` — the rewrite target of
  * [[graft.plans.SelfCosineIsOne]]. One multiply-add per element
  * instead of three, while preserving the degenerate semantics the
  * two-argument kernel has (zero vector → NaN, null element → throw,
  * null array → null), so the optimizer rule stays
  * semantics-preserving for ALL inputs (ADVICE r2). */
case class SelfCosine(child: Expression) extends UnaryExpression {

  private def elemFloat: Option[Boolean] = child.dataType match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> arg, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_selfcos"

  private lazy val aF = elemFloat.get

  override def nullSafeEval(a: Any): Any =
    CosineSimImpl.selfCosine(a.asInstanceOf[ArrayData], aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CosineSimImpl.selfCosine($a, $aF)")

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)
}
