package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Imperative SimHash kernel shared by interpreted and codegen'd paths. */
object SimHashImpl {
  /** 64-bit SimHash from pre-computed 64-bit token hashes: per-bit
    * majority vote, bit set when strictly more tokens have it set than
    * not. O(64·n) with zero allocation beyond one int[64]. */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException(s"graft_simhash64: null element at index $i")
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** Native Catalyst expression for SimHash over an `array<bigint>` of
  * token hashes (SURVEY.md §4.3 upgrade path: a higher-order-function
  * formulation is CodegenFallback and ~1000× slower; this stays inside
  * whole-stage codegen). Null array → null fingerprint.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API surface: simhash of an `array<bigint>` hash column. */
  def apply(c: Column): Column =
    shims.column(SimHash64(shims.expression(c)))
}
