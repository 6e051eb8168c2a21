package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom `Generator` (UDTF surface): emit the word n-grams of a token
  * array as rows, one tight loop per input row.
  *
  * The HOF formulation (`transform(sequence(...), i -> concat_ws(' ',
  * element_at(t, i+1), element_at(t, i+2)))` + `explode`) evaluates an
  * interpreted lambda per produced n-gram — per-element expression-tree
  * walks and boxing dominated `text_ngram` at bench. A Generator gets
  * ONE eval call per row and writes each n-gram with a single
  * `UTF8String.concatWs` (no intermediate array, no lambda). This is
  * also the engine's demonstration of the Generator extension point
  * (SURVEY.md §4.3): registered as SQL `graft_ngrams(tokens, n)` by
  * [[graft.plans.GraftExtensions]].
  *
  * Semantics (matches the HOF form and the DuckDB oracle): rows with
  * fewer than `n` tokens emit nothing; null arrays emit nothing; null
  * tokens inside the array are treated as empty strings (concat_ws
  * semantics). Duplicates are emitted — de-duplication is the
  * consumer's choice, not the generator's.
  */
case class NgramGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)

  override def prettyName: String = "graft_ngrams"

  private val sep = UTF8String.fromString(" ")
  private val empty = UTF8String.fromString("")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val m = arr.numElements()
    if (m < n) return Nil
    (0 to m - n).iterator.map { i =>
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) empty else arr.getUTF8String(i + j)
        j += 1
      }
      new GenericInternalRow(Array[Any](UTF8String.concatWs(sep, parts: _*)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramGenerate =
    copy(child = newChild)
}

object NgramGenerate {
  def apply(tokens: Column, n: Int): Column =
    shims.column(NgramGenerate(shims.expression(tokens), n))
}
