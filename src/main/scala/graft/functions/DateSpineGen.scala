package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types.{DateType, StructField, StructType}

/** Custom Catalyst Generator (UDTF extension point — SURVEY.md §4.3):
  * emits one row per day in [start, end], both `DATE`. The analyzer
  * rewrites a Generator inside a projection into a `Generate` node, so
  * this composes with pruning/pushdown exactly like the built-in
  * `explode(sequence(...))` — `udtf_generate` runs on this generator
  * and still hash-matches the DuckDB oracle, which is the proof the
  * extension point is wired correctly. Generators produce a variable
  * number of rows per input and are CodegenFallback by design here;
  * the surrounding plan stays codegen'd.
  */
case class DateSpineGen(start: Expression, end: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(start, end)

  override def checkInputDataTypes(): TypeCheckResult =
    if (start.dataType == DateType && end.dataType == DateType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (date, date), got " +
        s"(${start.dataType.sql}, ${end.dataType.sql})")

  override def elementSchema: StructType =
    StructType(Seq(StructField("d", DateType, nullable = false)))

  override def prettyName: String = "graft_date_spine"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = start.eval(input)
    val e = end.eval(input)
    if (s == null || e == null) Iterator.empty
    else {
      // DateType's internal representation is days since the epoch
      val from = s.asInstanceOf[Int]
      val to = e.asInstanceOf[Int]
      (from to to).iterator.map(d => InternalRow(d))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DateSpineGen =
    copy(start = newChildren(0), end = newChildren(1))
}

object DateSpineGen {
  def apply(start: Column, end: Column): Column =
    shims.column(DateSpineGen(shims.expression(start), shims.expression(end)))
}
