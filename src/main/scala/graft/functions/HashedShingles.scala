package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel: token array → SORTED DISTINCT `array<bigint>`
  * of xxhash64'd word n-shingles — the whole shingle pipeline
  * (`array_sort(transform(array_distinct(shinglesOf(toks)),
  * xxhash64))`, five chained higher-order stages) in one eval loop.
  *
  * Semantics are identical to the HOF chain (asserted by spec):
  * shingle text is the n tokens joined by a single space (fewer than
  * n tokens → ONE whole-document shingle, concat_ws semantics for the
  * join); hashes are Spark's `xxhash64` (XXH64, seed 42) over the
  * UTF-8 bytes, so the values match `transform(sh, s => xxhash64(s))`
  * bit-for-bit; distinctness moves from shingle strings to hashes
  * (equivalent under the already-assumed collision-freedom of 64-bit
  * hashes on n²/2⁶⁵ odds); output sorted ascending for the merge-scan
  * set kernels ([[SortedIntersectSize]]).
  *
  * Feeds every near-dup query: one small codegen'd call per row
  * replaces a deep interpreted-lambda expression tree — both eval
  * time and per-query Janino compile time drop.
  */
object HashedShinglesImpl {
  private val Sep = UTF8String.fromString(" ")
  private val Seed = 42L

  def eval(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    // concat_ws semantics: null slots are skipped entirely
    val toks = new Array[UTF8String](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) { toks(cnt) = tokens.getUTF8String(i); cnt += 1 }
      i += 1
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    if (cnt < n) {
      val whole = UTF8String.concatWs(Sep, toks.take(cnt): _*)
      set.add(XXH64.hashUTF8String(whole, Seed))
    } else {
      i = 0
      val parts = new Array[UTF8String](n)
      while (i <= cnt - n) {
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        set.add(XXH64.hashUTF8String(UTF8String.concatWs(Sep, parts: _*), Seed))
        i += 1
      }
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShinglesImpl.eval(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShinglesImpl.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  def apply(tokens: Column, n: Int): Column =
    shims.column(HashedShingles(shims.expression(tokens), n))
}
