package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash kernel: permutation p's hash of element h is the splitmix64
  * finalizer of (h XOR seed(p)) — an independent-enough family for
  * Jaccard estimation, computed in one pass over the base hashes. */
object MinHashSigImpl {
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(hashes: ArrayData, nPerms: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = Array.fill(nPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException(s"graft_minhash_sig: null element at index $i")
      val h = hashes.getLong(i)
      var p = 0
      while (p < nPerms) {
        val v = mix(h ^ (0x9e3779b97f4a7c15L * (p + 1)))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Native codegen'd MinHash signature over an `array<bigint>` of base
  * shingle hashes → `array<bigint>` of `nPerms` minima. The per-perm
  * higher-order `array_min(transform(...))` formulation runs
  * interpreted per element per permutation; this is the single-pass
  * O(perms·shingles) kernel that survives billions of documents
  * (SURVEY.md §4.3). */
case class MinHashSig(child: Expression, nPerms: Int) extends UnaryExpression {
  require(nPerms > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigImpl.signature(input.asInstanceOf[ArrayData], nPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigImpl.signature($c, $nPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, nPerms: Int): Column =
    shims.column(MinHashSig(shims.expression(c), nPerms))
}
