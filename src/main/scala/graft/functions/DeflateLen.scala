package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Imperative kernel shared by interpreted and codegen'd paths. */
object DeflateLenImpl {
  /** DEFLATE-compressed byte length at a FIXED level (6, the zlib
    * default) with a fixed strategy — deterministic for a given zlib,
    * which is all the compressibility SIGNAL needs (the ratio is a
    * quality feature, not an archived artifact; text_compression_ratio
    * is property-tested, not oracle-replayed, because the second
    * engine carries no DEFLATE). A fresh Deflater per call keeps the
    * kernel state-free for codegen; the output buffer grows in one
    * worst-case step (deflate never exceeds input + 5 bytes per 16 KB
    * block + 6). */
  def len(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](bytes.length + (bytes.length >> 11) + 16)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Native compressibility kernel: binary payload → DEFLATE length,
  * inside whole-stage codegen. The gzip-ratio quality heuristic
  * (CCNet/RedPajama-class curation uses compressibility as the
  * boilerplate/repetition detector n-gram stats miss). */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLenImpl.len(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLenImpl.len($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Column API surface: DEFLATE length of a binary column. */
  def apply(c: Column): Column =
    shims.column(DeflateLen(shims.expression(c)))
}
