package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._

/** Native elementwise MIN/MAX aggregate over `array<float|double>`
  * columns — the mergeable "sketch union" aggregate shape at the
  * Catalyst `TypedImperativeAggregate` extension point (the engine's
  * typed-`Aggregator` surface is `udaf_weighted_mean`; this is the
  * lower-level one physical operators use).
  *
  * Why it matters at 100 TB: elementwise extremes (bounding boxes of
  * embedding clusters, MinHash sketch unions, per-dimension data
  * ranges) are associative+commutative per slot, so they partial-
  * aggregate map-side and the shuffle carries ONE array per group per
  * partition — the posexplode alternative shuffles dim× the row count.
  * Update and merge are allocation-free loops over a primitive
  * double[] buffer; serialization is the raw 8·dim bytes.
  *
  * Degenerate inputs follow built-in MIN/MAX conventions: null arrays
  * are skipped, zero matching rows yield NULL. Mismatched dimensions
  * throw (a silent zip-truncation would corrupt the result). Null
  * elements throw like the other graft kernels (a null slot read as
  * ±∞ would be silently wrong).
  */
case class ArrayExtremeAgg(
    child: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (isMin) "graft_array_min" else "graft_array_max"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val a = child.eval(input)
    if (a == null) return buffer
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val fresh = buffer.length == 0
    if (!fresh && buffer.length != n)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${buffer.length} vs $n)")
    val out = if (fresh) new Array[Double](n) else buffer
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"$prettyName: null element at index $i")
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (fresh) out(i) = x
      else if (isMin) { if (x < out(i)) out(i) = x }
      else { if (x > out(i)) out(i) = x }
      i += 1
    }
    out
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    if (b1.length != b2.length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch in merge (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) {
      if (isMin) { if (b2(i) < b1(i)) b1(i) = b2(i) }
      else { if (b2(i) > b1(i)) b1(i) = b2(i) }
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayExtremeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayExtremeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArrayExtremeAgg =
    copy(child = newChild)
}

object ArrayExtremeAgg {
  def min(c: Column): Column =
    shims.column(ArrayExtremeAgg(shims.expression(c), isMin = true).toAggregateExpression())
  def max(c: Column): Column =
    shims.column(ArrayExtremeAgg(shims.expression(c), isMin = false).toAggregateExpression())
}
