package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving frequent-items sketch (Metwally et al. 2005, "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * native mergeable `TypedImperativeAggregate` — the fixed-memory
  * heavy-hitters path for corpora whose key cardinality dwarfs memory.
  *
  * Guarantees (the classic ones, property-tested in NonOracleOpsSpec):
  * every estimate upper-bounds the true count, the per-key error is
  * bounded by the sketch's minimum counter (≤ N/capacity), and any key
  * with true count > N/capacity is present in the sketch. With
  * capacity ≥ distinct-key count no eviction ever fires and the sketch
  * IS an exact top-k — which is how `agg_freq_topk` stays
  * oracle-checkable while exercising the identical kernel that runs
  * approximately at scale.
  *
  * Merging follows the mergeable-summaries construction (Agarwal et
  * al. 2012): a key absent from a FULL sketch may have been evicted
  * with up to that sketch's min counter, so it contributes min (count
  * and error) on that side; the combined map is then re-trimmed to
  * capacity keeping the largest counters (key-ordered tie-break, so a
  * given buffer state merges deterministically). Overestimation is
  * preserved — never an undercount miss.
  *
  * At 100 TB: the shuffle carries one `capacity`-entry sketch per
  * (group × partition) instead of one row per distinct key — the same
  * partial/final shape as `approx_count_distinct`, for rank instead of
  * cardinality.
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(capacity > 0, "graft_freq_topk: capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_topk"

  type Buf = mutable.HashMap[String, (Long, Long)]

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  private def minCounter(b: Buf): Long =
    if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buffer
    val key = v.asInstanceOf[UTF8String].toString
    buffer.get(key) match {
      case Some((c, e)) => buffer.update(key, (c + 1, e))
      case None if buffer.size < capacity => buffer.update(key, (1L, 0L))
      case None =>
        // evict the min counter (smallest key on ties — deterministic
        // for a given buffer state); the newcomer inherits it as its
        // error bound, the Space-Saving invariant
        val (ek, (ec, _)) = buffer.minBy { case (k, (c, _)) => (c, k) }
        buffer.remove(ek)
        buffer.update(key, (ec + 1, ec))
    }
    buffer
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val m1 = minCounter(b1)
    val m2 = minCounter(b2)
    val out: Buf = mutable.HashMap.empty
    (b1.keysIterator ++ b2.keysIterator).foreach { k =>
      if (!out.contains(k)) {
        val (c1, e1) = b1.getOrElse(k, (m1, m1))
        val (c2, e2) = b2.getOrElse(k, (m2, m2))
        out.update(k, (c1 + c2, e1 + e2))
      }
    }
    if (out.size <= capacity) out
    else {
      val kept: Buf = mutable.HashMap.empty
      out.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
        .foreach { case (k, ce) => kept.update(k, ce) }
      kept
    }
  }

  override def eval(buffer: Buf): Any = {
    val rows = buffer.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c, e)) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val entries = buffer.toSeq.map { case (k, ce) =>
      (k.getBytes(StandardCharsets.UTF_8), ce) }
    val size = 4 + entries.map { case (kb, _) => 4 + kb.length + 16 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.foreach { case (kb, (c, e)) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out: Buf = mutable.HashMap.empty
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      out.update(new String(kb, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

object FreqSketchAgg {
  def apply(c: Column, capacity: Int): Column =
    shims.column(FreqSketchAgg(shims.expression(c), capacity).toAggregateExpression())
}
