package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Spark 4 arbitrary-state API v2: a [[StatefulProcessor]] maintaining
  * each user's top-3 spend events in a typed [[ListState]] of
  * (cents, us, event_id) triples, ordered by (cents DESC, us ASC,
  * event_id ASC) — the same deterministic total order the batch
  * declaration ranks by, so merging per batch commutes with ranking
  * the full history. Emissions are the user's current top-3 tagged
  * with the batch's as-of (us, event_id); the final emission per user
  * equals the batch view. State is O(k) per key and the merge is one
  * pass over k + batch rows — never a re-rank of history. */
class TopSpendProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long),
                              (Long, Long, Long, Long, Long, Long)] {

  @transient private var top: ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getListState[(Long, Long, Long)](
      "top", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long, Long)] = {
    // rows: (user_id, us, event_id, cents) — sort by event order so
    // the as-of tag is the batch's true last event for this user
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
    val incoming = sorted.map(r => (r._4, r._2, r._3)) // (cents, us, event_id)
    val merged = (top.get().toSeq ++ incoming)
      .sortBy(t => (-t._1, t._2, t._3))
      .take(3)
    top.clear()
    top.appendList(merged.toArray)
    val asof = sorted.last
    merged.iterator.zipWithIndex.map { case ((cents, _, eid), i) =>
      (key, asof._2, asof._3, i + 1L, eid, cents)
    }
  }
}
