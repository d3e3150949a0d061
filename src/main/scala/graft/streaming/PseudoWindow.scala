package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Strict-parity port of the reference's hand-rolled window operator
  * (`PseudoWindow`, /root/reference/src/main/java/com/ververica/functions/PseudoWindow.java:33-100):
  * per key, a MapState of endOfWindow → count plus one timer per open
  * window. In Spark the same state machine is a
  * `flatMapGroupsWithState` over `GroupState[Map[Long, Long]]`:
  *
  *   - element path (PseudoWindow.java:60-89): endOfWindow =
  *     ts − ts % duration + duration − 1; increment the map entry;
  *     "register timer" = setTimeoutTimestamp(min open end).
  *   - timer path (PseudoWindow.java:92-99): when the watermark
  *     reaches a window's end, emit (key, endOfWindow, count) and
  *     purge the entry.
  *
  * The idiomatic path (`groupBy(window(...))`, SensorStream) is what
  * production code should use — this port exists for processing-time
  * parity and as the library's custom-stateful-operator exemplar.
  * State is per-key-partitioned (the groupByKey shuffle ≙ Flink's
  * keyBy hash exchange) and scales horizontally; map entries are
  * purged on emission exactly like the reference, so state size is
  * O(open windows per key), not O(history).
  */
object PseudoWindow {

  /** `ts` duplicates `tsMs` as a timestamp: the watermark column must
    * survive into the grouped Dataset or Spark rejects EventTimeTimeout.
    */
  case class Point(key: String, tsMs: Long, value: Double, ts: java.sql.Timestamp)
  case class WindowCount(key: String, windowEndMs: Long, cnt: Long)

  def endOfWindow(tsMs: Long, durationMs: Long): Long =
    tsMs - (tsMs % durationMs) + durationMs - 1

  /** Event-time variant (eventTime=true ctor flag): requires the input
    * to carry a watermark (withWatermark upstream of groupByKey).
    */
  def eventTime(points: Dataset[Point], durationMs: Long): Dataset[WindowCount] = {
    implicit val outEnc = Encoders.product[WindowCount]
    implicit val stateEnc = Encoders.kryo[Map[Long, Long]]
    points.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Point], state: GroupState[Map[Long, Long]]) => {
          var open = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { p =>
            val end = endOfWindow(p.tsMs, durationMs)
            open += end -> (open.getOrElse(end, 0L) + 1L)
          }
          // Flink fires a timer when watermark >= timer ts (end).
          val wm = state.getCurrentWatermarkMs()
          val (fire, keep) = open.partition { case (end, _) => end <= wm }
          if (keep.nonEmpty) {
            state.update(keep)
            state.setTimeoutTimestamp(keep.keys.min)
          } else state.remove()
          fire.toSeq.sortBy(_._1).iterator
            .map { case (end, cnt) => WindowCount(key, end, cnt) }
        })
  }

  /** Processing-time variant (eventTime=false): wall-clock windows +
    * ProcessingTimeTimeout — inherently nondeterministic (that is the
    * reference demo's whole point, README.md:41-47); verified by
    * invariants only (counts sum to input size), never by oracle.
    */
  def processingTime(points: Dataset[Point], durationMs: Long): Dataset[WindowCount] = {
    implicit val outEnc = Encoders.product[WindowCount]
    implicit val stateEnc = Encoders.kryo[Map[Long, Long]]
    points.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: String, rows: Iterator[Point], state: GroupState[Map[Long, Long]]) => {
          val now = System.currentTimeMillis()
          var open = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { _ =>
            val end = endOfWindow(now, durationMs)
            open += end -> (open.getOrElse(end, 0L) + 1L)
          }
          val (fire, keep) = open.partition { case (end, _) => end < now }
          if (state.hasTimedOut || fire.nonEmpty || keep.nonEmpty) {
            if (keep.nonEmpty) {
              state.update(keep)
              state.setTimeoutDuration(durationMs)
            } else state.remove()
          }
          fire.toSeq.sortBy(_._1).iterator
            .map { case (end, cnt) => WindowCount(key, end, cnt) }
        })
  }
}
