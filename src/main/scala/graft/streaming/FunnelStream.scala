package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel: the ONLINE form of the batch
  * `events_funnel` (view → click-after-view → purchase-after-click).
  *
  * The batch plan is three chained min-aggregations; the chain is NOT
  * mergeable the way the moment/cell twins are — a stage's min is
  * conditional on the PREVIOUS stage's min ("first click strictly
  * after the first view"), so per-batch partial mins cannot be
  * re-merged after the fact (a batch-local "first click" may precede
  * the global first view). The correct streaming shape is the same
  * one CUSUM uses: a per-user `flatMapGroupsWithState` fold over the
  * time-ordered replay. Because stage timestamps are WRITE-ONCE
  * (monotone attainment — once a user reaches a stage the timestamp
  * never changes), the online fold in global (ts_ms, event_id) order
  * reproduces the batch chain exactly:
  *
  *   view     → set t_view if unset (first view = min view)
  *   click    → set t_click if unset, t_view set, ts > t_view
  *   purchase → set t_purchase if unset, t_click set, ts > t_click
  *
  * Cross-batch order holds because the split source cuts on ms
  * quantiles (no ms cohort straddles a batch) and rows are sorted by
  * (ts_ms, event_id) within each batch — the CusumStream contract.
  *
  * Scale shape: state per user is three optional longs (constant); a
  * user with millions of events costs the same state as one with two.
  * Emission: one row per user per batch carrying the user's current
  * attainment; since fields are write-once, the serving-time
  * reconstruction is min-over-non-null per user — itself a mergeable
  * aggregation.
  *
  * Reference ancestry: the stage-gating mirrors the keyed-state
  * pattern of the reference's PseudoWindow state machine
  * (/root/reference/src/main/java/com/ververica/windowing/PseudoWindow.java:82),
  * applied to funnel semantics.
  */
object FunnelStream {

  case class In(userId: Long, eventId: Long, tsMs: Long, eventType: String)
  case class Out(user_id: Long, t_view: Option[Long],
                 t_click: Option[Long], t_purchase: Option[Long])

  /** `windowMs = Some(W)` bounds each stage to a CONVERSION WINDOW
    * (click in (t_view, t_view+W], purchase in (t_click, t_click+W])
    * — the production funnel semantics. Online equivalence to the
    * batch min-in-range still holds under time-ordered replay: ts
    * only grows, so once a stage's window has passed no later event
    * can qualify, and the first in-range event IS the min.
    */
  def track(in: Dataset[In], windowMs: Option[Long] = None): Dataset[Out] = {
    implicit val stateEnc =
      Encoders.product[(Option[Long], Option[Long], Option[Long])]
    implicit val outEnc = Encoders.product[Out]
    def inWin(prev: Option[Long], ts: Long): Boolean =
      prev.exists(t0 => ts > t0 && windowMs.forall(w => ts <= t0 + w))
    in.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Option[Long], Option[Long], Option[Long]), Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[In],
         state: GroupState[(Option[Long], Option[Long], Option[Long])]) =>
          var (v, c, p) = state.getOption.getOrElse(
            (None: Option[Long], None: Option[Long], None: Option[Long]))
          rows.toSeq.sortBy(r => (r.tsMs, r.eventId)).foreach { r =>
            r.eventType match {
              case "view" if v.isEmpty => v = Some(r.tsMs)
              case "click" if c.isEmpty && inWin(v, r.tsMs) =>
                c = Some(r.tsMs)
              case "purchase" if p.isEmpty && inWin(c, r.tsMs) =>
                p = Some(r.tsMs)
              case _ =>
            }
          }
          state.update((v, c, p))
          Iterator.single(Out(uid, v, c, p))
      }
  }
}
