package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sided CUSUM: the ONLINE form of the batch
  * `events_drift` chart. The batch operator exploits the prefix
  * identity (S⁺ = P − min(0, running-min P)) to avoid a stateful
  * fold; a monitoring deployment cannot — events arrive over time and
  * the chart value must be emitted per event as it arrives. So the
  * streaming twin runs the textbook sequential recursion
  *
  *   S⁺_i = max(0, S⁺_{i−1} + (x_i − k_up))
  *   S⁻_i = min(0, S⁻_{i−1} + (x_i − k_dn))
  *
  * as a `flatMapGroupsWithState` fold keyed by series, carrying
  * (S⁺, S⁻) across micro-batches. Control limits (μ, σ → k, h) are
  * trained OFFLINE on the reference corpus and joined onto the stream
  * as a broadcast static dimension — exactly how production CUSUM
  * monitoring deploys (limits from an in-control window, applied
  * online). All values cross the wire as decimal STRINGS and the fold
  * runs in BigDecimal, so the chart is bit-identical to the batch
  * window identity — `stream_drift` shares `events_drift`'s oracle.
  *
  * Scale shape: state per key is two scale-6 decimals (constant);
  * work per batch is sort-within-key + a linear fold. The recursion
  * is inherently sequential PER SERIES — the scaling dimension is the
  * number of monitored series (keys), which is what a fleet monitors
  * (one chart per endpoint/metric/tenant), and keys distribute across
  * the state-store shuffle like any keyed stream.
  *
  * Exactness across batches relies on the replay being time-ordered
  * BETWEEN batches at MILLISECOND granularity — the split source cuts
  * on ms quantiles, so an ms cohort (the unit this fold sorts by)
  * never straddles a batch boundary — and sorted WITHIN the batch
  * here by (ts_ms, event_id), same as the batch window sort. A raw
  * nanos cut would not suffice: two events sharing an ms but
  * differing in sub-ms nanos could land in different batches and be
  * folded in stream order instead (MultiBatchReplaySpec pins the
  * ms-disjointness of the split files).
  */
object CusumStream {

  case class In(key: String, eventId: Long, tsMs: Long,
                x: String, kUp: String, kDn: String, h: String)
  case class Out(event_type: String, event_id: Long, ts_ms: Long,
                 cusum_up: Double, cusum_dn: Double, is_drift: Boolean)

  def chart(in: Dataset[In]): Dataset[Out] = {
    implicit val stateEnc = Encoders.product[(String, String)]
    implicit val outEnc = Encoders.product[Out]
    in.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[(String, String), Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[In], state: GroupState[(String, String)]) =>
          val (u0, d0) = state.getOption.getOrElse(("0", "0"))
          var sUp = BigDecimal(u0)
          var sDn = BigDecimal(d0)
          val out = rows.toSeq.sortBy(r => (r.tsMs, r.eventId)).map { r =>
            val x = BigDecimal(r.x)
            val h = BigDecimal(r.h)
            sUp = (sUp + (x - BigDecimal(r.kUp))).max(0)
            sDn = (sDn + (x - BigDecimal(r.kDn))).min(0)
            Out(r.key, r.eventId, r.tsMs, sUp.toDouble, sDn.toDouble,
                sUp > h || sDn < -h)
          }
          state.update((sUp.toString, sDn.toString))
          out.iterator
      }
  }
}
