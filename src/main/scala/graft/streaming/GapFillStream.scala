package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LOCF gap-fill — the per-key ordered-state twin of the
  * batch resampler (`events_gapfill`,
  * [[graft.queries.EventQueries]]): project an event stream onto a
  * dense hourly grid per key, mark the empty buckets, and carry the
  * last observed (already-rounded) hourly mean forward. This is the
  * operator a metrics store runs continuously (PromQL
  * `fill(previous)`, Timescale `time_bucket_gapfill` over a
  * continuous aggregate): grid rows are emitted as the WATERMARK
  * closes each bucket — including rows for buckets no event ever
  * touched, which is what distinguishes gap-fill from a plain
  * windowed aggregation (state must emit on time passing, not on
  * data arriving).
  *
  * State machine per key (`flatMapGroupsWithState` +
  * `EventTimeTimeout`, the [[PseudoWindow]] pattern):
  *
  *   - element path: fold the event into `pending(hour)` — a count
  *     and an exact decimal sum carried as a string (the
  *     [[CusumStream]] decimal-string transport, so the cross-batch
  *     fold is bit-identical to the batch aggregate regardless of
  *     how micro-batches slice an hour).
  *   - timer path: while `hour end ≤ watermark`, emit the closed
  *     bucket — observed hours emit their rounded mean and refresh
  *     the carry; empty hours emit `cnt=0, is_gap=true` with the
  *     carried value — then re-arm the timeout at the next hour end,
  *     so emission advances on watermark progress even when the key
  *     receives no further events.
  *
  * State is `O(hours in the watermark horizon)` per key — `pending`
  * holds only hours not yet closed by the watermark (a time-ordered
  * replay keeps that at ≲1 open hour; out-of-order arrival bounds it
  * by the watermark delay), plus one carry value and one cursor.
  * `StreamStateSizeSpec` pins the horizon-bound row count.
  *
  * The grid origin (`h0`, the batch query's global `min(hour_ms)`)
  * is passed in as a constant: a production resampler's grid anchor
  * is deployment config, not something derived from an unbounded
  * stream; the bounded-replay harness computes it from the fixture
  * batch-side. Emission covers `[h0, last hour closed by the final
  * watermark]` — the oracle carries the same cutoff, the standard
  * append-mode contract shared by all `stream_*` oracles.
  *
  * Arithmetic parity with the batch twin, step for step: per-value
  * `cast(value as decimal(18,4))` = `setScale(4, HALF_UP)`; exact
  * decimal sum; `cast(sum as double)` = `BigDecimal.toDouble`;
  * `round(sv / cnt, 6)` = scala `BigDecimal(double).setScale(6,
  * HALF_UP).toDouble` — the identical code path Spark's `Round`
  * takes on DoubleType, so the carried values match the batch chart
  * bit for bit.
  */
object GapFillStream {

  /** `ts` duplicates `tsMs` as a timestamp: the watermark column must
    * survive into the grouped Dataset or Spark rejects EventTimeTimeout.
    */
  case class In(key: String, tsMs: Long, value: Double, ts: java.sql.Timestamp)
  case class Out(event_type: String, hour_ms: Long, cnt: Long,
                 is_gap: Boolean, locf_avg_r: java.lang.Double)

  /** next = first unemitted grid hour; carry = last emitted non-null
    * rounded mean (null before the key's first observed hour);
    * pending = open hour → (count, exact decimal sum as string).
    */
  case class St(next: Long, carry: java.lang.Double,
                pending: Map[Long, (Long, String)])

  private val HalfUp = scala.math.BigDecimal.RoundingMode.HALF_UP

  def grid(in: Dataset[In], gridOriginMs: Long,
           bucketMs: Long = 3600000L): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    implicit val stateEnc = Encoders.kryo[St]
    in.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[In], state: GroupState[St]) => {
          val st0 = state.getOption.getOrElse(St(gridOriginMs, null, Map.empty))
          var pending = st0.pending
          // Element path. Time-ordered ms-disjoint replay files mean
          // no row can target an hour the watermark already closed
          // (ts > wm for every arriving row); fold order within an
          // hour is irrelevant — exact decimal addition commutes.
          rows.foreach { r =>
            val h = r.tsMs - r.tsMs % bucketMs
            val (c, s) = pending.getOrElse(h, (0L, "0"))
            val v4 = BigDecimal(r.value).setScale(4, HalfUp)
            pending += h -> (c + 1L, (BigDecimal(s) + v4).toString)
          }
          // Timer path: close every bucket the watermark has passed.
          val wm = state.getCurrentWatermarkMs()
          var next = st0.next
          var carry = st0.carry
          val out = Seq.newBuilder[Out]
          while (next + bucketMs - 1 <= wm) {
            pending.get(next) match {
              case Some((c, s)) =>
                val sv = BigDecimal(s).toDouble
                val avg = BigDecimal(sv / c).setScale(6, HalfUp).toDouble
                carry = avg
                pending -= next
                out += Out(key, next, c, is_gap = false, avg)
              case None =>
                out += Out(key, next, 0L, is_gap = true, carry)
            }
            next += bucketMs
          }
          state.update(St(next, carry, pending))
          // Always strictly ahead of wm (the loop just drained to it),
          // so the group re-fires on the next watermark advance.
          state.setTimeoutTimestamp(next + bucketMs - 1)
          out.result().iterator
        })
  }
}
