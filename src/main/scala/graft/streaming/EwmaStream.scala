package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA: the ONLINE form of the batch `events_ewma` kernel.
  * The batch operator materializes each row's 32-value trailing frame
  * through a window pass; a monitoring deployment instead carries the
  * trailing buffer as keyed state and emits the smoothed value per
  * event as it arrives — O(1) work and 31 doubles of state per
  * series, the constant-memory posture the batch scaladoc promises.
  *
  * Exactness: the kernel is the SAME 32-term quantized sum (each
  * term x·α·(1−α)^k rounded half-up at 9 dp — the `BigDecimal(double)`
  * canonical-representation path Spark's `round` takes — then summed
  * exactly, rounded once at 6 dp), the weights are the same
  * `math.pow` literals the batch plan folds in, and raw doubles cross
  * batches bit-identically inside the state encoder. Batch-order
  * safety is the CusumStream contract: the split source cuts on ms
  * quantiles so an ms cohort never straddles a micro-batch, and each
  * batch sorts within key by (ts_ms, event_id) — so
  * `stream_ewma` shares `events_ewma`'s oracle and the hash match
  * proves stateful-online ≡ windowed-batch.
  */
object EwmaStream {

  val Alpha = 0.2
  val Lags = 32

  case class In(key: String, eventId: Long, tsMs: Long, x: Double)
  case class Out(event_id: Long, event_type: String, ts_ms: Long, ewma: Double)
  case class Buf(values: Seq[Double])

  private val weights: Array[Double] =
    (0 until Lags).map(k => math.pow(1.0 - Alpha, k)).toArray

  /** The per-event kernel over the trailing buffer (newest last) —
    * term-for-term the batch expression. */
  private[graft] def ewmaOf(trailing: Seq[Double]): Double = {
    val n = trailing.length
    var sum = BigDecimal(0)
    var k = 0
    while (k < n && k < Lags) {
      val x = trailing(n - 1 - k)
      sum += BigDecimal(x * Alpha * weights(k))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      k += 1
    }
    // round the exact decimal sum at 6 dp BEFORE the double conversion
    // (the r13 batch-side convention — see events_ewma's comment on
    // 6-dp half-boundary ties)
    sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def smooth(in: Dataset[In]): Dataset[Out] = {
    implicit val stateEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[Out]
    in.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Buf, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[In], state: GroupState[Buf]) =>
          var buf = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
          val out = rows.toSeq.sortBy(r => (r.tsMs, r.eventId)).map { r =>
            buf = (buf :+ r.x).takeRight(Lags)
            Out(r.eventId, key, r.tsMs, ewmaOf(buf))
          }
          // only the last Lags−1 values can influence a future event
          state.update(Buf(buf.takeRight(Lags - 1)))
          out.iterator
      }
  }
}
