package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` exemplars (SURVEY.md §4.3's one
  * optional custom-aggregate surface). Buffers use exact decimals so
  * merge order — which varies with partitioning — cannot change the
  * result: the same discipline as the query layer's DECIMAL routing.
  */
object TypedAggregators {

  /** Exact-decimal weighted mean: rows are (key, value, weight);
    * result = Σ(value·weight) / Σ(weight), both sums exact.
    */
  val weightedMean: Aggregator[(String, Double, Double), (BigDecimal, BigDecimal), Double] =
    new Aggregator[(String, Double, Double), (BigDecimal, BigDecimal), Double] {
      private def d4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
      def reduce(b: (BigDecimal, BigDecimal), row: (String, Double, Double)) = {
        val (_, value, weight) = row
        (b._1 + d4(value) * d4(weight), b._2 + d4(weight))
      }
      def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (BigDecimal, BigDecimal)): Double =
        b._1.toDouble / b._2.toDouble
      def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
        Encoders.product[(BigDecimal, BigDecimal)]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
