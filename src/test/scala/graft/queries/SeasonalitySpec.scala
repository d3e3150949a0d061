package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for the seasonal baseline (`events_seasonality`): counts and
  * baselines recomputed from raw events, and the flag thresholds.
  */
class SeasonalitySpec extends SparkSpec {

  // sf0.01: both hot AND cold hours occur (sf0.001 has no cold ones)
  private val dir = "/root/testdata/sf0.01"

  private lazy val rows =
    EventQueries.queries("events_seasonality")(spark, dir).collect()

  test("hourly counts and per-clock-hour baselines match a raw recomputation") {
    val hours = Tables.events(spark, dir)
      .select(col("event_type"), col("ts_ms")).collect()
      .map(r => (r.getString(0), r.getLong(1) - r.getLong(1) % 3600000L))
    val cnt = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val base = cnt.toSeq
      .map { case ((t, h), n) => ((t, h % 86400000L / 3600000L), n) }
      .groupBy(_._1)
      .view.mapValues { xs =>
        BigDecimal(xs.map(_._2).sum.toDouble / xs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    assert(rows.length == cnt.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(r.getLong(3) == cnt(key), s"cnt $key")
      assert(r.getDouble(4) == base((key._1, r.getLong(2))), s"baseline $key")
    }
  }

  test("hot/cold flags are exactly the ±50% departures from the baseline") {
    rows.foreach { r =>
      val (cnt, b) = (r.getLong(3), r.getDouble(4))
      assert(r.getBoolean(5) == (cnt >= 1.5 * b), r.toString)
      assert(r.getBoolean(6) == (cnt <= 0.5 * b), r.toString)
    }
    assert(rows.exists(_.getBoolean(5)) && rows.exists(_.getBoolean(6)),
      "fixture exercises neither flag — law vacuous")
  }

  test("sum-merged streaming partials reproduce the batch profile exactly") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getBoolean(5), r.getBoolean(6))
    val streamed = StreamingQueries.queries("stream_seasonality")(spark, dir)
      .collect().map(key).toSet
    assert(streamed == rows.map(key).toSet)
  }
}
