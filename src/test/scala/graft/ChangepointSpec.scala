package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** `events_changepoint` picks the split maximizing the two-segment
  * SSE reduction via exact-decimal prefix sums. The fixture has no
  * engineered shift, so the operator's LOCALIZATION claim is proven
  * on planted series: a known mean step must be found exactly, and
  * the reported segment means must match the planted levels.
  */
class ChangepointSpec extends SparkSpec {

  private def hourly(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_type", "hour_ms", "ys")
      .select(col("event_type"), col("hour_ms"),
        col("ys").cast("decimal(18,9)").as("y"))
  }

  test("a planted mean step is localized exactly") {
    // 48 hours: level 10.0 for hours 0-23, level 14.0 for 24-47, with
    // a small deterministic ripple so the series is not constant
    val rows = (0 until 48).map { i =>
      val base = if (i < 24) BigDecimal(10) else BigDecimal(14)
      val ripple = BigDecimal(i % 3) * BigDecimal("0.01")
      ("a", i.toLong * 3600000L, (base + ripple).toString)
    }
    val r = EventQueries.changepointOver(hourly(rows)).collect().head
    assert(r.getAs[Long]("split_hour_ms") == 23L * 3600000L,
      s"split at ${r.getAs[Long]("split_hour_ms")} — expected hour 23 " +
        "(last hour of the low segment)")
    assert(r.getAs[Long]("n_left") == 24 && r.getAs[Long]("n_right") == 24)
    assert(math.abs(r.getAs[Double]("mean_left_r") - 10.01) < 0.01)
    assert(math.abs(r.getAs[Double]("mean_right_r") - 14.01) < 0.01)
    assert(r.getAs[Double]("gain_r") > 100.0,
      "a 4-unit step over 48 hours must dominate the ripple variance")
  }

  test("multiple series localize independently; a flat series has ~zero gain") {
    val stepAt12 = (0 until 36).map { i =>
      val base = if (i < 12) BigDecimal(5) else BigDecimal(3)
      ("b", i.toLong * 3600000L, (base + BigDecimal(i % 2) * BigDecimal("0.02")).toString)
    }
    val flat = (0 until 36).map { i =>
      ("c", i.toLong * 3600000L, (BigDecimal(7) + BigDecimal(i % 2) * BigDecimal("0.02")).toString)
    }
    val out = EventQueries.changepointOver(hourly(stepAt12 ++ flat))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("b").getAs[Long]("split_hour_ms") == 11L * 3600000L)
    // the flat series still reports its best split, but the gain is
    // the ripple's, orders of magnitude below a real step
    assert(out("c").getAs[Double]("gain_r") < 0.1)
    assert(out("b").getAs[Double]("gain_r") > 10.0)
  }

  test("fixture run returns one row per series with coherent segments") {
    val rows = EventQueries.queries("events_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("event_type"))
    assert(types.distinct.length == types.length, "one split per series")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") >= 1 && r.getAs[Long]("n_right") >= 1)
      assert(r.getAs[Double]("gain_r") >= 0.0,
        "SSE reduction is nonnegative by construction")
    }
  }

  test("depth-2 segmentation finds the secondary step inside a half") {
    // three levels: 10 (hours 0-15), 12 (16-31), 20 (32-47). Level 1
    // must split at the BIG jump (hour 31); level 2's left half must
    // then find the 10→12 step at hour 15.
    val rows = (0 until 48).map { i =>
      val base = if (i < 16) BigDecimal(10)
                 else if (i < 32) BigDecimal(12) else BigDecimal(20)
      val ripple = BigDecimal(i % 3) * BigDecimal("0.01")
      ("m", i.toLong * 3600000L, (base + ripple).toString)
    }
    val out = EventQueries.changepointMulti(hourly(rows)).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("level")) -> r).toMap
    assert(out(("m", 1L)).getAs[Long]("split_hour_ms") === 31L * 3600000L)
    assert(out(("m/L", 2L)).getAs[Long]("split_hour_ms") === 15L * 3600000L)
    assert(math.abs(out(("m/L", 2L)).getAs[Double]("mean_left_r") - 10.01) < 0.02)
    assert(math.abs(out(("m/L", 2L)).getAs[Double]("mean_right_r") - 12.01) < 0.02)
    // the right half is flat: its best gain is ripple-sized
    assert(out(("m/R", 2L)).getAs[Double]("gain_r") < 0.1)
    assert(out(("m", 1L)).getAs[Double]("gain_r")
      > out(("m/L", 2L)).getAs[Double]("gain_r"))
  }
}
