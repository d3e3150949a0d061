package graft

import org.apache.spark.sql.functions._
import graft.sensor.Sensors
import graft.operators.TimeWindows

/** The reference's visual determinism oracle as assertions
  * (SURVEY.md §5.1): event-time windowed count == exactly 10 per key
  * per full second; sawtooth cycles 0.0..0.9; sine = sin(2π·phase).
  */
class SensorPipelineSpec extends SparkSpec {

  test("event-time window count is exactly 10 per key per window") {
    val counts = TimeWindows.tumblingCount(
      Sensors.sensorPoints(spark, 1000), "key", "ts_ms", 1000L)
    val distinctCounts = counts.select("cnt").distinct().collect().map(_.getLong(0))
    assert(distinctCounts.toSet == Set(10L))
    assert(counts.count() == 2 * 100) // 2 keys × 100 full seconds
  }

  test("window counts sum to the input cardinality") {
    val pts = Sensors.sensorPoints(spark, 777)
    val counts = TimeWindows.tumblingCount(pts, "key", "ts_ms", 1000L)
    assert(counts.agg(sum("cnt")).collect()(0).getLong(0) == pts.count())
  }

  test("sawtooth cycles through {0.0,0.1,...,0.9}") {
    val temps = Sensors.sensorPoints(spark, 100)
      .filter(col("key") === "temp")
      .select("value").distinct().collect().map(_.getDouble(0)).sorted
    assert(temps.toSeq == (0 until 10).map(_ / 10.0))
  }

  test("pressure series is sin(2π·phase) of the sawtooth") {
    val rows = Sensors.sensorPoints(spark, 40)
      .groupBy("ts_ms").pivot("key", Seq("temp", "pressure"))
      .agg(first("value"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - math.sin(2 * math.Pi * r.getDouble(1))) < 1e-12)
    }
  }

  test("endOfWindow formula matches the reference floor math") {
    // PseudoWindow.java:82: time - (time % duration) + duration - 1
    val ts = Seq(0L, 999L, 1000L, 1001L, 123456789L)
    val df = spark.createDataFrame(ts.map(Tuple1(_))).toDF("ts_ms")
    val got = df.select(TimeWindows.endOfWindowMs(col("ts_ms"), 1000L).as("e"))
      .collect().map(_.getLong(0))
    val want = ts.map(t => t - (t % 1000) + 999)
    assert(got.toSeq == want)
  }
}
