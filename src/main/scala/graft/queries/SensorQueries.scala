package graft.queries

import org.apache.spark.sql.functions._
import graft.sensor.Sensors
import graft.operators.TimeWindows

/** The reference's own surface as oracle-checked batch queries
  * (SURVEY.md §2 #1-#8, §3.3).
  */
object SensorQueries {

  /** Ticks in the deterministic sensor replay: fixed regardless of sf
    * so each oracle SQL (which inlines the same constant) stays valid.
    * 60,000 ticks = 100 min of 10 Hz stream = 120,000 keyed points.
    */
  val SensorTicks: Long = 60000L

  val queries: Map[String, Q] = Map(

    // ≙ reference operators #1,#3,#4,#5,#6 (generator → sawtooth →
    // sine → assignKey → union), SURVEY.md §2.
    "sensor_points" -> ((s, _) =>
      Sensors.sensorPoints(s, SensorTicks)
        .select(col("key"), col("ts_ms"), round(col("value"), 6).as("value_r"))),

    // ≙ operators #7,#8: keyBy + event-time PseudoWindow (1 s tumbling
    // count, endOfWindow = ts − ts%1000 + 999, PseudoWindow.java:82).
    "sensor_window_count" -> ((s, _) =>
      TimeWindows.tumblingCount(
        Sensors.sensorPoints(s, SensorTicks), "key", "ts_ms", 1000L)),

    // ≙ the Grafana dashboard query (SURVEY.md §3.3): filter + project
    // on the raw series.
    "sensor_pressure_series" -> ((s, _) =>
      Sensors.sensorPoints(s, SensorTicks)
        .filter(col("key") === "pressure")
        .select(col("ts_ms"), round(col("value"), 6).as("value_r"))),

    // Sawtooth determinism oracle: each key's distinct value set
    // (temp = {0.0,…,0.9}, pressure = the 10 sine values).
    "sensor_value_domain" -> ((s, _) =>
      Sensors.sensorPoints(s, SensorTicks)
        .select(col("key"), round(col("value"), 6).as("value_r"))
        .distinct())
  )

  private val sensorCte =
    """WITH ticks AS (
      |  SELECT i, 1704067200000 + i*100 AS ts_ms, (i % 10)/10.0 AS phase
      |  FROM range(60000) t(i)
      |), pts AS (
      |  SELECT 'temp' AS key, ts_ms, phase AS value FROM ticks
      |  UNION ALL
      |  SELECT 'pressure' AS key, ts_ms, sin(phase * 2 * pi()) AS value FROM ticks
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "sensor_points" ->
      s"""$sensorCte
         |SELECT key, ts_ms, round(value, 6) AS value_r FROM pts""".stripMargin,

    "sensor_window_count" ->
      s"""$sensorCte
         |SELECT key, ts_ms - (ts_ms % 1000) + 999 AS window_end_ms,
         |       count(*) AS cnt
         |FROM pts GROUP BY 1, 2""".stripMargin,

    "sensor_pressure_series" ->
      s"""$sensorCte
         |SELECT ts_ms, round(value, 6) AS value_r
         |FROM pts WHERE key = 'pressure'""".stripMargin,

    "sensor_value_domain" ->
      s"""$sensorCte
         |SELECT DISTINCT key, round(value, 6) AS value_r FROM pts""".stripMargin
  )
}
