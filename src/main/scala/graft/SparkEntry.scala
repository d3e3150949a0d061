package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sensor.Sensors
import graft.operators.TimeWindows
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every (queries, oracleSql) pair:
  *   - identical output column names on both sides (driver sorts
  *     columns by name before hashing);
  *   - timestamps surfaced as epoch-ms BIGINT (`*_ms`) — sidesteps
  *     parquet ns/us/ms representation differences between engines;
  *   - money/double sums routed through DECIMAL(18,4) and cast back to
  *     double — exact, associative, order-insensitive, so Spark's
  *     partial-aggregate plans hash-match DuckDB bit-for-bit;
  *   - transcendental outputs rounded to 6 dp (libm vs JDK 1-ulp).
  */
object SparkEntry {

  /** Ticks in the deterministic sensor replay: fixed regardless of sf
    * so each oracle SQL (which inlines the same constant) stays valid.
    * 60,000 ticks = 100 min of 10 Hz stream = 120,000 keyed points.
    */
  val SensorTicks: Long = 60000L

  /** Flagship: the dashboard query (SURVEY.md §3.3) — event-time 1 s
    * windowed count for the pressure series; every window holds
    * exactly 10 events (the reference's golden invariant,
    * /root/reference/README.md:41-49).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("sensor_window_count")(spark, "/root/testdata/sf0.001")
      .filter(col("key") === "pressure")
      .orderBy(col("window_end_ms"))

  // ---- shared helpers -------------------------------------------------

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("double")

  // ---- queries --------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Sawtooth determinism oracle: each key's distinct value set.
    "sensor_value_domain" -> ((s, _) =>
      Sensors.sensorPoints(s, SensorTicks)
        .select(col("key"), round(col("value"), 6).as("value_r"))
        .distinct()),

    // TPC-H Q1-style scan→filter→agg (pruned columns, pushed filter).
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") < 50.0)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // Events: tumbling 1 h window per event_type (≙ PseudoWindow over
    // a real table; ms floor math identical to the sensor path).
    "events_window_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          col("event_type"),
          TimeWindows.startOfWindowMs(col("ts_ms"), 3600000L).as("window_start_ms"))
        .agg(
          count(lit(1)).as("cnt"),
          asDouble(sum(dec(col("value")))).as("sum_value")))
  )

  // ---- oracle SQL (DuckDB) -------------------------------------------

  private val sensorCte =
    """WITH ticks AS (
      |  SELECT i, 1704067200000 + i*100 AS ts_ms, (i % 10)/10.0 AS phase
      |  FROM range(60000) t(i)
      |), pts AS (
      |  SELECT 'temp' AS key, ts_ms, phase AS value FROM ticks
      |  UNION ALL
      |  SELECT 'pressure' AS key, ts_ms, sin(phase * 2 * pi()) AS value FROM ticks
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
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
         |SELECT DISTINCT key, round(value, 6) AS value_r FROM pts""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_quantity < 50.0
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "events_window_agg" ->
      """SELECT event_type,
        |  (epoch_ns(ts) // 1000000) - ((epoch_ns(ts) // 1000000) % 3600000) AS window_start_ms,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin
  )
}
