package graft.sensor

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed model ≙ the reference's point types
  * (/root/reference/src/main/java/com/ververica/data/DataPoint.java:20-23,
  * KeyedDataPoint.java:20-22) as immutable case classes.
  */
case class DataPoint[T](tsMs: Long, value: T) {
  def withNewValue[U](v: U): DataPoint[U] = DataPoint(tsMs, v)
  def withKey(key: String): KeyedDataPoint[T] = KeyedDataPoint(key, tsMs, value)
}
case class KeyedDataPoint[T](key: String, tsMs: Long, value: T) {
  def withNewValue[U](v: U): KeyedDataPoint[U] = KeyedDataPoint(key, tsMs, v)
}

/** Deterministic sensor-stream generator — the batch twin of the
  * reference's generator pipeline
  * (/root/reference/src/main/java/com/ververica/jobs/TimingExplorer.java:109-152).
  *
  * Reference semantics reproduced exactly:
  *   - `TimestampSource`: tick i at ts = t0 + 100ms·i, t0 floored to a
  *     second boundary (sources/TimestampSource.java:56-57,68-76);
  *     self-pacing/jitter is wall-clock observability theater, not
  *     semantics, so the batch twin drops it (SURVEY.md §7.3).
  *   - `SawtoothFunction`: phase = (i mod numSteps)/numSteps
  *     (functions/SawtoothFunction.java:72-77). The reference keeps the
  *     step in checkpointed ListState; here it is a pure function of
  *     the tick index, so the state disappears.
  *   - `SineWaveFunction`: sin(2π·phase) (functions/SineWaveFunction.java:27-33).
  *   - `AssignKeyFunction`: constant keys "temp"/"pressure"
  *     (functions/AssignKeyFunction.java:24-36, TimingExplorer.java:137,144).
  *   - `union`: bag-semantics merge (TimingExplorer.java:148-149)
  *     = `unionByName` (UNION ALL).
  *
  * Everything is `spark.range`-based: narrow, codegen'd, no shuffle,
  * no state — scales linearly to any n on any cluster.
  */
object Sensors {
  /** 2024-01-01T00:00:00Z — already floored to a second boundary. */
  val T0Ms: Long = 1704067200000L
  val PeriodMs: Long = 100L   // 10 events/sec (TimingExplorer.java:118-119)
  val NumSteps: Int = 10      // sawtooth steps (TimingExplorer.java:131)
  val TwoPi: Double = 2.0 * math.Pi

  /** Raw ticks ≙ DataPoint<Long> stream: (i, ts_ms). */
  def ticks(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("i"),
      (lit(T0Ms) + col("id") * PeriodMs).as("ts_ms"))

  /** Sawtooth phase column ≙ SawtoothFunction. */
  def sawtoothPhase(i: Column, numSteps: Int = NumSteps): Column =
    (i % numSteps).cast("double") / numSteps

  /** Sine transform ≙ SineWaveFunction. */
  def sineWave(phase: Column): Column = sin(phase * TwoPi)

  /** The two keyed series + union, ≙ the full generateSensorData DAG.
    * Output schema: key string, ts_ms long, ts timestamp(ms), value double.
    */
  def sensorPoints(spark: SparkSession, n: Long): DataFrame = {
    val base = ticks(spark, n)
      .withColumn("phase", sawtoothPhase(col("i")))
    val temp = base.select(
      lit("temp").as("key"), col("ts_ms"), col("phase").as("value"))
    val pressure = base.select(
      lit("pressure").as("key"), col("ts_ms"), sineWave(col("phase")).as("value"))
    temp.unionByName(pressure)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .select(col("key"), col("ts"), col("ts_ms"), col("value"))
  }
}
