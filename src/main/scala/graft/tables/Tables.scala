package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`, schemas in FIXTURES.md §B).
  *
  * All loaders are plain `spark.read.parquet` — scans stay
  * Catalyst-visible so filter pushdown / column pruning reach the
  * parquet reader (check `PushedFilters` in `.explain("formatted")`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Epoch-millis expression for the fixture's `ts` column, adaptive
    * to its LOADED type. The driver has shipped `events.parquet` with
    * `ts` as parquet TIMESTAMP(NANOS) (reads as LongType under
    * `nanosAsLong`) and as TIMESTAMP(MICROS) (reads as TIMESTAMP or
    * TIMESTAMP_NTZ); branching here makes a fixture regeneration a
    * no-op instead of an analysis error across the events surface.
    * All sessions run with `spark.sql.session.timeZone=UTC`, so the
    * NTZ→TIMESTAMP cast is exact.
    */
  def tsMsExpr(tsType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    tsType match {
      // nanos-as-long: integer DIV, not `/` (double division loses ms
      // precision on epoch-nanos magnitudes ~1.7e18 > 2^53).
      case org.apache.spark.sql.types.LongType =>
        expr("CAST(ts DIV 1000000 AS BIGINT)")
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000 AS BIGINT)")
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other — fixture drift: " +
          "expected BIGINT (parquet TIMESTAMP(NANOS) under nanosAsLong) " +
          "or TIMESTAMP/TIMESTAMP_NTZ (parquet TIMESTAMP(MICROS))")
    }

  /** events, normalized to the engine's in-band time columns:
    *   - `ts_ms` (LongType, epoch millis — exact floor math, ≙ the
    *     reference's in-band `timeStampMs`,
    *     /root/reference/src/main/java/com/ververica/data/DataPoint.java:20)
    *   - `ts` (TimestampType, ms precision — for window()/watermarks)
    * Physical `ts` type is fixture-dependent; see [[tsMsExpr]].
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // harmless when ts is TIMESTAMP(MICROS); required for the NANOS fixture
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw
      .withColumn("ts_ms", tsMsExpr(raw.schema("ts").dataType))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }
}
