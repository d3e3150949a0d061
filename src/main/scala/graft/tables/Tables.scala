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

  /** `events.parquet` carries `ts` as parquet TIMESTAMP(NANOS) which
    * Spark cannot represent natively (TimestampType is microseconds).
    * Read it with the nanos-as-long legacy conf and normalize to:
    *   - `ts_ms` (LongType, epoch millis — exact floor math, ≙ the
    *     reference's in-band `timeStampMs`,
    *     /root/reference/src/main/java/com/ververica/data/DataPoint.java:20)
    *   - `ts` (TimestampType, ms precision — for window()/watermarks)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    // Integer DIV, not `/` (double division loses ms precision on
    // epoch-nanos magnitudes ~1.7e18 > 2^53).
    raw
      .withColumn("ts_ms", expr("CAST(ts DIV 1000000 AS BIGINT)"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }
}
