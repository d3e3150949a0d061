package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup
import graft.text.TextOps

/** The codegen'd SimHash32 vs (a) the original higher-order-function
  * formulation it replaced (exact agreement on the corpus) and (b)
  * hand-computed fixtures for the bit-majority semantics.
  */
class SimHash32Spec extends SparkSpec {

  test("agrees exactly with the HOF route on the corpus") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(
        Dedup.simhash(TextOps.tokens(col("text"))).as("fast"),
        Dedup.simhashHof(TextOps.tokens(col("text"))).as("ref"))
    val n = docs.count()
    assert(n > 0)
    assert(docs.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("bit-majority semantics on fixtures") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(5L, 5L, 4L)),     // bit0: +1+1-1>0 set; bit2: +3>0 set → 5
      (2L, Seq(1L, 2L)),         // each bit ties at 0 → 0
      (3L, Seq.empty[Long]),     // empty → 0
      (4L, Seq(7L))              // single element → itself (bits 0..2)
    )).toDF("id", "hashes")
      .select(col("id"), SimHash32(col("hashes")).as("sh"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 5L)
    assert(got(2L) == 0L)
    assert(got(3L) == 0L)
    assert(got(4L) == 7L)
  }

  test("null array and null element yield null") {
    val df = spark.sql(
      """SELECT 1 AS id, CAST(NULL AS ARRAY<BIGINT>) AS hashes
        |UNION ALL SELECT 2, array(1L, CAST(NULL AS BIGINT), 3L)""".stripMargin)
      .select(col("id"), SimHash32(col("hashes")).as("sh"))
    assert(df.collect().forall(_.isNullAt(1)))
  }
}
