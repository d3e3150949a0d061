package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {

  private def vecDF(vs: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(vs).toDF("id", "v")

  test("cosine: self-similarity 1, orthogonal 0, opposite -1") {
    val df = vecDF(Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)), (2L, Seq(-1f, 0f, 0f))))
    val a = df.select(col("id"), col("v"))
    val m = a.as("l").crossJoin(a.as("r"))
      .select(col("l.id").as("i"), col("r.id").as("j"),
        VectorOps.cosine(col("l.v"), col("r.v")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(m((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(m((0L, 1L))) < 1e-12)
    assert(math.abs(m((0L, 2L)) + 1.0) < 1e-12)
  }

  test("decimal dot product is exact and order-insensitive") {
    import spark.implicits._
    val v = (1 to 64).map(i => (i / 100.0).toFloat)
    val df = vecDF(Seq((0L, v)))
    val dot = df.select(VectorOps.dotDecimal(col("v"), col("v")).cast("double"))
      .as[Double].collect()(0)
    val expected = v.map(x => BigDecimal(x.toDouble * x.toDouble)
      .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(dot - expected) < 1e-12)
  }

  test("lsh bucket is stable and respects sign structure") {
    val df = vecDF(Seq(
      (0L, (1 to 64).map(i => (math.sin(i) / 2).toFloat)),
      (1L, (1 to 64).map(i => (math.sin(i) / 2).toFloat)),     // identical
      (2L, (1 to 64).map(i => (-math.sin(i) / 2).toFloat))))   // negated
    val b = df.select(col("id"), VectorOps.lshBucket(col("v"), 64, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
    // negating the vector flips every hyperplane side (modulo exact-0 dots)
    assert(b(0L) == (~b(2L) & 0xFFL))
  }
}
