package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[TinyOrder]]'s triangular-join rank / prefix sum / prefix max
  * EXACTLY against the unpartitioned-window forms they replace, on a
  * frame with duplicate values (the tiebreak is load-bearing) and on
  * the degenerate empty/1-row frames.
  */
class TinyOrderSpec extends SparkSpec {

  // 211 rows, values with heavy duplication, unique id tiebreak
  private lazy val frame = spark.range(211)
    .select(col("id"), (col("id") % 13).as("v"),
      pmod(col("id") * 7919, lit(211L)).as("x"))
    .cache()

  test("rank == row_number over the order") {
    val want = frame.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    val got = TinyOrder.rank(frame, "rn", Seq(negate(col("v")), col("id")))
    assert(got.select("id", "rn").except(want.select("id", "rn")).isEmpty &&
           want.select("id", "rn").except(got.select("id", "rn")).isEmpty)
  }

  test("exclusivePrefixSum == sum over unboundedPreceding..-1") {
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = frame.withColumn("c", coalesce(sum(col("x")).over(w), lit(0L)))
    val got = TinyOrder.exclusivePrefixSum(frame, col("x"), "c",
      Seq(col("v"), col("id")))
    assert(got.select("id", "c").except(want.select("id", "c")).isEmpty &&
           want.select("id", "c").except(got.select("id", "c")).isEmpty)
  }

  test("exclusivePrefixMax == max over unboundedPreceding..-1 (null first row)") {
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = frame
      .withColumn("m", max(col("x").cast("double")).over(w))
    val got = TinyOrder.exclusivePrefixMax(frame, col("x").cast("double"), "m",
      Seq(col("v"), col("id")))
    assert(got.select("id", "m").except(want.select("id", "m")).isEmpty &&
           want.select("id", "m").except(got.select("id", "m")).isEmpty)
  }

  test("empty and single-row frames degrade, not error") {
    val empty = frame.filter(col("id") < 0)
    assert(TinyOrder.rank(empty, "rn", Seq(col("id"))).count() == 0L)
    val one = frame.filter(col("id") === 7)
    val r = TinyOrder.rank(one, "rn", Seq(col("id"))).collect().head
    assert(r.getAs[Long]("rn") == 1L)
    val s = TinyOrder.exclusivePrefixSum(one, col("x"), "c", Seq(col("id")))
      .collect().head
    assert(s.getAs[Long]("c") == 0L)
  }

  test("no unpartitioned window in the plan it replaces") {
    val plan = TinyOrder.rank(frame, "rn", Seq(col("v"), col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
