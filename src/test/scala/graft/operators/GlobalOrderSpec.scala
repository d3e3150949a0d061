package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[GlobalOrder]]'s distributed rank / prefix sum / ntile
  * arithmetic EXACTLY against the single-partition window forms they
  * replace — on an adversarial frame (duplicate keys, skewed values,
  * n not divisible by the tile count) larger than the partition
  * count, so every range slice is non-trivial and the broadcast
  * offsets are load-bearing.
  */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  // 10007 rows (prime — every ntile split is ragged), keys with heavy
  // duplication so range boundaries land inside tie groups, and a
  // unique id tiebreak making the sort a total order.
  private lazy val frame = spark.range(10007)
    .select(col("id"),
      (col("id") % 97).as("k"),
      pmod(col("id") * 7919, lit(10007L)).as("v"))
    .cache()

  test("withRowNumber == row_number over the global order") {
    val want = frame.withColumn("rn",
      row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
    val got = GlobalOrder.withRowNumber(frame, "rn",
      Seq(negate(col("k")), col("id")), numParts = 7)
    assert(got.select("id", "rn").except(want.select("id", "rn")).isEmpty &&
           want.select("id", "rn").except(got.select("id", "rn")).isEmpty)
  }

  test("withPrefixSum (inclusive and exclusive) == sum over the global order") {
    val w = Window.orderBy(col("k"), col("id"))
    val want = frame
      .withColumn("ci", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("ce", coalesce(sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val gotI = GlobalOrder.withPrefixSum(frame, col("v"), "ci",
      Seq(col("k"), col("id")), inclusive = true, numParts = 7)
    val gotE = GlobalOrder.withPrefixSum(frame, col("v"), "ce",
      Seq(col("k"), col("id")), inclusive = false, numParts = 7)
    assert(gotI.select("id", "ci").except(want.select("id", "ci")).isEmpty)
    assert(gotE.select("id", "ce").except(want.select("id", "ce")).isEmpty)
  }

  test("ntileOf == ntile for ragged splits, including n < tiles") {
    Seq(10007L, 64L, 3L).foreach { n =>
      val sub = frame.filter(col("id") < n)
      val want = sub.withColumn("t",
        ntile(64).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val cnt = sub.agg(count(lit(1)).as("n"))
      val got = GlobalOrder.withRowNumber(sub, "rn",
          Seq(col("v"), col("id")), numParts = 5)
        .crossJoin(broadcast(cnt))
        .withColumn("t", GlobalOrder.ntileOf(col("rn"), col("n"), 64).cast("long"))
      assert(got.select("id", "t").except(want.select("id", "t")).isEmpty &&
             want.select("id", "t").except(got.select("id", "t")).isEmpty,
        s"ntile mismatch at n=$n")
    }
  }

  test("the data-sized window is partitioned by the slice id") {
    val plan = GlobalOrder.withRowNumber(frame, "rn", Seq(col("v"), col("id")))
      .queryExecution.executedPlan.toString
    // the data path must shuffle by the slice id, never to a single
    // partition; the only single-partition frames are the one-row
    // boundary agg and the ≤numParts offsets cumsum
    assert(plan.contains("hashpartitioning(__go_pid"), plan.take(3000))
  }

  test("empty frame degrades to empty, not an error") {
    val empty = frame.filter(col("id") < 0)
    assert(GlobalOrder.withRowNumber(empty, "rn", Seq(col("id"))).count() == 0L)
    assert(GlobalOrder.withPrefixSum(empty, col("v"), "c",
      Seq(col("id")), inclusive = false).count() == 0L)
  }

  test("a NULL sort key raises instead of silently landing in slice 0") {
    val withNull = frame.select(col("id"),
      when(col("id") === 5000L, lit(null)).otherwise(col("v")).as("v"))
    val e = intercept[Exception] {
      GlobalOrder.withRowNumber(withNull, "rn",
        Seq(col("v"), col("id"))).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-null total order")), e.getMessage)
  }

  test("a .desc sort column is rejected with an actionable message") {
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.withRowNumber(frame, "rn", Seq(col("v").desc, col("id")))
    }
    assert(e.getMessage.contains("negate"), e.getMessage)
  }

  test("tiny hash sample (fewer keys than numParts-1) still ranks exactly") {
    // 10007 rows / sampleMod 1024 ≈ 10 sampled keys < numParts−1 = 31:
    // the fallback promotes every distinct sampled key to a boundary
    val want = frame.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val got = GlobalOrder.withRowNumber(frame, "rn",
      Seq(col("v"), col("id")), numParts = 32, sampleMod = 1024)
    assert(got.select("id", "rn").except(want.select("id", "rn")).isEmpty &&
           want.select("id", "rn").except(got.select("id", "rn")).isEmpty)
  }
}
