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
    // r17: the packed rewrite runs its running aggregate as a window
    // over the already-tiny exploded frame — the invariant this spec
    // protects is that no window has an EMPTY partition spec (the
    // single-task global sort + WindowExec warning the operator
    // exists to avoid), and that the partition key survives the
    // optimizer (a foldable constant would be stripped back to an
    // empty spec). Assert on the executed plan's Window nodes
    // directly instead of string-matching "Window".
    // optimizedPlan, not executedPlan: AQE wraps the physical tree (so
    // a collect over it sees nothing), and the foldable-key stripping
    // this guards against is an OPTIMIZER rule — the post-optimizer
    // logical plan is exactly where an emptied partition spec would
    // show.
    val plan = TinyOrder.rank(frame, "rn", Seq(col("v"), col("id")))
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the packed prefix window")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window leaked back in:\n${w.toString.take(2000)}")
    }
  }
}
