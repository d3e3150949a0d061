package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long, Long, Double)]) =
    spark.createDataFrame(rows).toDF("k", "ts_ms", "id", "value")

  test("attaches the latest right value at or before each left ts") {
    val left = df(Seq(("a", 100L, 1L, 0.0), ("a", 200L, 2L, 0.0),
                      ("a", 50L, 3L, 0.0), ("b", 100L, 4L, 0.0)))
    val right = df(Seq(("a", 100L, 10L, 1.1), ("a", 150L, 11L, 2.2),
                       ("b", 999L, 12L, 9.9)))
    val got = AsOfJoin.asOf(left, right, "k", "ts_ms", "id", "value")
      .select("k", "ts_ms", "id", "asof_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      ("a", 100L, 1L, Some(1.1)),   // same-ts right row visible (≤)
      ("a", 200L, 2L, Some(2.2)),   // latest of the two prior rights
      ("a", 50L, 3L, None),         // nothing at or before
      ("b", 100L, 4L, None)))       // right exists but only later
  }

  test("right-side ties resolve to the largest tiebreak, deterministically") {
    val left = df(Seq(("a", 100L, 1L, 0.0)))
    val right = df(Seq(("a", 100L, 10L, 1.0), ("a", 100L, 11L, 2.0)))
    val got = AsOfJoin.asOf(left, right, "k", "ts_ms", "id", "value")
      .select("asof_value").collect()(0).getDouble(0)
    assert(got == 2.0)
  }
}
