package graft

import org.apache.spark.sql.functions._
import graft.queries.StatTestQueries

/** Round-14 wave 11 — the exact paired sign test (hour-of-day pairs
  * across the PSI halves, decimal cross-product comparisons) and the
  * Hopkins clusterability statistic.
  */
class Round14Wave11Spec extends SparkSpec {

  import spark.implicits._

  private def cells(rows: Seq[(String, Long, String, BigDecimal, Long)]) =
    rows.toDF("event_type", "hod", "half", "sv", "cnt")

  test("signFinish: consistent uplift fires, z = 6/sqrt(6)") {
    val c = cells((0L until 6L).flatMap(h => Seq(
      ("up", h, "ref", BigDecimal(1), 1L),
      ("up", h, "cur", BigDecimal(2), 1L))))
    val r = StatTestQueries.signFinish(c).head()
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("s_plus") === 6L)
    assert(r.getAs[Long]("s_minus") === 0L)
    assert(math.abs(r.getAs[Double]("z_r") - 6.0 / math.sqrt(6.0)) < 1e-6)
    assert(r.getAs[Boolean]("is_sig")) // 2.449 > 1.96
  }

  test("signFinish: equal means under different counts tie EXACTLY") {
    // ref mean 1 from (2, 2), cur mean 1 from (3, 3): cross products
    // 2·3 = 3·2 — a division would round; the decimal products don't
    val c = cells(Seq(
      ("t", 0L, "ref", BigDecimal(2), 2L),
      ("t", 0L, "cur", BigDecimal(3), 3L),
      ("t", 1L, "ref", BigDecimal(1), 1L),
      ("t", 1L, "cur", BigDecimal(5), 2L))) // 5/2 > 1 → one plus
    val r = StatTestQueries.signFinish(c).head()
    assert(r.getAs[Long]("ties") === 1L)
    assert(r.getAs[Long]("s_plus") === 1L)
    assert(!r.getAs[Boolean]("is_sig"))
  }

  test("signFinish: hours present in only one half do not pair") {
    val c = cells(Seq(
      ("o", 0L, "ref", BigDecimal(1), 1L), // no cur partner
      ("o", 1L, "cur", BigDecimal(1), 1L), // no ref partner
      ("o", 2L, "ref", BigDecimal(1), 1L),
      ("o", 2L, "cur", BigDecimal(9), 1L)))
    val r = StatTestQueries.signFinish(c).head()
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Long]("s_plus") === 1L)
  }

  // ---- fixture-level sanity on the real chain ------------------------

  test("wave-11 queries run the real fixture: bounded outputs") {
    val st = SparkEntry.queries("events_sign_test")(spark, sf)
    assert(st.count() === 5)
    assert(st.filter(col("s_plus") + col("s_minus") + col("ties")
      =!= col("n_pairs")).count() === 0)
    val h = SparkEntry.queries("emb_hopkins")(spark, sf).head()
    assert(h.getAs[Long]("m") === 32L)
    assert(h.getAs[Double]("sum_u_r") >= 0.0)
    assert(h.getAs[Double]("sum_w_r") >= 0.0)
    val hop = h.getAs[Double]("hopkins_r")
    assert(hop > 0.0 && hop < 1.0)
  }
}
