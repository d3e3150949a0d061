package graft

import org.apache.spark.sql.functions._
import graft.queries.StatTestQueries

/** Round-14 wave 8 — Welch's heteroscedastic ANOVA as the fifth
  * finish on anovaStats, Cliff's delta / CLES as the fourth finish on
  * the ksGrid half counts, and the rich-club coefficient over the
  * dedup topology. Closed-form planted fixtures.
  */
class Round14Wave8Spec extends SparkSpec {

  import spark.implicits._

  private def stats(rows: Seq[(String, Long, BigDecimal, BigDecimal)]) =
    rows.toDF("event_type", "n", "sv", "qv")

  // ---- Welch ANOVA -----------------------------------------------------

  test("welchFinish: identical groups score F = 0 with the exact Welch dof") {
    // two groups of {1,3}: mean 2, s² 2, w 1 each → grand 2, sa 0,
    // sb = 2·(1−½)²/1 = 0.5 → dof₂ = (k²−1)/(3·0.5) = 2
    val r = StatTestQueries.welchFinish(stats(Seq(
      ("A", 2L, BigDecimal(4), BigDecimal(10)),
      ("B", 2L, BigDecimal(4), BigDecimal(10))))).head()
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n_total") === 4L)
    assert(r.getAs[Double]("grand_mean_r") === 2.0)
    assert(r.getAs[Double]("f_w_r") === 0.0)
    assert(r.getAs[Double]("dof2_r") === 2.0)
  }

  test("welchFinish: separated equal-variance groups reproduce F by hand") {
    // A {0,2}, B {10,12}: w = 1 each, grand 6, sa = 25 + 25 → F = 50
    val r = StatTestQueries.welchFinish(stats(Seq(
      ("A", 2L, BigDecimal(2), BigDecimal(4)),
      ("B", 2L, BigDecimal(22), BigDecimal(244))))).head()
    assert(r.getAs[Double]("grand_mean_r") === 6.0)
    assert(r.getAs[Double]("f_w_r") === 50.0)
    assert(r.getAs[Double]("dof2_r") === 2.0)
  }

  test("welchFinish: n<2 and zero-variance groups are excluded") {
    // "tiny" n=1 and "flat" {5,5} (s²=0) both drop → k=1 → no F
    val r = StatTestQueries.welchFinish(stats(Seq(
      ("tiny", 1L, BigDecimal(7), BigDecimal(49)),
      ("flat", 2L, BigDecimal(10), BigDecimal(50)),
      ("ok", 2L, BigDecimal(4), BigDecimal(10))))).head()
    assert(r.getAs[Long]("k") === 1L)
    assert(r.isNullAt(r.fieldIndex("f_w_r")))
  }

  // ---- Cliff's delta ---------------------------------------------------

  test("cliffsFinish: complete dominance scores delta = 1, CLES = 1") {
    val grid = Seq(
      ("d", 1.0, 1L, 0L), ("d", 2.0, 1L, 0L),
      ("d", 3.0, 0L, 1L), ("d", 4.0, 0L, 1L))
      .toDF("event_type", "value", "cr", "cc")
    val r = StatTestQueries.cliffsFinish(grid).head()
    assert(r.getAs[Long]("gt") === 4L)
    assert(r.getAs[Long]("lt") === 0L)
    assert(r.getAs[Double]("delta_r") === 1.0)
    assert(r.getAs[Double]("cles_r") === 1.0)
  }

  test("cliffsFinish: all-tied halves score delta = 0, CLES = 0.5") {
    val grid = Seq(("t", 5.0, 2L, 2L)).toDF("event_type", "value", "cr", "cc")
    val r = StatTestQueries.cliffsFinish(grid).head()
    assert(r.getAs[Long]("ties") === 4L)
    assert(r.getAs[Double]("delta_r") === 0.0)
    assert(r.getAs[Double]("cles_r") === 0.5)
  }

  test("cliffsFinish: symmetric spread cancels to delta = 0") {
    // cur draws at 0 and 2 straddle the single ref at 1
    val grid = Seq(
      ("s", 0.0, 0L, 1L), ("s", 1.0, 1L, 0L), ("s", 2.0, 0L, 1L))
      .toDF("event_type", "value", "cr", "cc")
    val r = StatTestQueries.cliffsFinish(grid).head()
    assert(r.getAs[Long]("gt") === 1L)
    assert(r.getAs[Long]("lt") === 1L)
    assert(r.getAs[Double]("delta_r") === 0.0)
    assert(r.getAs[Double]("cles_r") === 0.5)
  }

  // ---- fixture-level sanity on the real chain ------------------------

  test("wave-8 queries run the real fixture: bounded outputs, full panel") {
    val w = SparkEntry.queries("events_welch_anova")(spark, sf).head()
    assert(w.getAs[Long]("k") === 5L)
    assert(w.getAs[Double]("f_w_r") >= 0.0)
    assert(w.getAs[Double]("dof2_r") > 0.0)
    val c = SparkEntry.queries("events_cliffs_delta")(spark, sf)
    assert(c.count() === 5)
    assert(c.filter(abs(col("delta_r")) > 1.0).count() === 0)
    assert(c.filter(col("cles_r") < 0.0 || col("cles_r") > 1.0).count() === 0)
    val rc = SparkEntry.queries("graph_rich_club")(spark, sf).collect()
    assert(rc.length === 5)
    rc.foreach { r =>
      val nk = r.getAs[Long]("n_k")
      val ek = r.getAs[Long]("e_k")
      assert(ek <= nk * (nk - 1) / 2, r.toString)
      if (!r.isNullAt(r.fieldIndex("phi_r"))) {
        val phi = r.getAs[Double]("phi_r")
        assert(phi >= 0.0 && phi <= 1.0)
      }
    }
    // the club is nested: raising k can only shrink it
    val nks = rc.sortBy(_.getAs[Long]("k")).map(_.getAs[Long]("n_k"))
    assert(nks.zip(nks.tail).forall { case (a, b) => b <= a })
  }
}
