package graft

import org.apache.spark.sql.functions._
import graft.queries.StatTestQueries

/** Round-14 wave 6 — Mantel-Haenszel pooled 2×2s over the PSI-half
  * strata, Kendall τ-b on the contingency grid (cell-pair
  * concordance, never an observation-pair scan), and the Hill tail
  * index by count arithmetic on the activity frequency grid. Each
  * pinned on a planted fixture with a hand-computable closed form.
  */
class Round14Wave6Spec extends SparkSpec {

  import spark.implicits._

  // ---- Mantel-Haenszel ------------------------------------------------

  test("mhFinish: single balanced stratum reproduces the plain 2x2 OR") {
    // a=6 b=2 c=2 d=6, n=16: R=36/16, S=4/16 → OR=9; E=4, V=4096/3840
    val cells = (
      Seq.fill(6)(("ref", 1L, "u", 1L)) ++ Seq.fill(2)(("ref", 1L, "u", 0L)) ++
      Seq.fill(2)(("ref", 0L, "u", 1L)) ++ Seq.fill(6)(("ref", 0L, "u", 0L)))
      .zipWithIndex.map { case ((h, v, _, c), i) => (h, v, s"u$i", c) }
      .toDF("half", "variant", "user_id", "conv")
    val r = StatTestQueries.mhFinish(cells).head()
    assert(r.getAs[Long]("k_strata") === 1L)
    assert(r.getAs[Long]("a_tot") === 6L)
    assert(r.getAs[Double]("e_r") === 4.0)
    assert(r.getAs[Double]("or_mh_r") === 9.0)
    assert(math.abs(r.getAs[Double]("chi2_r") - 3.75) < 1e-5)
    assert(!r.getAs[Boolean]("is_sig")) // 3.75 < 3.841459
  }

  test("mhFinish: pooling two identical strata doubles the evidence") {
    val one = (
      Seq.fill(6)((1L, 1L)) ++ Seq.fill(2)((1L, 0L)) ++
      Seq.fill(2)((0L, 1L)) ++ Seq.fill(6)((0L, 0L)))
    val cells = (one.map(("ref", _)) ++ one.map(("cur", _)))
      .zipWithIndex.map { case ((h, (v, c)), i) => (h, v, s"u$i", c) }
      .toDF("half", "variant", "user_id", "conv")
    val r = StatTestQueries.mhFinish(cells).head()
    assert(r.getAs[Long]("k_strata") === 2L)
    assert(r.getAs[Long]("a_tot") === 12L)
    assert(r.getAs[Double]("e_r") === 8.0)
    // OR unchanged (both strata agree), chi2 = 16/2.133... = 7.5 → sig
    assert(r.getAs[Double]("or_mh_r") === 9.0)
    assert(math.abs(r.getAs[Double]("chi2_r") - 7.5) < 1e-5)
    assert(r.getAs[Boolean]("is_sig"))
  }

  test("mhFinish: n<=1 strata are excluded from the pool") {
    val cells = Seq(
      ("tiny", 1L, "solo", 1L), // n=1 stratum → dropped
      ("ref", 1L, "a", 1L), ("ref", 1L, "b", 0L),
      ("ref", 0L, "c", 1L), ("ref", 0L, "d", 0L))
      .toDF("half", "variant", "user_id", "conv")
    val r = StatTestQueries.mhFinish(cells).head()
    assert(r.getAs[Long]("k_strata") === 1L)
    assert(r.getAs[Long]("a_tot") === 1L)
  }

  // ---- Kendall τ-b ----------------------------------------------------

  test("kendallFinish: perfect concordance/discordance score tau = ±1") {
    val cells = Seq(
      ("up", 0L, 0L, 1L), ("up", 1L, 1L, 1L), ("up", 2L, 2L, 1L),
      ("dn", 0L, 2L, 1L), ("dn", 1L, 1L, 1L), ("dn", 2L, 0L, 1L))
      .toDF("event_type", "vb", "hb", "o")
    val out = StatTestQueries.kendallFinish(cells).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("up").getAs[Long]("conc") === 3L)
    assert(out("up").getAs[Long]("disc") === 0L)
    assert(out("up").getAs[Double]("tau_b_r") === 1.0)
    assert(out("dn").getAs[Double]("tau_b_r") === -1.0)
  }

  test("kendallFinish: tie corrections come from the marginals") {
    // two cells of 2: C=4, n0₂=12, tie terms 4/4 → tau_b = 8/8 = 1
    val cells = Seq(("t", 0L, 0L, 2L), ("t", 1L, 1L, 2L))
      .toDF("event_type", "vb", "hb", "o")
    val r = StatTestQueries.kendallFinish(cells).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("conc") === 4L)
    assert(r.getAs[Double]("tau_b_r") === 1.0)
  }

  test("kendallFinish: a single-bucket axis yields null tau, zero pairs") {
    val cells = Seq(("s", 0L, 0L, 1L), ("s", 0L, 1L, 1L))
      .toDF("event_type", "vb", "hb", "o")
    val r = StatTestQueries.kendallFinish(cells).head()
    assert(r.getAs[Long]("conc") === 0L)
    assert(r.getAs[Long]("disc") === 0L)
    assert(r.isNullAt(r.fieldIndex("tau_b_r")))
  }

  // ---- Hill tail index ------------------------------------------------

  test("hillFinish: two-level grid gives alpha = k / (25·ln(x_top/x_k1))") {
    // 25 users at x=4, 10 at x=2: s = 25·(ln4 − ln2) = 25·ln2
    val grid = Seq(("h", 4L, 25L), ("h", 2L, 10L))
      .toDF("event_type", "x", "cnt")
    val r = StatTestQueries.hillFinish(grid).head()
    assert(r.getAs[Long]("n_users") === 35L)
    assert(r.getAs[Long]("x_k1") === 2L)
    assert(math.abs(r.getAs[Double]("alpha_r") - 1.0 / math.log(2.0)) < 1e-6)
  }

  test("hillFinish: a grid row straddling rank k contributes partially") {
    // 20 at x=5, 10 at x=3 (5 of them inside top-25), 5 at x=1:
    // s = 20·ln5 + 5·ln3 − 25·ln3 = 20·ln(5/3)
    val grid = Seq(("h2", 5L, 20L), ("h2", 3L, 10L), ("h2", 1L, 5L))
      .toDF("event_type", "x", "cnt")
    val r = StatTestQueries.hillFinish(grid).head()
    assert(r.getAs[Long]("x_k1") === 3L)
    val expect = 25.0 / (20.0 * (math.log(5.0) - math.log(3.0)))
    assert(math.abs(r.getAs[Double]("alpha_r") - expect) < 1e-6)
  }

  test("hillFinish: degenerate tails are null, never a division blowup") {
    val grid = Seq(
      ("lo", 7L, 10L),   // n_users < k+1 → no x_k1, alpha null
      ("flat", 2L, 30L)) // top-25 all equal x_k1 → s = 0 → alpha null
      .toDF("event_type", "x", "cnt")
    val out = StatTestQueries.hillFinish(grid).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("lo").isNullAt(out("lo").fieldIndex("x_k1")))
    assert(out("lo").isNullAt(out("lo").fieldIndex("alpha_r")))
    assert(out("flat").getAs[Long]("x_k1") === 2L)
    assert(out("flat").isNullAt(out("flat").fieldIndex("alpha_r")))
  }

  // ---- fixture-level sanity on the real chain ------------------------

  test("wave-6 queries run the real fixture: bounded outputs, full panel") {
    val mh = SparkEntry.queries("events_mantel_haenszel")(spark, sf).head()
    assert(mh.getAs[Long]("k_strata") === 2L) // both PSI halves populated
    assert(mh.getAs[Double]("or_mh_r") > 0.0)
    assert(mh.getAs[Double]("var_r") > 0.0)
    val kt = SparkEntry.queries("events_kendall_tau")(spark, sf)
    assert(kt.count() === 5)
    assert(kt.filter(abs(col("tau_b_r")) > 1.0).count() === 0)
    val hill = SparkEntry.queries("events_hill_tail")(spark, sf)
    assert(hill.count() === 5)
    assert(hill.filter(col("alpha_r") <= 0.0).count() === 0)
  }
}
