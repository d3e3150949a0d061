package graft

import org.apache.spark.sql.functions._
import graft.queries.StatTestQueries

/** Round-14 wave 5 — the fourth finishes on already-proven state
  * classes: Wasserstein-1 on the KS half-count grid, one-vs-rest
  * log-rank on the survival death/censor grid, Cramér's V and
  * Theil's U on the χ² contingency cells. Each pinned on a planted
  * fixture with a hand-computable closed form.
  */
class Round14Wave5Spec extends SparkSpec {

  import spark.implicits._

  // ---- Wasserstein-1 -------------------------------------------------

  test("wassersteinFinish: unit mass shift costs exactly 1, identity costs 0") {
    val grid = Seq(
      // ref all at 0, cur all at 1 → W1 = 1
      ("unit", 0.0, 5L, 0L), ("unit", 1.0, 0L, 5L),
      // identical halves → W1 = 0
      ("same", 0.0, 3L, 3L), ("same", 1.0, 2L, 2L))
      .toDF("event_type", "value", "cr", "cc")
    val out = StatTestQueries.wassersteinFinish(grid).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1_r")).toMap
    assert(out("unit") === 1.0)
    assert(out("same") === 0.0)
  }

  test("wassersteinFinish: segment integral weights the CDF gap by value span") {
    // ref at 0 (2), cur at 10 (2): gap 1 over span 10 → W1 = 10
    val grid = Seq(("w", 0.0, 2L, 0L), ("w", 10.0, 0L, 2L))
      .toDF("event_type", "value", "cr", "cc")
    val w1 = StatTestQueries.wassersteinFinish(grid).head().getAs[Double]("w1_r")
    assert(w1 === 10.0)
  }

  // ---- log-rank ------------------------------------------------------

  test("logrankFinish: identical groups score chi2 = 0, separated groups fire") {
    val same = Seq(
      ("A", 0L, 2L, 0L), ("A", 1L, 3L, 0L),
      ("B", 0L, 2L, 0L), ("B", 1L, 3L, 0L))
      .toDF("event_type", "dur_h", "deaths", "censors")
    val outSame = StatTestQueries.logrankFinish(same).collect()
    outSame.foreach { r =>
      assert(r.getAs[Double]("chi2_r") === 0.0, r.toString)
      assert(!r.getAs[Boolean]("is_sig"))
      assert(r.getAs[Long]("o_events") === 5L)
      assert(r.getAs[Double]("e_r") === 5.0)
    }
    // A dies at 0, B at 10: O_A = 5, E_A = 2.5,
    // V = 5·0.5·0.5·(10−5)/9 ≈ 0.694444 → chi2 = 6.25/0.694444 = 9.0
    val split = Seq(("A", 0L, 5L, 0L), ("B", 10L, 5L, 0L))
      .toDF("event_type", "dur_h", "deaths", "censors")
    val outSplit = StatTestQueries.logrankFinish(split).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(outSplit("A").getAs[Double]("chi2_r") === 9.0)
    assert(outSplit("A").getAs[Boolean]("is_sig"))
    assert(outSplit("B").getAs[Boolean]("is_sig"))
  }

  test("logrankFinish: censoring removes from risk without counting as event") {
    // A: 3 deaths at 0, 2 censored at 0; B: 5 deaths at 5.
    // dur 0: d_tot = 3, n_A = 5, n_B = 5 → E_A += 1.5
    // dur 5: d_tot = 5, n_A = 0, n_B = 5 → E_A += 0
    val g = Seq(("A", 0L, 3L, 2L), ("B", 5L, 5L, 0L))
      .toDF("event_type", "dur_h", "deaths", "censors")
    val a = StatTestQueries.logrankFinish(g).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(a("A").getAs[Long]("o_events") === 3L)
    assert(a("A").getAs[Double]("e_r") === 1.5)
  }

  // ---- Cramér's V ----------------------------------------------------

  test("cramersVFinish: perfect two-type association scores V = 1") {
    val cells = Seq(("A", 0L, 10L), ("B", 1L, 10L))
      .toDF("event_type", "bucket", "o")
    val r = StatTestQueries.cramersVFinish(cells).head()
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Double]("chi2_r") === 20.0)
    assert(r.getAs[Double]("v_r") === 1.0)
  }

  test("cramersVFinish: exact independence scores V = 0") {
    val cells = Seq(
      ("A", 0L, 4L), ("A", 1L, 4L),
      ("B", 0L, 2L), ("B", 1L, 2L))
      .toDF("event_type", "bucket", "o")
    val r = StatTestQueries.cramersVFinish(cells).head()
    assert(r.getAs[Double]("chi2_r") === 0.0)
    assert(r.getAs[Double]("v_r") === 0.0)
  }

  // ---- Theil's U -----------------------------------------------------

  test("theilsUFinish: deterministic mapping scores U = 1, independence U = 0") {
    val det = Seq(("A", 0L, 10L), ("B", 1L, 10L))
      .toDF("event_type", "bucket", "o")
    assert(StatTestQueries.theilsUFinish(det).head().getAs[Double]("u_r") === 1.0)
    val indep = Seq(
      ("A", 0L, 4L), ("A", 1L, 4L),
      ("B", 0L, 2L), ("B", 1L, 2L))
      .toDF("event_type", "bucket", "o")
    val r = StatTestQueries.theilsUFinish(indep).head()
    assert(r.getAs[Double]("u_r") === 0.0)
    // H(B) = ln 2 on the 50/50 bucket margin
    assert(math.abs(r.getAs[Double]("hb_r") - math.log(2.0)) < 1e-6)
  }

  // ---- fixture-level sanity on the real chain ------------------------

  test("wave-5 queries run the real fixture: bounded outputs, full panel") {
    val w1 = SparkEntry.queries("events_wasserstein")(spark, sf)
    assert(w1.filter(col("w1_r") < 0.0).count() === 0)
    assert(w1.count() === 5)
    val lr = SparkEntry.queries("events_logrank")(spark, sf)
    assert(lr.count() === 5)
    // one-vs-rest expectations conserve events: Σ O = Σ E (up to the
    // 9-dp per-term quantization × lattice size)
    val sums = lr.agg(sum(col("o_events")).cast("double").as("o"),
      sum(col("e_r")).as("e")).head()
    assert(math.abs(sums.getDouble(0) - sums.getDouble(1)) < 1e-3)
    val v = SparkEntry.queries("events_cramers_v")(spark, sf).head()
    assert(v.getAs[Double]("v_r") >= 0.0 && v.getAs[Double]("v_r") <= 1.0)
    val u = SparkEntry.queries("events_theils_u")(spark, sf).head()
    assert(u.getAs[Double]("u_r") >= 0.0 && u.getAs[Double]("u_r") <= 1.0)
  }
}
