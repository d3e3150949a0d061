package graft

import org.apache.spark.sql.functions._
import graft.queries.{StatTestQueries, TextQueries}

/** Round-14 wave 10 — restricted mean survival time as the fourth
  * finish on the death/censor grid, and Church-Gale token burstiness
  * over per-doc counts. Closed-form planted fixtures.
  */
class Round14Wave10Spec extends SparkSpec {

  import spark.implicits._

  // ---- RMST ------------------------------------------------------------

  test("rmstFinish: KM area closed forms (immediate death, censor-only, step)") {
    val grid = Seq(
      ("z", 0L, 5L, 0L),                      // everyone dies at 0 → 0
      ("c", 100L, 0L, 5L),                    // censor-only → full tau
      ("h", 10L, 1L, 1L),                     // half die at 10 → 10 + .5·158
      ("s", 10L, 1L, 0L), ("s", 20L, 1L, 0L)) // step → 10 + .5·10
      .toDF("event_type", "dur_h", "deaths", "censors")
    val out = StatTestQueries.rmstFinish(grid).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("z").getAs[Double]("rmst_r") === 0.0)
    assert(out("c").getAs[Double]("rmst_r") === 168.0)
    assert(out("h").getAs[Double]("rmst_r") === 10.0 + 0.5 * 158.0)
    assert(out("s").getAs[Double]("rmst_r") === 15.0)
    assert(out("s").getAs[Long]("n_users") === 2L)
    assert(out("c").getAs[Long]("tau_h") === 168L)
  }

  test("rmstFinish: durations beyond tau contribute nothing") {
    // death at 200 h > tau: curve is 1 on [0, 168] regardless
    val grid = Seq(("far", 200L, 3L, 0L))
      .toDF("event_type", "dur_h", "deaths", "censors")
    assert(StatTestQueries.rmstFinish(grid).head()
      .getAs[Double]("rmst_r") === 168.0)
  }

  // ---- burstiness -------------------------------------------------------

  test("burstinessFinish: Poisson-flat scores 0, bursty token scores high") {
    val docTok = (
      (1L to 5L).map(d => ("flat", d, 1L)) ++
      Seq(("bursty", 1L, 5L)) ++ (2L to 5L).map(d => ("bursty", d, 1L)) ++
      Seq(("rare", 1L, 9L), ("rare", 2L, 9L))) // df 2 < 5 → filtered
      .toDF("tok", "doc_id", "c")
    val n = Seq(Tuple1(5L)).toDF("n_docs")
    val out = TextQueries.burstinessFinish(docTok, n).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("rare"))
    assert(out("flat").getAs[Double]("vmr_r") === 0.0)
    // tf=9, sc2=29, N=5 → 29/9 − 9/5
    assert(math.abs(out("bursty").getAs[Double]("vmr_r")
      - (29.0 / 9.0 - 9.0 / 5.0)) < 1e-6)
    assert(out("bursty").getAs[Long]("df") === 5L)
    assert(out("bursty").getAs[Long]("tf") === 9L)
  }

  // ---- fixture-level sanity on the real chain ------------------------

  test("wave-10 queries run the real fixture: bounded outputs") {
    val r = SparkEntry.queries("events_rmst")(spark, sf)
    assert(r.count() === 5)
    assert(r.filter(col("rmst_r") < 0.0 || col("rmst_r") > 168.0)
      .count() === 0)
    val b = SparkEntry.queries("text_burstiness")(spark, sf)
    val n = b.count()
    assert(n > 0 && n <= 30)
    assert(b.filter(col("vmr_r").isNull).count() === 0)
  }
}
