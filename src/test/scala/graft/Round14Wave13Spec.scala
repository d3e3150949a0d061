package graft

import org.apache.spark.sql.functions._
import graft.queries.StatTestQueries

/** Round-14 wave 13 — Gumbel extreme-value fit over daily block
  * maxima (method of moments), with its max-merge streaming twin.
  */
class Round14Wave13Spec extends SparkSpec {

  import spark.implicits._

  test("gumbelFinish: two-block closed form (mean 1, var 2)") {
    val cells = Seq(("g", 0L, BigDecimal(0)), ("g", 1L, BigDecimal(2)))
      .toDF("event_type", "day", "mx")
    val r = StatTestQueries.gumbelFinish(cells).head()
    assert(r.getAs[Long]("n_blocks") === 2L)
    assert(r.getAs[Double]("mean_max_r") === 1.0)
    val beta = math.sqrt(2.0) * math.sqrt(6.0) / math.Pi
    val mu = 1.0 - 0.5772156649 * beta
    assert(math.abs(r.getAs[Double]("beta_r") - beta) < 1e-6)
    assert(math.abs(r.getAs[Double]("mu_r") - mu) < 1e-6)
    assert(math.abs(r.getAs[Double]("ret100_r")
      - (mu - beta * math.log(-math.log(0.99)))) < 1e-6)
    // the 100-block return level sits far above the block mean
    assert(r.getAs[Double]("ret100_r") > r.getAs[Double]("mean_max_r"))
  }

  test("gumbelFinish: degenerate block sets yield null fits") {
    val cells = Seq(
      ("one", 0L, BigDecimal(5)),                      // single block
      ("flat", 0L, BigDecimal(3)), ("flat", 1L, BigDecimal(3))) // var 0
      .toDF("event_type", "day", "mx")
    val out = StatTestQueries.gumbelFinish(cells).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("one").isNullAt(out("one").fieldIndex("beta_r")))
    assert(out("flat").isNullAt(out("flat").fieldIndex("beta_r")))
    assert(out("flat").getAs[Double]("mean_max_r") === 3.0)
  }

  test("gumbelCells: daily maxima are exact decimal max-merge state") {
    val e = Seq(
      ("a", 0L, 1.5), ("a", 3600000L, 9.25), // same day → max 9.25
      ("a", 90000000L, 2.0))                 // next day
      .toDF("event_type", "ts_ms", "value")
    val cells = StatTestQueries.gumbelCells(e).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDecimal(2)).toMap
    assert(cells(("a", 0L)).doubleValue() === 9.25)
    assert(cells(("a", 1L)).doubleValue() === 2.0)
  }

  // ---- shape moments ---------------------------------------------------

  test("momentsFinish: symmetric two-point mass has skew 0, kurtosis −2") {
    // values {0, 2}·n: m2 = 1, m3 = 0, m4 = 1 → g1 = 0, g2 = −2
    val e = (1L to 10L).flatMap(i => Seq(("s", 0.0), ("s", 2.0)))
      .toDF("event_type", "value")
    val r = StatTestQueries.momentsFinish(StatTestQueries.momentCells(e))
      .head()
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Double]("mean_r") === 1.0)
    assert(r.getAs[Double]("std_r") === 1.0)
    assert(r.getAs[Double]("skew_r") === 0.0)
    assert(r.getAs[Double]("kurtosis_r") === -2.0)
  }

  test("momentsFinish: a right tail pulls skewness positive") {
    // {0,0,0,9}: mu=2.25, right-skewed
    val e = Seq(("t", 0.0), ("t", 0.0), ("t", 0.0), ("t", 9.0))
      .toDF("event_type", "value")
    val r = StatTestQueries.momentsFinish(StatTestQueries.momentCells(e))
      .head()
    assert(r.getAs[Double]("skew_r") > 1.0)
    // constant values → null shape
    val flat = Seq(("f", 5.0), ("f", 5.0)).toDF("event_type", "value")
    val rf = StatTestQueries.momentsFinish(StatTestQueries.momentCells(flat))
      .head()
    assert(rf.isNullAt(rf.fieldIndex("skew_r")))
  }

  // ---- Bowley skewness ---------------------------------------------------

  test("bowleyFinish: asymmetric quartiles score the closed form") {
    // {0,1,4}: Q1=0, Q2=1, Q3=4 → B = (0+4−2)/4 = 0.5
    val g = Seq(("b", 0.0, 1L), ("b", 1.0, 1L), ("b", 4.0, 1L),
      // symmetric {1,2,3}: B = 0
      ("s", 1.0, 1L), ("s", 2.0, 1L), ("s", 3.0, 1L),
      // constant → IQR 0 → null
      ("f", 7.0, 5L))
      .toDF("event_type", "value", "cnt")
    val out = StatTestQueries.bowleyFinish(g).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("b").getAs[Double]("q1_r") === 0.0)
    assert(out("b").getAs[Double]("q3_r") === 4.0)
    assert(out("b").getAs[Double]("bowley_r") === 0.5)
    assert(out("s").getAs[Double]("bowley_r") === 0.0)
    assert(out("f").isNullAt(out("f").fieldIndex("bowley_r")))
  }

  test("wave-13 queries run the real fixture: bounded outputs") {
    val g = SparkEntry.queries("events_gumbel_maxima")(spark, sf)
    assert(g.count() === 5)
    assert(g.filter(col("beta_r") <= 0.0).count() === 0)
    assert(g.filter(col("ret100_r") <= col("mean_max_r")).count() === 0)
    val m = SparkEntry.queries("events_moments")(spark, sf)
    assert(m.count() === 5)
    assert(m.filter(col("std_r") <= 0.0).count() === 0)
    // a sane distribution cannot beat the kurtosis lower bound
    assert(m.filter(col("kurtosis_r") < col("skew_r") * col("skew_r") - 2.0)
      .count() === 0)
    val b = SparkEntry.queries("events_bowley_skew")(spark, sf)
    assert(b.count() === 5)
    assert(b.filter(abs(col("bowley_r")) > 1.0).count() === 0)
    assert(b.filter(col("q1_r") > col("q2_r") || col("q2_r") > col("q3_r"))
      .count() === 0)
  }
}
