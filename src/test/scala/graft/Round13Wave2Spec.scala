package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, SimilarityQueries, StatTestQueries, TextQueries}

/** Round-13 wave-2 pins: Gini endpoints, Page-Hinkley on planted
  * flat/step series, Nelson-Aalen on a hand-computable grid, lexical
  * diversity on planted vocabularies, packing-report invariants, and
  * the hier-scaled kNN graph's structure.
  */
class Round13Wave2Spec extends SparkSpec {

  import spark.implicits._

  test("giniFinish: equal shares -> 0, one-user-has-all -> (n-1)/n") {
    val equal = (1L to 8L).map(u => (u, java.math.BigDecimal.valueOf(25000, 4)))
      .toDF("user_id", "x")
    val g0 = EventQueries.giniFinish(equal).head()
    assert(g0.getAs[Double]("gini_r") == 0.0 && g0.getAs[Long]("n_users") == 8L)
    // x = (0, 0, ..., total): G = 2*n*total/(n*total) - (n+1)/n = (n-1)/n
    val all = ((1L to 7L).map(u => (u, java.math.BigDecimal.valueOf(0, 4))) :+
      (8L, java.math.BigDecimal.valueOf(1000000, 4))).toDF("user_id", "x")
    val g1 = EventQueries.giniFinish(all).head()
    assert(math.abs(g1.getAs[Double]("gini_r") - 7.0 / 8.0) < 1e-9)
  }

  test("pageHinkleyOver: flat series stays quiet, step-up series alarms") {
    def series(tp: String, ys: Seq[Double]) = ys.zipWithIndex.map {
      case (y, i) => (tp, i.toLong * 3600000L,
        java.math.BigDecimal.valueOf(math.round(y * 1e9), 9))
    }
    val flat = series("flat", Seq.fill(50)(10.0))
    // 30 quiet hours then a +3 level shift: m accumulates ~ +3/hr
    val step = series("step", Seq.fill(30)(10.0) ++ Seq.fill(40)(13.0))
    val out = EventQueries.pageHinkleyOver(
        (flat ++ step).toDF("event_type", "hour_ms", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getAs[Any]("first_alarm_hour_ms") == null)
    assert(out("flat").getAs[Double]("max_ph_r") < EventQueries.PhLambda)
    assert(out("step").getAs[Any]("first_alarm_hour_ms") != null)
    assert(out("step").getAs[Double]("max_ph_r") > EventQueries.PhLambda)
  }

  test("hazardFinish: hand-computed Nelson-Aalen ladder") {
    // one type, grid: dur 0 -> 2 deaths / 0 censors of 10 at risk,
    // dur 1 -> 3 deaths / 1 censor of 8, dur 2 -> 1 death / 3 censors of 4
    val grid = Seq(
      ("t", 0L, 2L, 0L), ("t", 1L, 3L, 1L), ("t", 2L, 1L, 3L))
      .toDF("event_type", "dur_h", "deaths", "censors")
    val rows = StatTestQueries.hazardFinish(grid)
      .orderBy(col("dur_h")).collect()
    val h = rows.map(_.getAs[Double]("cum_hazard_r"))
    assert(math.abs(h(0) - 0.2) < 1e-6)            // 2/10
    assert(math.abs(h(1) - (0.2 + 3.0 / 8)) < 1e-6)
    assert(math.abs(h(2) - (0.2 + 3.0 / 8 + 0.25)) < 1e-6)
    assert(rows.map(_.getAs[Long]("n_risk")).sameElements(Array(10L, 8L, 4L)))
  }

  test("lexdivFinish: planted all-unique and all-repeated vocabularies") {
    val cells = Seq(
      // src A: 4 tokens all distinct -> ttr 1, hapax share 1
      ("A", "w1", 1L), ("A", "w2", 1L), ("A", "w3", 1L), ("A", "w4", 1L),
      // src B: one token 10 times -> ttr 0.1, hapax share 0
      ("B", "w1", 10L)).toDF("source", "tok", "cnt")
    val out = TextQueries.lexdivFinish(cells)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("ttr_r") == 1.0 &&
           out("A").getAs[Double]("hapax_ratio_r") == 1.0)
    assert(out("B").getAs[Double]("ttr_r") == 0.1 &&
           out("B").getAs[Double]("hapax_ratio_r") == 0.0)
  }

  test("pipeline_pack_efficiency invariants over the real fixture") {
    val eff = graft.queries.DedupQueries.queries("pipeline_pack_efficiency")(
      spark, sf).persist()
    try {
      assert(eff.count() > 0)
      assert(eff.filter(col("util_r") <= 0.0 || col("util_r") > 1.0).count() == 0)
      // concat-then-chunk wastes only the final partial pack
      assert(eff.filter(col("tail_waste") < 0 ||
        col("tail_waste") >= graft.queries.DedupQueries.PackBudget).count() == 0)
      assert(eff.filter(col("straddlers") > col("n_docs")).count() == 0)
      // the ceil identity (ADVICE r13): n_packs counts EVERY pack the
      // token stream occupies, including tail packs a straddling final
      // doc spills into — (n_packs-1)·B < total ≤ n_packs·B, exactly
      val b = graft.queries.DedupQueries.PackBudget
      assert(eff.filter(
        col("n_packs") * b < col("total_tokens") ||
        (col("n_packs") - 1) * b >= col("total_tokens")).count() == 0)
    } finally { eff.unpersist(); () }
  }

  test("hhiFinish: uniform shares -> 1/n, monopoly -> 1") {
    val equal = (1L to 8L).map(u => (u, java.math.BigDecimal.valueOf(25000, 4)))
      .toDF("user_id", "x")
    val h0 = EventQueries.hhiFinish(equal).head()
    assert(math.abs(h0.getAs[Double]("hhi_r") - 0.125) < 1e-9)
    assert(math.abs(h0.getAs[Double]("eff_n_r") - 8.0) < 1e-6)
    val mono = Seq((1L, java.math.BigDecimal.valueOf(1000000, 4)))
      .toDF("user_id", "x")
    val h1 = EventQueries.hhiFinish(mono).head()
    assert(h1.getAs[Double]("hhi_r") == 1.0 &&
           h1.getAs[Double]("eff_n_r") == 1.0)
  }

  test("crFinish: hand-computed Chapman estimate") {
    // 3 users in A only, 2 in B only, 5 in both (per one type):
    // n1=8, n2=7, m=5, N̂ = 9*8/6 - 1 = 11; n_true = 10
    val cells =
      ((1L to 3L).map(u => ("t", u, 0L)) ++
       (4L to 5L).map(u => ("t", u, 1L)) ++
       (6L to 10L).flatMap(u => Seq(("t", u, 0L), ("t", u, 1L))))
        .toDF("event_type", "user_id", "half")
    val r = graft.queries.EventQueries.crFinish(cells).head()
    assert(r.getAs[Long]("n1") == 8L && r.getAs[Long]("n2") == 7L &&
      r.getAs[Long]("m") == 5L && r.getAs[Long]("n_true") == 10L)
    assert(math.abs(r.getAs[Double]("chapman_r") - 11.0) < 1e-9)
  }

  test("orFinish: hand-computed 2x2 odds ratio and CI coverage") {
    // a=20 b=30 (treatment), c=10 d=40 (control): OR = 20*40/(30*10) = 8/3
    val cells =
      ((1L to 20L).map(u => (1L, u, 1L)) ++ (21L to 50L).map(u => (1L, u, 0L)) ++
       (51L to 60L).map(u => (0L, u, 1L)) ++ (61L to 100L).map(u => (0L, u, 0L)))
        .toDF("variant", "user_id", "conv")
    val r = graft.queries.EventQueries.orFinish(cells).head()
    val or = r.getAs[Double]("odds_ratio_r")
    assert(math.abs(or - 8.0 / 3.0) < 1e-6)
    assert(r.getAs[Double]("ci_lo_r") < or && or < r.getAs[Double]("ci_hi_r"))
    assert(r.getAs[Double]("ci_lo_r") > 0.0)
  }

  test("emb_knn_graph_hier_scaled: contiguous ranks, no self-edges") {
    val g = SimilarityQueries.queries("emb_knn_graph_hier_scaled")(spark, sf)
      .persist()
    try {
      assert(g.count() > 0)
      assert(g.filter(col("src") === col("dst")).count() == 0)
      val bad = g.groupBy(col("src"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
          min(col("rank")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("n") > 5)
      assert(bad.count() == 0, "rank sequence not contiguous from 1")
    } finally { g.unpersist(); () }
  }
}
