package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, SimilarityQueries, StatTestQueries, TextQueries}

/** Round-14 wave 7 — entropy-family inequality (Theil T / MLD /
  * Atkinson) as the fourth finish on the gini per-user state, Chao1
  * richness as the fourth finish on the lexdiv cells, and Mood's
  * median test on the (type, value) count grid. Closed-form planted
  * fixtures throughout.
  */
class Round14Wave7Spec extends SparkSpec {

  import spark.implicits._

  // ---- Theil / MLD / Atkinson ----------------------------------------

  test("inequalityFinish: perfect equality scores zero on all three") {
    val u = Seq.tabulate(4)(i => (s"u$i", BigDecimal(5))).toDF("user_id", "x")
    val r = EventQueries.inequalityFinish(u).head()
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Double]("theil_t_r") === 0.0)
    assert(r.getAs[Double]("mld_r") === 0.0)
    assert(r.getAs[Double]("atkinson_r") === 0.0)
  }

  test("inequalityFinish: {1,4} closed forms (geomean 2, mean 2.5)") {
    val u = Seq(("a", BigDecimal(1)), ("b", BigDecimal(4))).toDF("user_id", "x")
    val r = EventQueries.inequalityFinish(u).head()
    // T = (4·ln4)/5 − ln 2.5 ; L = ln(2.5/2) ; A = 1 − 2/2.5 = 0.2
    assert(math.abs(r.getAs[Double]("theil_t_r")
      - (4.0 * math.log(4.0) / 5.0 - math.log(2.5))) < 1e-6)
    assert(math.abs(r.getAs[Double]("mld_r") - math.log(1.25)) < 1e-6)
    assert(r.getAs[Double]("atkinson_r") === 0.2)
  }

  test("inequalityFinish: non-positive totals are outside the ln domain") {
    val u = Seq(("a", BigDecimal(1)), ("b", BigDecimal(4)),
      ("z", BigDecimal(0))).toDF("user_id", "x")
    assert(EventQueries.inequalityFinish(u).head().getAs[Long]("n_users") === 2L)
  }

  // ---- Chao1 ----------------------------------------------------------

  test("chao1Finish: bias-corrected singleton/doubleton estimate") {
    val cells = Seq(
      ("a", "t1", 1L), ("a", "t2", 1L), ("a", "t3", 1L),
      ("a", "t4", 2L), ("a", "t5", 2L), ("a", "t6", 3L),
      ("b", "t1", 2L), ("b", "t2", 3L))
      .toDF("source", "tok", "cnt")
    val out = TextQueries.chao1Finish(cells).collect()
      .map(r => r.getString(0) -> r).toMap
    // a: V=6, f1=3, f2=2 → chao1 = 6 + 3·2/(2·3) = 7
    assert(out("a").getAs[Long]("vocab") === 6L)
    assert(out("a").getAs[Double]("chao1_r") === 7.0)
    assert(out("a").getAs[Double]("unseen_r") === 1.0)
    // b: no singletons → nothing unseen implied
    assert(out("b").getAs[Double]("chao1_r") === 2.0)
    assert(out("b").getAs[Double]("unseen_r") === 0.0)
  }

  // ---- Mood's median ---------------------------------------------------

  test("moodFinish: clean separation fires, identical distributions score 0") {
    val sep = Seq(
      ("A", 1.0, 1L), ("A", 2.0, 1L), ("A", 3.0, 1L),
      ("B", 4.0, 1L), ("B", 5.0, 1L), ("B", 6.0, 1L))
      .toDF("event_type", "value", "cnt")
    val r = StatTestQueries.moodFinish(sep).head()
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("k_types") === 2L)
    assert(r.getAs[Double]("median_r") === 3.0) // lower median
    assert(r.getAs[Double]("chi2_r") === 6.0)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.isNullAt(r.fieldIndex("is_sig"))) // is_sig defined at k=5 only

    val same = Seq(
      ("A", 1.0, 1L), ("A", 2.0, 1L),
      ("B", 1.0, 1L), ("B", 2.0, 1L))
      .toDF("event_type", "value", "cnt")
    val r2 = StatTestQueries.moodFinish(same).head()
    assert(r2.getAs[Double]("median_r") === 1.0)
    assert(r2.getAs[Double]("chi2_r") === 0.0)
  }

  test("moodFinish: weighted grid counts locate the median correctly") {
    // counts 5 at value 10, 1 at value 20: n=6, ceil(7/2)=3 → median 10
    val g = Seq(("A", 10.0, 5L), ("A", 20.0, 1L))
      .toDF("event_type", "value", "cnt")
    val r = StatTestQueries.moodFinish(g).head()
    assert(r.getAs[Double]("median_r") === 10.0)
    assert(r.getAs[Double]("chi2_r") === 0.0) // one type: no deviation
  }

  // ---- Calinski-Harabasz / Davies-Bouldin ------------------------------

  test("calinskiFinish + daviesBouldinFinish: two planted 1-D clusters") {
    // cluster 0 at {0,2}, cluster 1 at {10,12} (2nd dim zero):
    // means (1,0)/(11,0), W=2+2, grand mean (6,0), B=100 → CH=50;
    // s_0=s_1=1, d=10 → every worst ratio 0.2 → DB=0.2
    val assigned = Seq(
      (0L, Array(0f, 0f)), (0L, Array(2f, 0f)),
      (1L, Array(10f, 0f)), (1L, Array(12f, 0f)))
      .toDF("list_id", "embedding")
    val dims = SimilarityQueries.clusterDimStats(assigned).localCheckpoint()
    val wss = SimilarityQueries.clusterWss(assigned, dims)
    val ch = SimilarityQueries.calinskiFinish(dims, wss).head()
    assert(ch.getAs[Long]("n") === 4L)
    assert(ch.getAs[Long]("k_clusters") === 2L)
    assert(ch.getAs[Double]("b_r") === 100.0)
    assert(ch.getAs[Double]("w_r") === 4.0)
    assert(ch.getAs[Double]("ch_r") === 50.0)
    val db = SimilarityQueries.daviesBouldinFinish(dims, wss).collect()
    assert(db.length === 2)
    db.foreach { r =>
      assert(r.getAs[Double]("s_r") === 1.0)
      assert(r.getAs[Double]("worst_ratio_r") === 0.2)
      assert(r.getAs[Double]("db_r") === 0.2)
    }
  }

  test("calinskiFinish: degenerate single cluster yields null CH") {
    val assigned = Seq((0L, Array(1f, 1f)), (0L, Array(3f, 1f)))
      .toDF("list_id", "embedding")
    val dims = SimilarityQueries.clusterDimStats(assigned).localCheckpoint()
    val r = SimilarityQueries.calinskiFinish(dims,
      SimilarityQueries.clusterWss(assigned, dims)).head()
    assert(r.getAs[Long]("k_clusters") === 1L)
    assert(r.isNullAt(r.fieldIndex("ch_r")))
  }

  // ---- fixture-level sanity on the real chain ------------------------

  test("wave-7 queries run the real fixture: bounded outputs, full panel") {
    val t = SparkEntry.queries("events_theil_index")(spark, sf).head()
    assert(t.getAs[Double]("theil_t_r") >= 0.0)
    assert(t.getAs[Double]("mld_r") >= 0.0)
    val a = t.getAs[Double]("atkinson_r")
    assert(a >= 0.0 && a < 1.0)
    val c = SparkEntry.queries("text_chao1")(spark, sf)
    assert(c.filter(col("chao1_r") < col("vocab")).count() === 0)
    assert(c.count() > 0)
    val m = SparkEntry.queries("events_mood_median")(spark, sf).head()
    assert(m.getAs[Long]("k_types") === 5L)
    assert(m.getAs[Long]("dof") === 4L)
    assert(m.getAs[Double]("chi2_r") >= 0.0)
    assert(!m.isNullAt(m.fieldIndex("is_sig")))
    val ch = SparkEntry.queries("emb_calinski_harabasz")(spark, sf).head()
    assert(ch.getAs[Double]("ch_r") > 0.0)
    assert(ch.getAs[Double]("w_r") > 0.0)
    val db = SparkEntry.queries("emb_davies_bouldin")(spark, sf)
    assert(db.count() > 1)
    assert(db.filter(col("db_r") <= 0.0).count() === 0)
    val j = SparkEntry.queries("graph_jaccard_linkpred")(spark, sf)
    // scores are valid Jaccards: in (0, 1], commons bounded by degrees
    assert(j.filter(col("jaccard_r") <= 0.0 || col("jaccard_r") > 1.0)
      .count() === 0)
    assert(j.filter(col("common_neighbors") >
      least(col("deg_u"), col("deg_w"))).count() === 0)
  }
}
