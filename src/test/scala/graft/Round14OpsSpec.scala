package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventQueries, SimilarityQueries}

/** Round-14 pins: the hier-gated kNN finishes (VERDICT r13 item 1)
  * and, as the round progresses, the absorbing markov chain and the
  * can't-twin registry.
  */
class Round14OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- hier-gated kNN finishes --------------------------------------

  test("hier-scaled intrinsic dim and accuracy ride the hier graph chain") {
    val id = SimilarityQueries.queries("emb_intrinsic_dim_hier_scaled")(
      spark, sf).head()
    assert(id.getLong(0) >= id.getLong(1)) // n_pts >= n_used
    val acc = SimilarityQueries.queries("emb_knn_accuracy_hier_scaled")(
      spark, sf)
    // per-class accuracy is a [0,1] rate over a complete label partition
    assert(acc.filter(col("acc_r") < 0.0 || col("acc_r") > 1.0).count() == 0)
    // the finishes read the SAME graph the hier query serves: every
    // (src) in the accuracy vote exists in the graph's src set
    val g = SimilarityQueries.queries("emb_knn_graph_hier_scaled")(spark, sf)
    assert(g.filter(col("rank") > 5).count() == 0) // TopK = 5
    assert(g.filter(col("src") === col("dst")).count() == 0)
  }

  // ---- absorbing-safe markov stationary -----------------------------

  test("markovAbsorbingPi: planted absorbing chain sums to exactly 1") {
    // D appears only as to_type (absorbing); k = 3 forces the
    // 1/3-at-9dp case the residual-to-anchor renorm exists for
    val counts = Seq(
      ("A", "B", 2L), ("B", "A", 1L), ("B", "D", 1L))
      .toDF("from_type", "to_type", "cnt")
    val pi = EventQueries.markovAbsorbingPi(counts).collect()
    assert(pi.map(_.getString(0)).sorted.sameElements(Array("A", "B", "D")))
    val total = pi.map(_.getDecimal(1)).reduce(_ add _)
    assert(total.compareTo(java.math.BigDecimal.ONE) == 0,
      s"sum(pi) = $total — the renorm invariant broke")
    // every state holds mass and the absorbing state received some
    assert(pi.forall(_.getDecimal(1).signum() >= 0))
    assert(pi.find(_.getString(0) == "D").get.getDecimal(1).signum() > 0)
  }

  test("markovAbsorbingPi: no absorbing states still sums to exactly 1") {
    val counts = Seq(("A", "B", 3L), ("B", "A", 1L))
      .toDF("from_type", "to_type", "cnt")
    val total = EventQueries.markovAbsorbingPi(counts).collect()
      .map(_.getDecimal(1)).reduce(_ add _)
    assert(total.compareTo(java.math.BigDecimal.ONE) == 0)
  }

  // ---- shared-state finishes (v-measure / Bartlett / Simpson) -------

  test("clusterVmeasureFinish: perfect and degenerate clusterings") {
    // perfect diagonal: each cluster holds exactly one class
    val perfect = Seq((1L, 1L, 10L), (2L, 2L, 10L), (3L, 3L, 10L))
      .toDF("list_id", "label", "nij")
    val p = SimilarityQueries.clusterVmeasureFinish(perfect).head()
    assert(p.getAs[Double]("homogeneity_r") == 1.0 &&
      p.getAs[Double]("completeness_r") == 1.0 &&
      p.getAs[Double]("v_r") == 1.0)
    // everything in ONE cluster: complete (H(K)=0 -> convention 1)
    // but maximally inhomogeneous (I = 0)
    val merged = Seq((1L, 1L, 10L), (1L, 2L, 10L))
      .toDF("list_id", "label", "nij")
    val m = SimilarityQueries.clusterVmeasureFinish(merged).head()
    assert(m.getAs[Double]("homogeneity_r") == 0.0 &&
      m.getAs[Double]("completeness_r") == 1.0 &&
      m.getAs[Double]("v_r") == 0.0)
  }

  test("bartlettFinish: equal variances -> chi2 ~ 0, unequal -> large") {
    import graft.queries.StatTestQueries
    def stats(rows: Seq[(String, Double)]) =
      StatTestQueries.anovaStats(
        rows.toDF("event_type", "v0")
          .select(col("event_type"),
            col("v0").cast("decimal(18,4)").as("v")))
    val equal = stats(Seq(("a", 0.0), ("a", 2.0), ("a", 4.0),
      ("b", 10.0), ("b", 12.0), ("b", 14.0)))
    val e = StatTestQueries.bartlettFinish(equal).head()
    assert(math.abs(e.getAs[Double]("chi2_r")) < 1e-6)
    assert(math.abs(e.getAs[Double]("pooled_var_r") - 4.0) < 1e-6)
    val unequal = stats(Seq(("a", 0.0), ("a", 0.1), ("a", 0.2),
      ("b", 0.0), ("b", 100.0), ("b", 200.0)))
    val u = StatTestQueries.bartlettFinish(unequal).head()
    assert(u.getAs[Double]("chi2_r") > 10.0)
  }

  test("simpsonFinish: monopoly vocabulary -> 1, all-distinct -> 0") {
    import graft.queries.TextQueries
    val cells = Seq(("A", "w", 10L),
      ("B", "x", 1L), ("B", "y", 1L), ("B", "z", 1L), ("B", "q", 1L))
      .toDF("source", "tok", "cnt")
    val out = TextQueries.simpsonFinish(cells)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("simpson_r") == 1.0 &&
      out("A").getAs[Double]("inv_simpson_r") == 1.0)
    assert(out("B").getAs[Double]("simpson_r") == 0.0 &&
      out("B").isNullAt(out("B").fieldIndex("inv_simpson_r")))
  }

  // ---- ewma corpus-axis retirement (VERDICT r13 item 6) -------------

  test("bucketed-halo EWMA equals the monolithic kernel, precondition held") {
    import graft.tables.Tables
    val ev = Tables.events(spark, sf)
    // the identity's validity domain, pinned BEFORE the identity:
    // (a) per series the bucket ids are CONTIGUOUS (an empty middle
    // bucket would break the one-bucket halo chain where the
    // monolithic window reaches across the gap), and (b) every MIDDLE
    // bucket holds >= EwmaLags rows so no trailing window reaches past
    // its halo. Partial FIRST/LAST buckets are exempt by construction:
    // a first-bucket halo covers the entire prior history (the
    // monolithic kernel zero-pads at series start identically), and a
    // last bucket is never a halo source.
    val cells = ev
      .groupBy(col("event_type"),
        expr(s"ts_ms div ${EventQueries.EwmaBucketMs}").as("bkt"))
      .count()
    val rng = cells.groupBy(col("event_type"))
      .agg(min(col("bkt")).as("b0"), max(col("bkt")).as("b1"),
        count(lit(1)).as("nb"))
    assert(rng.filter(col("nb") =!= col("b1") - col("b0") + 1).count() == 0,
      "a series has an empty middle bucket — the halo chain is broken")
    val midMin = cells.join(rng, "event_type")
      .filter(col("bkt") =!= col("b0") && col("bkt") =!= col("b1"))
      .agg(min(col("count"))).head()
    assert(midMin.isNullAt(0) ||
      midMin.getLong(0) >= EventQueries.EwmaLags,
      s"middle bucket of ${midMin.get(0)} rows < EwmaLags — widen " +
        "EwmaBucketMs")
    val mono = EventQueries.queries("events_ewma")(spark, sf)
    val bucketed = EventQueries.queries("events_ewma_bucketed")(spark, sf)
    assert(mono.count() == bucketed.count())
    // exact row identity (all four columns, both directions)
    assert(mono.exceptAll(bucketed).count() == 0)
    assert(bucketed.exceptAll(mono).count() == 0)
  }
}
