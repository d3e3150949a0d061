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

  // ---- r14 wave 2: nonparametric/paired tests ------------------------

  test("kwFinish: separated groups score the textbook H; all-equal has no test") {
    import graft.queries.StatTestQueries
    // a = {1,2,3}, b = {4,5,6}: ranks 1..6, R_a = 6, R_b = 15 ->
    // H = 12/42 * (36/3 + 225/3) - 21 = 27/7
    val sep = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("event_type", "value")
    val h = StatTestQueries.kwFinish(sep).head()
    assert(math.abs(h.getAs[Double]("h_r") - 27.0 / 7.0) < 1e-6)
    assert(h.getAs[Double]("tie_c_r") == 1.0)
    assert(math.abs(h.getAs[Double]("h_adj_r") - 27.0 / 7.0) < 1e-6)
    // every value tied: H = 0 exactly and the tie correction degenerates
    // to 0 -> no adjusted statistic
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("event_type", "value")
    val t = StatTestQueries.kwFinish(tied).head()
    assert(t.getAs[Double]("h_r") == 0.0)
    assert(t.getAs[Double]("tie_c_r") == 0.0)
    assert(t.isNullAt(t.fieldIndex("h_adj_r")))
  }

  test("gridMedians: odd/even/tied order statistics, no quantile function") {
    import graft.queries.StatTestQueries
    val e = Seq(("odd", 1.0), ("odd", 2.0), ("odd", 100.0),
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 4.0),
      ("tied", 7.0), ("tied", 7.0), ("tied", 9.0))
      .toDF("event_type", "value")
    val m = StatTestQueries.gridMedians(e).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("odd") == 2.0 && m("even") == 2.5 && m("tied") == 7.0)
  }

  test("brownForsytheOf: equal spreads pass, an exploded group trips F") {
    import graft.queries.StatTestQueries
    // 4-element groups so the 4-dp term quantization is exact:
    // identical |dev| sets {1.5, .5, .5, 1.5} per group -> SSB = 0
    val equal = Seq(("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 11.0), ("b", 12.0), ("b", 13.0))
      .toDF("event_type", "value")
    val e = StatTestQueries.brownForsytheOf(equal).head()
    assert(e.getAs[Double]("f_r") == 0.0)
    val spread = Seq(("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0), ("b", 100.0), ("b", 200.0), ("b", 300.0))
      .toDF("event_type", "value")
    assert(StatTestQueries.brownForsytheOf(spread).head()
      .getAs[Double]("f_r") > 5.0)
  }

  test("mcnemarFinish: continuity-corrected flips, degenerate guarded") {
    import graft.queries.StatTestQueries
    def halved(rows: Seq[(String, Long, String)]) =
      rows.toDF("event_type", "user_id", "half")
    // b = 5 ref-only, c = 1 cur-only -> (4-1)^2/6 = 1.5, under the gate
    val small = halved(
      (1L to 5L).map(u => ("t", u, "ref")) ++ Seq(("t", 6L, "cur")) ++
        Seq(("t", 7L, "ref"), ("t", 7L, "cur")))
    val s = StatTestQueries.mcnemarFinish(small).head()
    assert(s.getAs[Long]("b") == 5 && s.getAs[Long]("c") == 1)
    assert(s.getAs[Double]("chi2_r") == 1.5 && !s.getAs[Boolean]("flip_flag"))
    // b = 30, c = 5 -> 24^2/35 trips the chi2_{0.95,1} gate
    val big = halved(
      (1L to 30L).map(u => ("t", u, "ref")) ++
        (31L to 35L).map(u => ("t", u, "cur")))
    val bg = StatTestQueries.mcnemarFinish(big).head()
    assert(bg.getAs[Double]("chi2_r") > StatTestQueries.SrmCrit)
    assert(bg.getAs[Boolean]("flip_flag"))
    // nobody flipped: no statistic, no alarm (never a 0/0)
    val none = halved(Seq(("t", 1L, "ref"), ("t", 1L, "cur")))
    val n = StatTestQueries.mcnemarFinish(none).head()
    assert(n.isNullAt(n.fieldIndex("chi2_r")) && !n.getAs[Boolean]("flip_flag"))
  }

  test("spearmanFinish: monotone series hit ±1, constants have no test") {
    import graft.queries.StatTestQueries
    val e = Seq(
      ("up", 1L, 10.0), ("up", 2L, 20.0), ("up", 3L, 30.0), ("up", 4L, 40.0),
      ("down", 1L, 9.0), ("down", 2L, 7.0), ("down", 3L, 5.0),
      ("flat", 1L, 4.0), ("flat", 2L, 4.0), ("flat", 3L, 4.0))
      .toDF("event_type", "ts_ms", "value")
    val out = StatTestQueries.spearmanFinish(e).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("up").getAs[Double]("rho_r") == 1.0)
    assert(out("down").getAs[Double]("rho_r") == -1.0)
    assert(out("flat").isNullAt(out("flat").fieldIndex("rho_r")))
    assert(!out("flat").getAs[Boolean]("is_sig"))
  }

  test("goodTuringFinish: textbook count-of-counts on a planted vocabulary") {
    import graft.queries.TextQueries
    // counts (1,1,1,2,2,3): N1=3, N2=2, N3=1, N=10 -> r*(1)=4/3,
    // r*(2)=3/2, r*(3)=0 (N4=0), r in {4,5} have no estimate; p0=0.3
    val cells = Seq(("A", "t1", 1L), ("A", "t2", 1L), ("A", "t3", 1L),
      ("A", "t4", 2L), ("A", "t5", 2L), ("A", "t6", 3L))
      .toDF("source", "tok", "cnt")
    val rows = TextQueries.goodTuringFinish(cells).collect()
      .map(r => r.getAs[Long]("r") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(math.abs(rows(1L).getAs[Double]("r_star_r") - 1.333333) < 1e-9)
    assert(rows(2L).getAs[Double]("r_star_r") == 1.5)
    assert(rows(3L).getAs[Double]("r_star_r") == 0.0)
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("r_star_r")))
    assert(rows.values.forall(_.getAs[Double]("p0_r") == 0.3))
  }

  test("rouge precision IS bleu p2 on the shared pair state") {
    import graft.queries.TextQueries
    val bleu = TextQueries.queries("text_bleu_pairs")(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("p2_r").as("bleu_p2"))
    val rouge = TextQueries.queries("text_rouge_pairs")(spark, sf)
    // rouge's pair set = bleu pairs whose candidate HAS bigrams (the
    // inner join on the candidate's bigram frame); precision matches
    // row for row, and F1 is bounded by both precision and recall
    // compare via collected maps, NOT a join: the two frames share the
    // lshEdges/documents lineage and a same-lineage join mis-resolves
    // the compared attributes (ambiguous-self-join; observed 906/1023
    // false diffs while the materialized outputs are identical)
    val bm = bleu.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rr = rouge.collect()
    assert(rr.nonEmpty)
    assert(rr.forall(r =>
      bm((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        == r.getAs[Double]("p2_r")))
    // F1 (harmonic mean) lies BETWEEN precision and recall — rounding
    // is monotone, so the rounded triple keeps the sandwich
    assert(rouge.filter(
      col("f2_r") > greatest(col("p2_r"), col("rec2_r")) ||
      col("f2_r") < least(col("p2_r"), col("rec2_r"))).count() == 0)
  }

  // ---- r14 wave 3: per-seed BFS + matryoshka eval ---------------------

  test("labeledDistances: per-seed distances on a planted path graph") {
    import graft.operators.Bfs
    // path 1-2-3-4-5, seeds {1, 4}: the per-seed fields must stay
    // separate (the multi-source merge would collapse them)
    val seeds = Seq(1L, 4L).toDF("s")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val d = Bfs.labeledDistances(seeds, pairs, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d == Map(
      (1L, 1L) -> 0L, (1L, 2L) -> 1L, (1L, 3L) -> 2L, (1L, 4L) -> 3L,
      (1L, 5L) -> 4L,
      (4L, 4L) -> 0L, (4L, 3L) -> 1L, (4L, 2L) -> 2L, (4L, 1L) -> 3L,
      (4L, 5L) -> 1L))
    // the horizon truncates: 1 round from seed 1 reaches only {1, 2}
    val t = Bfs.labeledDistances(seeds, pairs, 1).collect()
      .filter(_.getLong(0) == 1L).map(_.getLong(1)).sorted
    assert(t.sameElements(Array(1L, 2L)))
  }

  test("closeness/matryoshka fixture invariants") {
    import graft.queries.{DedupQueries, SimilarityQueries}
    val c = DedupQueries.queries("graph_closeness_sampled")(spark, sf)
      .collect()
    assert(c.length == DedupQueries.ClosenessSeeds)
    // a seed reaching only itself has dist_sum 0 and no closeness;
    // any other has closeness in (0, 1] (hop distances >= 1)
    assert(c.forall { r =>
      val (n, ds) = (r.getAs[Long]("n_reached"), r.getAs[Long]("dist_sum"))
      if (ds == 0) n == 1 && r.isNullAt(r.fieldIndex("closeness_r"))
      else {
        val cl = r.getAs[Double]("closeness_r")
        cl > 0.0 && cl <= 1.0 && r.getAs[Double]("harmonic_r") >= cl
      }
    })
    val m = SimilarityQueries.queries("emb_matryoshka_recall")(spark, sf)
      .collect()
    assert(m.map(_.getAs[Long]("dim")).sorted.toSeq ==
      SimilarityQueries.MatryoshkaDims.map(_.toLong))
    assert(m.forall { r =>
      val rec = r.getAs[Double]("recall_r")
      rec >= 0.0 && rec <= 1.0 &&
        r.getAs[Long]("n_hits") <= r.getAs[Long]("n_q") * 5
    })
  }

  // ---- r14 wave 4: post-hoc pairs + structure histograms --------------

  test("tukeyFinish: equal means q=0, separated means alarm, degenerate guarded") {
    import graft.queries.StatTestQueries
    def stats(rows: Seq[(String, Double)]) =
      StatTestQueries.anovaStats(rows.toDF("event_type", "v0")
        .select(col("event_type"), col("v0").cast("decimal(18,4)").as("v")))
    // equal means, shared spread -> diff 0, q 0, quiet
    val eq = StatTestQueries.tukeyFinish(stats(Seq(
      ("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)))).head()
    assert(eq.getAs[Double]("diff_r") == 0.0 && eq.getAs[Double]("q_r") == 0.0
      && !eq.getAs[Boolean]("is_sig"))
    // far-separated tight groups -> the pair fires
    val far = StatTestQueries.tukeyFinish(stats(Seq(
      ("a", 0.0), ("a", 0.1), ("b", 100.0), ("b", 100.1)))).head()
    assert(far.getAs[Boolean]("is_sig"))
    // singleton groups: SSW = 0 -> no pooled variance, no q, no alarm
    val deg = StatTestQueries.tukeyFinish(stats(Seq(
      ("a", 1.0), ("b", 2.0)))).head()
    assert(deg.isNullAt(deg.fieldIndex("q_r")) && !deg.getAs[Boolean]("is_sig"))
  }

  test("cluster sizes and degree distribution partition the corpus") {
    import graft.queries.DedupQueries
    import graft.tables.Tables
    val nDocs = Tables.documents(spark, sf).count()
    val cs = DedupQueries.queries("pipeline_cluster_sizes")(spark, sf).collect()
    assert(cs.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(cs.forall(r => r.getAs[Long]("size") >= 1 &&
      r.getAs[Long]("n_docs") ==
        r.getAs[Long]("size") * r.getAs[Long]("n_components")))
    val dd = DedupQueries.queries("graph_degree_distribution")(spark, sf)
      .orderBy(col("degree")).collect()
    assert(dd.map(_.getAs[Long]("n_nodes")).sum == nDocs)
    // CCDF starts at exactly 1 (every node has degree >= min degree)
    // and n_ge strictly decreases down the degree grid
    assert(dd.head.getAs[Double]("ccdf_r") == 1.0)
    assert(dd.sliding(2).forall {
      case Array(a, b) => a.getAs[Long]("n_ge") > b.getAs[Long]("n_ge")
      case _ => true
    })
  }

  test("friedmanFinish: perfect agreement scores W = 1, incomplete blocks drop") {
    import graft.queries.StatTestQueries
    // 3 users, 3 types, every user ranks a < b < c: R = (3, 6, 9),
    // chi2 = 12/36 * 126 - 36 = 6, W = 6/(3*2) = 1. user 4 misses
    // type c -> dropped by the complete-block filter.
    val rows = Seq(
      (1L, "a", 1.0), (1L, "b", 2.0), (1L, "c", 3.0),
      (2L, "a", 10.0), (2L, "b", 20.0), (2L, "c", 30.0),
      (3L, "a", 5.0), (3L, "b", 6.0), (3L, "c", 7.0),
      (4L, "a", 9.0), (4L, "b", 1.0))
      .toDF("user_id", "event_type", "value")
    val r = StatTestQueries.friedmanFinish(rows).head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n_blocks") == 3)
    assert(r.getAs[Double]("chi2_r") == 6.0)
    assert(r.getAs[Double]("tie_c_r") == 1.0)
    assert(r.getAs[Double]("kendall_w_r") == 1.0)
    // all-tied blocks: chi2 = 0 and the tie correction degenerates
    val tied = Seq(
      (1L, "a", 5.0), (1L, "b", 5.0),
      (2L, "a", 7.0), (2L, "b", 7.0)).toDF("user_id", "event_type", "value")
    val t = StatTestQueries.friedmanFinish(tied).head()
    assert(t.getAs[Double]("chi2_r") == 0.0)
    assert(t.getAs[Double]("tie_c_r") == 0.0)
    assert(t.isNullAt(t.fieldIndex("chi2_adj_r")))
  }

  test("cochranQFinish: textbook Q on planted flags, constant blocks degenerate") {
    import graft.queries.StatTestQueries
    // current-half presence: u1 in {a,b,c}, u2 in {a,b}, u3 in {a}:
    // C = (3,2,1), R = (3,2,1), N = 6 -> Q = 2*(3*14-36)/(18-14) = 3
    val e = Seq(
      ("a", 1L, "cur"), ("b", 1L, "cur"), ("c", 1L, "cur"),
      ("a", 2L, "cur"), ("b", 2L, "cur"),
      ("a", 3L, "cur"),
      ("c", 3L, "ref")) // ref rows define k/n_blocks but carry no flag
      .toDF("event_type", "user_id", "half")
    val r = StatTestQueries.cochranQFinish(e).head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n_blocks") == 3)
    assert(r.getAs[Long]("n_successes") == 6)
    assert(r.getAs[Double]("q_r") == 3.0 && !r.getAs[Boolean]("q_flag"))
    // every user active in every type: the denominator vanishes -> no
    // statistic, no alarm (never a 0/0)
    val const = Seq(("a", 1L, "cur"), ("b", 1L, "cur"),
      ("a", 2L, "cur"), ("b", 2L, "cur")).toDF("event_type", "user_id", "half")
    val c = StatTestQueries.cochranQFinish(const).head()
    assert(c.isNullAt(c.fieldIndex("q_r")) && !c.getAs[Boolean]("q_flag"))
  }

  test("brier decomposition: Murphy identity holds to within-bin variance") {
    import graft.queries.TextQueries
    val r = TextQueries.queries("text_quality_brier")(spark, sf).head()
    val (b, rel, res, unc) = (r.getAs[Double]("brier_r"),
      r.getAs[Double]("reliability_r"), r.getAs[Double]("resolution_r"),
      r.getAs[Double]("uncertainty_r"))
    assert(b >= 0.0 && b <= 1.0 && rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25)
    // binned decomposition: brier = rel - res + unc + within-bin
    // variance of p; deciles bound that variance by (0.1)^2/4
    val gap = b - (rel - res + unc)
    assert(gap >= -1e-6 && gap <= 0.0025 + 1e-6,
      s"Murphy identity broke: brier=$b rel=$rel res=$res unc=$unc")
    // resolution can never exceed the uncertainty it explains
    assert(res <= unc + 1e-9)
  }

  test("retrieval eval: metric coherence on the fixture") {
    import graft.queries.SimilarityQueries
    val rows = SimilarityQueries.queries("search_retrieval_eval")(spark, sf)
      .collect()
    assert(rows.length == 8) // one row per query doc, none dropped
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr_r")
      val (r5, r20) = (r.getAs[Double]("r_at5_r"), r.getAs[Double]("r_at20_r"))
      assert(rr >= 0.0 && rr <= 1.0 && r5 >= 0.0 && r20 <= 1.0)
      // recall is monotone in k; rr > 0 iff a relevant doc was found
      assert(r20 >= r5)
      if (r.isNullAt(r.fieldIndex("first_rel_rank"))) assert(rr == 0.0)
      else assert(rr > 0.0 &&
        r.getAs[Long]("first_rel_rank") >= 1 &&
        r.getAs[Long]("first_rel_rank") <= 20)
    }
    // the eval is not vacuous: lexical search finds at least one
    // near-dup for at least one query on the fixture
    assert(rows.exists(_.getAs[Double]("rr_r") > 0.0))
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
