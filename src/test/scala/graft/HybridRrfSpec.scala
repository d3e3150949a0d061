package graft

import graft.queries.SimilarityQueries

/** Laws for hybrid retrieval (`search_hybrid_rrf`): the RRF formula
  * recomputed from the emitted ranks, ordering consistency, and that
  * the fixture genuinely exercises two-leg fusion.
  */
class HybridRrfSpec extends SparkSpec {

  // sf0.01: several top results are ranked by BOTH legs (at sf0.1 the
  // two shortlists diverge entirely and the fusion law tests less)
  private val dir = "/root/testdata/sf0.01"

  private lazy val rows =
    SimilarityQueries.queries("search_hybrid_rrf")(spark, dir).collect()

  private def rrf(lex: Option[Long], sem: Option[Long]): Double =
    lex.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
      sem.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)

  test("rrf_r is exactly the fused 1/(60+rank) sum of the emitted ranks") {
    rows.foreach { r =>
      val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val sem = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(lex.nonEmpty || sem.nonEmpty, r.toString)
      val expect = BigDecimal(rrf(lex, sem))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == expect, s"$r vs $expect")
    }
  }

  test("within each query, rank order follows (rrf desc, doc_id)") {
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(5) > b.getDouble(5) ||
            (a.getDouble(5) == b.getDouble(5) &&
             a.getLong(2) < b.getLong(2)), s"$a !>= $b")
        case _ => ()
      }
    }
  }

  test("fusion is real: some winners are ranked by both legs, and a doc ranked by both outranks the same single-leg rank") {
    val both = rows.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    assert(both.nonEmpty, "no two-leg winners — fusion vacuous at this sf")
    // structural RRF property on the formula itself
    assert(rrf(Some(5L), Some(20L)) > rrf(Some(5L), None))
  }

  private lazy val idxRows =
    SimilarityQueries.queries("search_hybrid_rrf_indexed")(spark, dir).collect()

  test("indexed variant: rrf_r is the same fused formula over its emitted ranks") {
    idxRows.foreach { r =>
      val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val sem = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(lex.nonEmpty || sem.nonEmpty, r.toString)
      val expect = BigDecimal(rrf(lex, sem))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == expect, s"$r vs $expect")
    }
  }

  test("indexed variant shares the lexical leg: lex ranks agree with the anchor per (q, doc)") {
    val anchorLex = rows.filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val idxLex = idxRows.filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val shared = anchorLex.keySet intersect idxLex.keySet
    assert(shared.nonEmpty, "no shared lexical winners to compare")
    shared.foreach(k => assert(anchorLex(k) == idxLex(k), s"lex rank differs at $k"))
  }

  test("indexed semantic recall vs the brute anchor is non-trivial at the fused top-k") {
    // The IVF probe prunes the corpus; the fused top-5 should still
    // substantially overlap the anchor's (recall floor — the indexed
    // leg probes the lists the true neighbors live in).
    val a = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = idxRows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (a intersect b).size.toDouble / a.size
    assert(recall >= 0.5, s"fused top-k overlap $recall below floor")
  }
}
