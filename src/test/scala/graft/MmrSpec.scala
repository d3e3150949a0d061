package graft

/** search_mmr properties the oracle hash can't express on its own:
  * the greedy seed equals the pure relevance top-1 (round 1 has no
  * penalty term), every query yields exactly TopK distinct picks, and
  * the diversity penalty BINDS on the fixture — at least one query's
  * MMR set differs from its pure top-5, i.e. the operator is not
  * degenerating into plain top-k on this data.
  */
class MmrSpec extends SparkSpec {

  test("mmr emits 5 distinct ranked picks per query, seeded by the rel top-1, and diverges from pure top-k") {
    val mmr = SparkEntry.queries("search_mmr")(spark, sf)
      .select("q_id", "mmr_rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = mmr.groupBy(_._1)
    assert(byQ.size == 8, s"expected 8 queries, saw ${byQ.size}")
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5, s"q$q: expected 5 picks, saw ${rows.length}")
      assert(rows.map(_._2).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)),
        s"q$q: ranks not 1..5")
      assert(rows.map(_._3).distinct.length == 5, s"q$q: duplicate pick")
    }

    val top = SparkEntry.queries("ann_topk_bruteforce")(spark, sf)
      .select("q_id", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val topByQ = top.groupBy(_._1)
    // round 1 has no penalty term -> the MMR seed IS the rel argmax
    byQ.foreach { case (q, rows) =>
      val seed = rows.find(_._2 == 1L).get._3
      val relTop = topByQ(q).find(_._2 == 1L).get._3
      assert(seed == relTop, s"q$q: mmr seed $seed != rel top-1 $relTop")
    }
    // the penalty must bind somewhere: if every query's MMR set equals
    // its pure top-5, the operator adds nothing on this fixture
    val divergent = byQ.count { case (q, rows) =>
      rows.map(_._3).toSet != topByQ(q).map(_._3).toSet
    }
    assert(divergent > 0,
      "MMR set identical to pure top-5 for every query - penalty never binds")
  }
}
