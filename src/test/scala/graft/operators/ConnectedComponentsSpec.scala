package graft.operators

import graft.SparkSpec

/** Unit semantics of the CC operator (the oracle checks it end-to-end
  * on the LSH graph; this pins the graph-theory corner cases on
  * hand-built graphs, including the one that motivates dedup_cc over
  * dedup_lsh_keep's one-hop label propagation).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(verts: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(
      verts.toDF("v"), pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to the global min (transitive, not one-hop)") {
    // 3 shares a bucket only with 2, yet its component min is 1 —
    // one-hop propagation (min over direct neighbors) would answer 2.
    assert(cc(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain converges within the round cap (pointer jumping)") {
    val n = 64L
    val verts = (1L to n)
    val pairs = (1L until n).map(i => (i, i + 1))
    val got = cc(verts, pairs)
    assert(got === verts.map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate minima; isolated vertex is its own") {
    val got = cc(Seq(1L, 2L, 3L, 10L, 11L, 99L),
                 Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("id-range independence: converges correctly at Long-sum-overflow ids") {
    // Ids chosen so the INITIAL label sum (= sum of ids) overflows a
    // Long (3 × ~2^62 > 2^63): the old Long-sum convergence check
    // wrapped here and "unchanged" stopped being a proof (VERDICT r3
    // item 4). The decimal(38,0) sum is exact at any id range.
    val big = Long.MaxValue / 2
    val got = cc(Seq(big, big + 1, big + 2, 7L),
                 Seq((big, big + 1), (big + 1, big + 2)))
    assert(got === Map(big -> big, (big + 1) -> big, (big + 2) -> big, 7L -> 7L))
  }

  test("empty input is total (no NPE from the null aggregate sum)") {
    // sum over zero rows is NULL — the convergence check must coalesce
    // it, not crash (ADVICE r4): labels() is total on empty graphs
    assert(cc(Seq.empty, Seq.empty) === Map.empty)
  }

  test("min joins via a larger intermediate (the anti-one-hop case)") {
    // 5—7 and 1—7: vertex 5's only neighbor is 7 (> 5), so one-hop
    // keeps 5 as its own representative; the true component min is 1.
    val got = cc(Seq(1L, 5L, 7L), Seq((5L, 7L), (1L, 7L)))
    assert(got === Map(1L -> 1L, 5L -> 1L, 7L -> 1L))
  }
}
