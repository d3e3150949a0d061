package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** Invariant tests for the IVF ANN path and embedding near-dup pairs
  * (SURVEY.md §2.9) at sf0.001.
  */
class SimilarityQueriesSpec extends SparkSpec {

  test("ann_topk_ivf: ranks are contiguous 1..k per query, no self-matches") {
    val rows = SimilarityQueries.queries("ann_topk_ivf")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, s"ranks not contiguous for q=$q")
      assert(ranks.length <= 5)
      assert(rs.forall(_.getLong(2) != q), s"self-match for q=$q")
    }
  }

  test("ann_topk_ivf results appear in the brute-force ranking with identical cosine") {
    val ivf = SimilarityQueries.queries("ann_topk_ivf")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("cos_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = SimilarityQueries.queries("ann_topk_bruteforce")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("cos_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // IVF prunes, so its pairs are a subset of all pairs; where a pair is
    // also in the brute-force top-k, the cosine must match bit-for-bit.
    val shared = ivf.keySet.intersect(bf.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k => assert(ivf(k) == bf(k), s"cos mismatch at $k") }
  }

  test("ANN recall@5 vs brute force is quantified on the fixture") {
    // Quantifies the pruned paths' recall trade (VERDICT r1 item 5).
    // Context for the floors: the fixture embeddings are UNSTRUCTURED
    // (top-5 cosines ≈ 0.3; nearest neighbors do not share labels), so
    // no hashing scheme can beat recall ≈ scanned-fraction by much —
    // multi-probe LSH searches ~9/256 of the corpus (measured recall
    // 0.05 here), IVF nprobe=2 searches ~20% (measured 0.40, ~2× its
    // scan fraction: the centroid assignment does carry some signal).
    // AnnRecallSpec asserts the ≥0.6 design floor on clustered data,
    // where bucketing has structure to exploit; these floors just pin
    // the measured fixture numbers against regression.
    def topk(name: String): Map[Long, Set[Long]] =
      SimilarityQueries.queries(name)(spark, sf)
        .select(col("q_id"), col("vec_id"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val bf = topk("ann_topk_bruteforce")
    def recall(got: Map[Long, Set[Long]]): Double = {
      // queries with no survivors in the pruned path count as 0 recall
      val hits = bf.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      hits.sum / hits.size
    }
    val rLsh = recall(topk("ann_topk_lsh"))
    val rIvf = recall(topk("ann_topk_ivf"))
    info(f"fixture recall@5: lsh(multiprobe)=$rLsh%.3f ivf(nprobe=2)=$rIvf%.3f")
    assert(rLsh >= 0.04, f"multi-probe LSH recall@5 $rLsh%.3f regressed")
    assert(rIvf >= 0.30, f"IVF recall@5 $rIvf%.3f regressed")
  }

  test("semanticHierAnchor: lists are seed ids, every exemplar shares its member's list") {
    val rows = SimilarityQueries.semanticHierAnchor(spark, sf).collect()
    assert(rows.nonEmpty)
    val list = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) < 40, s"list ${r.getLong(1)} is not a seed id")
      assert(r.getLong(2) <= r.getLong(0))
      assert(list(r.getLong(2)) === list(r.getLong(0)),
        s"exemplar ${r.getLong(2)} in another list than ${r.getLong(0)}")
    }
  }

  test("dedup_embedding_pairs: ordered pairs above threshold only") {
    val rows = SimilarityQueries.queries("dedup_embedding_pairs")(spark, sf)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.2 - 5e-7) // round(…,6) can dip below by half-ulp
    }
    // pairs are unique
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }
}
