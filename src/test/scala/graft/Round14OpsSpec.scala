package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** Round-14 pins: the hier-gated kNN finishes (VERDICT r13 item 1)
  * and, as the round progresses, the absorbing markov chain and the
  * can't-twin registry.
  */
class Round14OpsSpec extends SparkSpec {

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
}
