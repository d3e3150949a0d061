package graft

import org.apache.spark.sql.functions._
import graft.functions.{FloatVectorCosine, VectorOps}
import graft.queries.SimilarityQueries

/** RankGapSpec's companion for THRESHOLD decisions: `dedup_semantic_fast`
  * scores with the float kernel but is hash-checked against the
  * decimal-exact oracle, which is only sound while every within-cluster
  * pair's |cos − τ| margin exceeds the float/decimal divergence (a pair
  * inside the margin could land on different sides of τ on the two
  * routes and flip a keep decision). This MEASURES both sides on the
  * fixture's trained clusters — a future fixture with a pair sitting on
  * the threshold fails here with the two numbers instead of the oracle
  * flaking.
  */
class SemanticGapSpec extends SparkSpec {

  test("within-cluster |cos - threshold| margins dominate float/decimal divergence") {
    val assigned = SimilarityQueries.trainedAssigned(spark, sf)
    val a = assigned.select(col("list_id"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("list_id"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("list_id"))
      .filter(col("va") < col("vb"))
      .select(
        (VectorOps.dotDecimal(col("ea"), col("eb")).cast("double") /
          (col("na") * col("nb"))).as("cos_dec"),
        FloatVectorCosine.cosineFast(col("ea"), col("eb")).as("cos_f"))
      .collect()
    assert(pairs.nonEmpty)

    val maxDiv = pairs.iterator
      .map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    val minMargin = pairs.iterator
      .map(r => math.abs(r.getDouble(0) - SimilarityQueries.SemDedupCos)).min

    info(f"max float/decimal divergence = $maxDiv%.3e, min |cos - tau| margin = $minMargin%.3e over ${pairs.length} pairs")
    assert(maxDiv < 1e-8,
      f"float cosine diverges from decimal by $maxDiv%.3e — kernel regression")
    assert(minMargin > 10 * maxDiv && minMargin > 1e-7,
      f"threshold margin $minMargin%.3e no longer dominates divergence $maxDiv%.3e — " +
        "dedup_semantic_fast's decimal-oracle hash check is unsound on this fixture")
  }
}
