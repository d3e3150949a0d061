package graft

import org.apache.spark.sql.functions._
import graft.functions.{FloatVectorCosine, VectorOps}
import graft.tables.Tables

/** Pins the assumption behind the rank-only hash checks of
  * `ann_topk_fast` / `ann_topk_lsh_fast` (ADVICE r2): those queries
  * score with the float-order cosine kernel but are verified against
  * the DECIMAL-exact ranking, so the hash check is only sound while the
  * fixture's inter-rank cosine gaps exceed the float/decimal
  * divergence. This spec MEASURES both sides of that inequality on the
  * fixture — if a future fixture lands near-tied cosines inside the
  * divergence bound, this fails loudly with the two numbers instead of
  * the oracle flaking.
  *
  * Subset safety: any pruned candidate set (LSH buckets, IVF lists) is
  * a subset of the brute-force pair set, and adjacent gaps in a subset
  * ranking are sums of adjacent full-set gaps — so the FULL-ranking
  * minimum gap asserted here bounds every pruned variant's gap too.
  */
class RankGapSpec extends SparkSpec {

  private val NQueries = 8

  test("fixture inter-rank cosine gaps dominate float/decimal divergence") {
    val emb = Tables.embeddings(spark, sf)
      .withColumn("nrm", sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              col("nrm").as("q_nrm"))
    val pairs = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dotDecimal(col("q_emb"), col("embedding")).cast("double") /
          (col("q_nrm") * col("nrm"))).as("cos_dec"),
        FloatVectorCosine.cosineFast(col("q_emb"), col("embedding")).as("cos_f"))
      .collect()

    val maxDiv = pairs.iterator
      .map(r => math.abs(r.getDouble(2) - r.getDouble(3))).max

    // min adjacent gap over the FULL decimal ranking of every query
    val minGap = pairs.groupBy(_.getLong(0)).valuesIterator.map { rows =>
      val sorted = rows.map(r => (r.getDouble(2), r.getLong(1)))
        .sortBy { case (c, id) => (-c, id) }
      sorted.iterator.zip(sorted.iterator.drop(1))
        .map { case ((a, _), (b, _)) => a - b }.min
    }.min

    info(f"max float/decimal divergence = $maxDiv%.3e, min inter-rank gap = $minGap%.3e")
    assert(maxDiv < 1e-8,
      f"float cosine diverges from decimal by $maxDiv%.3e — kernel regression")
    assert(minGap > 10 * maxDiv && minGap > 1e-7,
      f"fixture gap $minGap%.3e no longer dominates divergence $maxDiv%.3e — " +
        "the rank-only hash checks of ann_topk_fast/ann_topk_lsh_fast are unsound " +
        "on this fixture")
  }
}
