package graft

import org.apache.spark.sql.functions._

/** The end-to-end leakage-safety invariant behind pipeline_split: a
  * VERIFIED near-duplicate pair (LSH candidate with exact Jaccard
  * ≥ 0.2 — the dedup_lsh_pairs output) must never straddle a
  * train/val/test boundary. This is not a tautology of the split
  * formula: it holds only because connected components actually merge
  * every transitive near-dup chain — an under-merging CC (or a split
  * keyed on anything finer than the component) breaks it, and this
  * spec catches that composition failure on the real fixture.
  */
class SplitLeakageSpec extends SparkSpec {

  test("no verified near-dup pair straddles a split boundary") {
    graft.queries.Artifacts.clear()
    val split = SparkEntry.queries("pipeline_split")(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = SparkEntry.queries("dedup_lsh_pairs")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("split", "split_a"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("split", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    val n = straddling.count()
    val total = pairs.count()
    info(s"$total verified near-dup pairs, $n straddling splits")
    assert(total > 0, "fixture produced no verified near-dup pairs — vacuous test")
    assert(n === 0L, s"$n near-dup pairs straddle split boundaries — eval leakage")
  }
}
