package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §2.9, 100 TB posture): when
  * one join key carries a disproportionate share of the fact rows, a
  * plain hash join sends them all to one task. Salting fans each hot
  * key out over `buckets` sub-keys — the fact side gets a
  * deterministic per-row salt, the dimension side is replicated once
  * per salt — trading `buckets`× dimension replication for a
  * `buckets`× reduction in the largest task.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) covers most cases at runtime; explicit salting is
  * for the pathological keys AQE cannot split (e.g. a single giant
  * hash-aggregation key) or engines pinned to static plans.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets): hashes the salt-by
    * columns (typically a unique id) — NOT the join key, which would
    * put every row of a hot key in the same bucket again.
    */
  def salt(saltBy: Column, buckets: Int): Column =
    pmod(hash(saltBy), lit(buckets))

  /** Inner equi-join of a skewed fact side against a dimension with
    * the dimension replicated across `buckets` salts. Result equals
    * `fact.join(dim, fact(key) === dim(dimKey))` row-for-row.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, saltBy: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(saltBy, buckets))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
