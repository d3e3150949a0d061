package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec
import graft.tables.Tables

/** Pins the KMV sketch's two load-bearing properties: the distributed
  * bucket-selection returns EXACTLY the bottom-k set (vs the naive
  * per-group sort window it replaces), and the estimators land within
  * the theory bounds on the fixture (k=256 ⇒ σ ≈ 1/√(k−2) ≈ 6.3%).
  */
class KmvSpec extends SparkSpec {

  test("bucket selection equals the naive per-group sort window") {
    val hashed = EventQueries.kmvHashes(Tables.events(spark, sf))
    val fast = EventQueries.kmvKMin(hashed, "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val naive = hashed.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= EventQueries.KmvK)
      .select(col("event_type"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fast === naive)
  }

  test("distinct estimate within 4 sigma; exact below k") {
    EventQueries.queries("sketch_kmv")(spark, sf).collect().foreach { r =>
      val (nSeen, rel) = (r.getAs[Long]("n_seen"), r.getAs[Double]("rel_err_r"))
      if (nSeen < EventQueries.KmvK) assert(rel === 0.0, r.toString)
      else assert(math.abs(rel) < 4.0 / math.sqrt(EventQueries.KmvK - 2.0), r.toString)
    }
  }

  test("jaccard estimate tracks the exact intersection") {
    EventQueries.queries("sketch_kmv_jaccard")(spark, sf).collect().foreach { r =>
      val est = r.getAs[Double]("jaccard_est_r")
      val truth = r.getAs[Double]("jaccard_true_r")
      // ρ is a hypergeometric proportion over k draws: generous 4σ-ish
      // absolute band (the fixture overlap is high, so this is tight
      // in practice)
      assert(math.abs(est - truth) < 0.15, s"est $est vs true $truth: $r")
    }
  }
}
