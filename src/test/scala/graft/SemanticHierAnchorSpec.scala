package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT ANCHOR for the r11-retired `dedup_semantic_hier` query
  * (VERDICT r10 item 3 — its fixed 40/6 operating point is
  * quadratic in the corpus, so it left the oracle-checked surface;
  * the production postures are the Bernoulli-gated `_scaled` twins).
  *
  * The anchor re-derives the ENTIRE two-level argmin chain through an
  * INDEPENDENT route — interpreted higher-order functions (zip_with
  * products cast to DECIMAL(28,14) HALF_UP, exact decimal aggregate,
  * double cosine finish, window row_number ranking with the
  * (cos DESC, id ASC) tiebreak) — and pins per-vector equality with
  * the compiled CentroidRanks chain the engine ships. This is the
  * same interpreter-vs-codegen cross-check the CentroidRanks scaladoc
  * claims bit-identity for, executed end-to-end at the anchor's
  * operating point, including the child→coarse pre-assignment.
  */
class SemanticHierAnchorSpec extends SparkSpec {

  private val Ncoarse = SimilarityQueries.HierNcoarse
  private val Nlist = SimilarityQueries.HierNlist

  /** Exact-decimal cosine, the interpreted way: per-element double
    * product rounded HALF_UP to DECIMAL(28,14) (a double→decimal cast
    * rounds HALF_UP, matching the compiled hybrid), exact decimal
    * sum, double finish.
    */
  private def cosHof(v: Column, cent: Column, nrm: Column, cnorm: Column): Column =
    aggregate(
      zip_with(v, cent, (x, y) => (x.cast("double") * y).cast("decimal(28,14)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,14)"),
      (acc, p) => (acc + p).cast("decimal(38,14)")).cast("double") / (nrm * cnorm)

  /** Norm the interpreted way — same decimal product/sum law. */
  private def nrmHof(v: Column): Column =
    sqrt(aggregate(
      zip_with(v, v, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(28,14)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,14)"),
      (acc, p) => (acc + p).cast("decimal(38,14)")).cast("double"))

  /** argmin assignment of `vecs` (vec_id, embedding float, nrm) over
    * `seeds` (seed_id, cent double array, cnorm) — one row per vec
    * with its winning seed, ranked (cos DESC, seed_id ASC).
    */
  private def assignHof(vecs: DataFrame, seeds: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("seed_id"))
    vecs.crossJoin(broadcast(seeds))
      .withColumn("cos", cosHof(col("embedding"), col("cent"), col("nrm"), col("cnorm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("seed_id"))
  }

  test("two-level argmin chain: interpreted HOF route == compiled CentroidRanks route") {
    val emb = graft.tables.Tables.embeddings(spark, sf)
      .withColumn("nrm", nrmHof(col("embedding")))
      .cache()
    def seedsOf(n: Int, idName: String) = emb.filter(col("vec_id") < n)
      .select(col("vec_id").as(idName),
        transform(col("embedding"), x => x.cast("double")).as("cent"))
      .withColumn("cnorm", nrmHof(col("cent")))

    val coarse = seedsOf(Ncoarse, "seed_id")
    // children pre-assigned to their coarse cell, the HOF way
    val childToCoarse = assignHof(
      emb.filter(col("vec_id") < Nlist), coarse)
      .withColumnRenamed("seed_id", "coarse_id")
      .withColumnRenamed("vec_id", "child_id")
    // every vector's coarse winner
    val vecToCoarse = assignHof(emb, coarse)
      .withColumnRenamed("seed_id", "coarse_id")
    // rank only the winning cell's children
    val children = seedsOf(Nlist, "seed_id")
      .join(childToCoarse, col("seed_id") === col("child_id"))
      .select(col("coarse_id"), col("seed_id"), col("cent"), col("cnorm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("seed_id"))
    val want = emb.join(vecToCoarse, "vec_id")
      .join(children, Seq("coarse_id"))
      .withColumn("cos", cosHof(col("embedding"), col("cent"), col("nrm"), col("cnorm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("seed_id").as("want_list"))

    val got = SimilarityQueries.hierAssignedAnchor(spark, sf)
      .select(col("vec_id"), col("list_id"))
    val joined = got.join(want, "vec_id").cache()
    val n = joined.count()
    assert(n == emb.count(), "row count mismatch")
    val diff = joined.filter(col("list_id") =!= col("want_list")).count()
    assert(diff == 0L, s"$diff of $n assignments differ between routes")
    emb.unpersist(); joined.unpersist()
  }

  test("anchor keep rule: exemplar is the cluster-min qualifying neighbor") {
    val rows = SimilarityQueries.semanticHierAnchor(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, rep, isDup) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      assert(rep <= v)
      assert(isDup == (rep != v), s"vec $v: is_dup inconsistent with rep_id")
    }
  }
}
