package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.queries.SimilarityQueries

/** Recall + structural invariants for the product-quantization path.
  * Like the LSH/IVF floors (AnnRecallSpec), the ≥0.6 design floor is
  * asserted on deterministic CLUSTERED data — for PQ on the two-stage
  * composition (ADC shortlist + exact re-rank), because an 8-byte code
  * word cannot order members WITHIN a tight cluster by construction
  * (all of them share a code); what the compressed scan must get right
  * is the region (asserted exactly) and what the composition must get
  * right is the final top-k (asserted ≥0.6; measures 1.0). On the
  * unstructured parquet fixture neither stage has structure to exploit
  * (ADC ≈ 0.1, rerank ≈ 0.35) — pinned only as "rerank ≥ ADC", the
  * ordering that must always hold.
  */
class PqRecallSpec extends SparkSpec {

  private val Dim = 64
  private val TopK = 5
  private val NClusters = 12
  private val PerCluster = 20
  private val NQ = 8
  private val Rerank = 20

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0)

  private lazy val vectors: Seq[(Long, Seq[Float])] =
    (0 until NClusters).flatMap { c =>
      val center = lcg(c * 7919L + 13L).take(Dim).toSeq
      (0 until PerCluster).map { m =>
        val noise = lcg(c * 104729L + m * 31L + 7L).take(Dim).toSeq
        val v = center.zip(noise).map { case (x, n) => (x + 0.05 * n).toFloat }
        ((c * PerCluster + m).toLong, v)
      }
    }

  /** Ground truth by exhaustive double-precision INNER PRODUCT (the
    * metric ADC approximates).
    */
  private lazy val truth: Map[Long, Set[Long]] = {
    def ip(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    (0 until NQ).map { q =>
      val qv = vectors(q)._2
      val top = vectors.filter(_._1 != q.toLong)
        .map { case (id, v) => (id, ip(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(TopK).map(_._1).toSet
      q.toLong -> top
    }.toMap
  }

  private def recall(got: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

  private def topsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

  test("PQ on clustered data: ADC shortlist is cluster-exact; +rerank recall@5 >= 0.6") {
    import spark.implicits._
    // Cluster-aligned codebook (modeling a trained one): every member
    // of a tight cluster encodes to the SAME 8-byte code word, so raw
    // ADC resolves clusters, not within-cluster order — recall@k
    // against exact truth is 0 BY CONSTRUCTION at this compression
    // (codes are 32× smaller than the vectors; there is nothing left
    // to order ties with). What PQ must deliver — and what production
    // systems measure — is recall@R: the ADC shortlist lands in the
    // right region, the exact re-rank restores the fine order.
    val emb = vectors.toDF("vec_id", "embedding")
    val centArr = SimilarityQueries.pqCentArrOf(
      SimilarityQueries.pqCodebookLongOf(emb, col("vec_id") / PerCluster))
    val enc = SimilarityQueries.pqEncodedOf(emb, centArr)
    val adc = SimilarityQueries.adcRankedOf(emb, centArr, enc, NQ, NClusters)

    // cluster precision of the compressed scan: the query's
    // PerCluster−1 top ADC rows are exactly its cluster mates
    val shortTop = adc.filter(col("rank") <= PerCluster - 1)
      .select(col("q_id"), col("vec_id")).collect()
    val wrongCluster = shortTop.count(r =>
      r.getLong(1) / PerCluster != r.getLong(0) / PerCluster)
    info(s"clustered ADC top-${PerCluster - 1}: $wrongCluster/${shortTop.length} off-cluster")
    assert(wrongCluster === 0, "compressed scan missed the query's own cluster")

    // shortlist-20 + exact re-rank: full recall of the exact top-5
    val cand = adc.filter(col("rank") <= Rerank).select(col("q_id"), col("vec_id"))
    val qe = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("ipx").desc, col("vec_id"))
    val rr = cand.join(emb, "vec_id").join(broadcast(qe), "q_id")
      .withColumn("ipx", VectorOps.dotDecimal(col("q_emb"), col("embedding")).cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
    val r2 = recall(topsOf(rr))
    info(f"clustered PQ ADC+rerank recall@5 = $r2%.3f")
    assert(r2 >= 0.6, f"recall $r2%.3f below design floor 0.6")
  }

  test("fixture codes are total and in range; rerank recall >= raw ADC recall") {
    val codes = SimilarityQueries.queries("pq_codes")(spark, sf).collect()
    val nVec = graft.tables.Tables.embeddings(spark, sf).count()
    assert(codes.length.toLong === nVec * 8, "8 codes per vector")
    codes.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) < 16L,
        s"code out of range: ${r.getLong(2)}")
    }
    // fixture truth = exact-decimal cosine brute force (ann_topk_bruteforce)
    val bf = topsOf(SimilarityQueries.queries("ann_topk_bruteforce")(spark, sf))
    val adc = topsOf(SimilarityQueries.queries("ann_topk_pq")(spark, sf))
    val rr = topsOf(SimilarityQueries.queries("ann_topk_pq_rerank")(spark, sf))
    def rec(g: Map[Long, Set[Long]]) =
      bf.map { case (q, t) => g.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        .sum / bf.size
    val (ra, rrr) = (rec(adc), rec(rr))
    info(f"fixture ADC recall@5 = $ra%.3f, rerank = $rrr%.3f")
    assert(rrr >= ra, "rerank must not lose recall vs raw ADC")
  }
}
