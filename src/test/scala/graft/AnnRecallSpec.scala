package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Recall floor for the pruned ANN paths on data with cluster
  * structure (VERDICT r1 item 5). The parquet fixture is unstructured
  * (recall there ≈ scanned fraction — measured and pinned in
  * SimilarityQueriesSpec), so the ≥0.6 design floor is asserted here
  * on a deterministic clustered set, where sign-LSH bucketing and
  * IVF-style list pruning have actual signal to exploit: members of a
  * tight cluster agree on nearly every hyperplane sign, so multi-probe
  * LSH finds them while searching a few of 256 buckets.
  */
class AnnRecallSpec extends SparkSpec {

  private val Dim = 64
  private val NPlanes = 8
  private val TopK = 5
  private val NClusters = 12
  private val PerCluster = 20
  private val NQ = 8

  /** Deterministic LCG in [-1, 1). */
  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0)

  /** NClusters tight clusters: center ~ U(-1,1)^64, member = center +
    * 0.05·noise — same-cluster cosine ≈ 0.99, cross-cluster ≈ 0.
    */
  private lazy val vectors: Seq[(Long, Seq[Float])] = {
    (0 until NClusters).flatMap { c =>
      val center = lcg(c * 7919L + 13L).take(Dim).toSeq
      (0 until PerCluster).map { m =>
        val noise = lcg(c * 104729L + m * 31L + 7L).take(Dim).toSeq
        val v = center.zip(noise).map { case (x, n) => (x + 0.05 * n).toFloat }
        ((c * PerCluster + m).toLong, v)
      }
    }
  }

  /** Ground truth by exhaustive double-precision cosine. */
  private lazy val truth: Map[Long, Set[Long]] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    (0 until NQ).map { q =>
      val qv = vectors(q)._2
      val top = vectors.filter(_._1 != q.toLong)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(TopK).map(_._1).toSet
      q.toLong -> top
    }.toMap
  }

  private def recall(got: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

  test("multi-probe LSH recall@5 >= 0.6 on clustered data") {
    import spark.implicits._
    val emb = vectors.toDF("vec_id", "embedding")
      .withColumn("bucket", VectorOps.lshBucket(col("embedding"), Dim, NPlanes))
      .withColumn("nrm", sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")))
    // same shape as the ann_topk_lsh query: probe own bucket + the
    // NPlanes buckets at Hamming distance 1
    val q = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(array(
          col("bucket") +: (0 until NPlanes).map(j =>
            col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val got = emb.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        VectorOps.dotDecimal(col("q_emb"), col("embedding")).cast("double") /
          (col("q_nrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val r = recall(got)
    info(f"clustered multi-probe LSH recall@5 = $r%.3f")
    assert(r >= 0.6, f"recall $r%.3f below design floor 0.6")
  }

  test("IVF nprobe=2 recall@5 >= 0.6 on clustered data") {
    import spark.implicits._
    // true cluster ids as IVF lists (the query derives lists from the
    // label column the same way)
    val emb = vectors.toDF("vec_id", "embedding")
      .withColumn("list_id", (col("vec_id") / PerCluster).cast("long"))
      .withColumn("nrm", sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")))
    val byDim = emb.select(col("list_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("list_id"), col("i"))
      .agg((sum(col("x").cast("double").cast("decimal(28,14)")).cast("double") /
            count(lit(1))).as("c"))
    val cents = byDim.groupBy(col("list_id"))
      .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("pairs"))
      .select(col("list_id").as("c_list"),
              transform(col("pairs"), p => p.getField("c")).as("centroid"))
    // queries probe their 2 nearest centroids
    val qc = emb.filter(col("vec_id") < NQ).crossJoin(cents)
      .withColumn("ccos",
        VectorOps.dotDecimal(col("embedding"), col("centroid")).cast("double") /
          (col("nrm") * sqrt(VectorOps.normSqDecimal(col("centroid")).cast("double"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_list"))))
      .filter(col("rk") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              col("nrm").as("q_nrm"), col("c_list").as("list_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val got = emb.join(broadcast(qc), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        VectorOps.dotDecimal(col("q_emb"), col("embedding")).cast("double") /
          (col("q_nrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val r = recall(got)
    info(f"clustered IVF nprobe=2 recall@5 = $r%.3f")
    assert(r >= 0.6, f"recall $r%.3f below design floor 0.6")
  }
}
