package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.queries.{SimilarityQueries, TextQueries}

/** The two round-11 evaluation-harness operators: simplified
  * silhouette must ORDER clusterings (planted well-separated clusters
  * score near 1, deliberately overlapping ones near 0), and NDCG must
  * satisfy its identity (a ranking that agrees with the grades scores
  * exactly 1.0) and be order-sensitive (an inverted ranking scores
  * strictly lower).
  */
class SilNdcgSpec extends SparkSpec {

  private def embFrame(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("nrm",
        sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")))
  }

  private def centFrame(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("list_id", "centroid")
      .withColumn("cnorm",
        sqrt(VectorOps.normSqDecimal(col("centroid")).cast("double")))
  }

  test("silhouette separates tight clusters from overlapping ones") {
    // tight: members hug their centroid axis; the other axis is far
    val tight = embFrame((0 until 20).map { i =>
      val axis = i % 2
      val v = Array.fill(4)(0.01f)
      v(axis) = 1.0f
      v(2 + axis) = 0.05f + 0.001f * i
      (i.toLong, v)
    })
    val cents = centFrame(Seq(
      (0L, Array(1.0f, 0.0f, 0.05f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.05f))))
    val sTight = SimilarityQueries.silhouetteOf(tight, cents).collect()
    assert(sTight.nonEmpty)
    sTight.foreach { r =>
      assert(r.getAs[Double]("sil_r") > 0.8,
        s"tight cluster ${r.getAs[Long]("list_id")} scored ${r.getAs[Double]("sil_r")}")
    }
    // overlapping: every member sits BETWEEN the two centroids
    val blur = embFrame((0 until 20).map { i =>
      (100L + i, Array(1.0f, 1.0f + 0.001f * i, 0.0f, 0.0f))
    })
    val sBlur = SimilarityQueries.silhouetteOf(blur, cents).collect()
    sBlur.foreach { r =>
      assert(math.abs(r.getAs[Double]("sil_r")) < 0.3,
        s"overlapping cluster scored ${r.getAs[Double]("sil_r")}")
    }
    // range law on the fixture query
    val fix = SimilarityQueries.queries("emb_silhouette")(spark, sf).collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      val v = r.getAs[Double]("sil_r")
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"silhouette out of range: $v")
    }
  }

  test("kNN vote: perfect on same-label edges, truthful 1/k on the isotropic fixture") {
    import spark.implicits._
    // planted: every vector's neighbors share its label → accuracy 1
    val labels = (0 until 60).map(i => (i.toLong, (i % 3).toLong))
      .toDF("vec_id", "label")
    val goodEdges = (0 until 60).flatMap { i =>
      (1 to 3).map(k => (i.toLong, ((i + 3 * k) % 60).toLong)) // same residue class
    }.toDF("src", "dst")
    val good = SimilarityQueries.knnAccuracyOf(goodEdges, labels).collect()
    good.foreach(r => assert(r.getAs[Double]("acc_r") === 1.0))
    // adversarial: neighbors are the OTHER classes → accuracy 0
    val badEdges = (0 until 60).map(i => (i.toLong, ((i + 1) % 60).toLong))
      .toDF("src", "dst")
    val bad = SimilarityQueries.knnAccuracyOf(badEdges, labels).collect()
    bad.foreach(r => assert(r.getAs[Double]("acc_r") === 0.0))
    // the fixture's embeddings are near-isotropic (PcaPowerSpec), so
    // the eval must give the truthful low answer — near the 1/10
    // random baseline, nowhere near separable
    val fix = SimilarityQueries.queries("emb_knn_accuracy")(spark, sf).collect()
    val acc = fix.map(_.getAs[Long]("n_correct")).sum.toDouble /
      fix.map(_.getAs[Long]("n")).sum
    assert(acc > 0.02 && acc < 0.4,
      s"isotropic fixture should read near the random baseline, got $acc")
  }

  test("NDCG identity and order sensitivity") {
    import spark.implicits._
    val top = (1 to 10).map(r => (r.toLong, (100 + r).toLong))
      .toDF("rank", "doc_id")
    // grades agree with the ranking: decreasing in rank → NDCG = 1
    val agree = (1 to 10).map(r => ((100 + r).toLong, (10 - r).toLong min 4L))
      .toDF("doc_id", "grade")
    val perfect = TextQueries.ndcgOf(spark, top, agree).collect().head
    assert(perfect.getAs[Double]("ndcg_r") === 1.0,
      s"self-consistent ranking: ${perfect.getAs[Double]("ndcg_r")}")
    // inverted grades → strictly below 1
    val invert = (1 to 10).map(r => ((100 + r).toLong, (r - 1).toLong min 4L))
      .toDF("doc_id", "grade")
    val bad = TextQueries.ndcgOf(spark, top, invert).collect().head
    assert(bad.getAs[Double]("ndcg_r") < 0.95)
    assert(bad.getAs[Double]("ndcg_r") > 0.0)
    // missing relevance rows degrade to grade 0, not an error
    val sparse = Seq((101L, 3L)).toDF("doc_id", "grade")
    val sp = TextQueries.ndcgOf(spark, top, sparse).collect().head
    assert(sp.getAs[Double]("ndcg_r") === 1.0) // lone graded doc is at rank 1
    assert(sp.getAs[Long]("n") === 10L)
  }
}
