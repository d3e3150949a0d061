package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** PCA power iteration (`emb_pca_power`): from-scratch scalar replay
  * of the full quantized trajectory (covariance build + 8 steps),
  * convergence of the iterate, and dominance of the returned
  * eigenvalue.
  */
class PcaPowerSpec extends SparkSpec {

  private def q(x: Double, dp: Int): BigDecimal =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)

  /** Scalar replay of the exact query arithmetic. Returns the v_k
    * trajectory (normalized iterates) and the final ‖u‖ estimate.
    */
  private lazy val (trajectory, eigval, cov) = {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).map(f => q(f.toDouble, 9)).toArray)
    val n = vecs.length
    val d = 64
    val mu = Array.tabulate(d)(i => vecs.map(_(i)).sum.toDouble / n)
    val c = Array.tabulate(d, d) { (i, j) =>
      val s = vecs.map(v => v(i) * v(j)).sum
      q(s.toDouble / n - mu(i) * mu(j), 12)
    }
    var v = Array.fill(d)(BigDecimal(0.125))
    var lam = 0.0
    val traj = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    (1 to 8).foreach { _ =>
      val u = Array.tabulate(d)(i =>
        q((0 until d).map(j => c(i)(j) * v(j)).sum.toDouble, 12))
      lam = math.sqrt(u.map(x => x * x).sum.toDouble)
      v = u.map(x => q(x.toDouble / lam, 12))
      traj += v.map(_.toDouble)
    }
    (traj.toSeq, lam, c)
  }

  test("loadings and eigenvalue equal the scalar quantized trajectory") {
    val got = SimilarityQueries.queries("emb_pca_power")(spark, sf)
      .collect().map(r => r.getAs[Long]("dim_idx") ->
        (r.getAs[Double]("loading_r"), r.getAs[Double]("eigval_r"))).toMap
    assert(got.size === 64)
    val vFinal = trajectory.last
    val lamR = q(eigval, 6).toDouble
    (0 until 64).foreach { i =>
      assert(got(i.toLong)._1 === q(vFinal(i), 6).toDouble, s"dim $i")
      assert(got(i.toLong)._2 === lamR)
    }
  }

  test("recovers a planted spike: loadings align with the true axis") {
    // the fixture is isotropic by construction (λ₂/λ₁ ≈ 0.93 at
    // sf0.001 — no dominant direction to find), so algorithmic
    // recovery is proven on synthetic data with a planted principal
    // axis, run through the REAL Spark chain (the KMeansTrainSpec
    // pattern).
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val d = 64
    val axis = Array.tabulate(d)(i => math.sin(i + 1.0))
    val nrm = math.sqrt(axis.map(x => x * x).sum)
    val e1 = axis.map(_ / nrm)
    val rows = (0 until 300).map { id =>
      val a = 3.0 * rnd.nextGaussian()
      val emb = Array.tabulate(d)(i =>
        (a * e1(i) + 0.1 * rnd.nextGaussian()).toFloat)
      (id.toLong, emb.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = SimilarityQueries.pcaPowerOf(df, rounds = 8)
      .collect().map(r => r.getAs[Long]("dim_idx") ->
        (r.getAs[Double]("loading_r"), r.getAs[Double]("eigval_r"))).toMap
    val v = (0 until d).map(i => out(i.toLong)._1).toArray
    val cosAlign = math.abs(v.zip(e1).map { case (a, b) => a * b }.sum)
    assert(cosAlign > 0.99, s"recovered axis misaligned: |cos| = $cosAlign")
    // planted top eigenvalue ≈ Var(a)·1 + noise var ≈ 9; loose band
    val eig = out(0L)._2
    assert(eig > 5.0 && eig < 14.0, s"eigval $eig outside the planted band")
  }

  test("moment partials merge: split-corpus Gramians equal one-pass") {
    // the stream_pca law, engine-side on the fixture: moments built
    // from two disjoint halves, unioned, must finish identically to
    // the one-pass chain
    val emb = Tables.embeddings(spark, sf)
    val onePass = SimilarityQueries.pcaPowerOf(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val merged = SimilarityQueries.pcaFinish(
      SimilarityQueries.pcaMoments(emb.filter(col("vec_id") % 2 === 0))
        .unionByName(
          SimilarityQueries.pcaMoments(emb.filter(col("vec_id") % 2 === 1))))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(merged === onePass)
  }

  test("eigenvalue dominates every coordinate variance") {
    // lambda >= v^T C v for unit v; in particular >= each diagonal
    val maxDiag = (0 until 64).map(i => cov(i)(i).toDouble).max
    assert(eigval >= maxDiag - 1e-9,
      s"eigval $eigval below max coordinate variance $maxDiag")
  }
}
