package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** `text_quality_lr` hash-matches a 2-round Newton chain in which the
  * ONLY per-row float quantizations are the sigmoid (p → 9 dp) and
  * the x1 feature (→ 6 dp); every gradient/Hessian term is an exact
  * decimal product, so no term-level rounding boundary exists (a
  * per-term 12-dp draft measurably had a term 1.7e-18 from its
  * boundary — this design removes the hazard class). The engines'
  * exp can differ by 1 ulp, so the chain is sound only while every p
  * sits clear of its 9-dp boundary, every x1 clear of its 6-dp
  * boundary, each β update clear of its 9-dp boundary, and no
  * scoring z near the 0 decision cut. This re-derives all margins
  * through an exact BigDecimal replay of the real chain.
  */
class LrSpec extends SparkSpec {

  private val HALF_UP = BigDecimal.RoundingMode.HALF_UP

  /** Exact distance of v's full binary expansion to the nearest
    * scale-`dp` rounding boundary, in units of one grid cell.
    */
  private def boundaryMargin(v: Double, dp: Int): Double = {
    val cells = BigDecimal(v) * BigDecimal(10).pow(dp)
    val frac = cells - BigDecimal(cells.toBigInt)
    val f = if (frac < 0) frac + 1 else frac
    (f - BigDecimal("0.5")).abs.toDouble
  }

  private def featRows =
    TextQueries.lrFeatures(spark, sf)
      .select(col("y").cast("double"),
        col("x1q").cast("double"), col("x2q").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

  /** Exact BigDecimal replay of one Newton round; returns the new β
    * and the pre-rounding update doubles (for the 9-dp margin).
    */
  private def replayStep(rows: Array[(Double, Double, Double)],
                         b: (Double, Double, Double)): ((Double, Double, Double), Seq[Double], Seq[Double]) = {
    var g = Array(BigDecimal(0), BigDecimal(0), BigDecimal(0))
    var h = Array.fill(6)(BigDecimal(0))
    val pMargins = Array.newBuilder[Double]
    rows.foreach { case (y, x1, x2) =>
      val z = (b._1 + b._2 * x1) + b._3 * x2
      val p = 1.0 / (1.0 + math.exp(-z))
      pMargins += boundaryMargin(p, 9)
      val pq = BigDecimal(p).setScale(9, HALF_UP)
      val x1q = BigDecimal(x1).setScale(6, HALF_UP)
      val x2q = BigDecimal(x2).setScale(2, HALF_UP)
      val ymp = BigDecimal(y.toLong) - pq
      val w9 = (pq * (1 - pq)).setScale(9, HALF_UP)
      g = Array(g(0) + ymp, g(1) + x1q * ymp, g(2) + x2q * ymp)
      h = Array(h(0) + w9, h(1) + x1q * w9, h(2) + x2q * w9,
                h(3) + (x1q * x1q) * w9, h(4) + (x1q * x2q) * w9,
                h(5) + (x2q * x2q) * w9)
    }
    val Array(h00, h01, h02, h11, h12, h22) = h.map(_.toDouble)
    val Array(g0, g1, g2) = g.map(_.toDouble)
    val c00 = h11 * h22 - h12 * h12; val c01 = h02 * h12 - h01 * h22
    val c02 = h01 * h12 - h02 * h11; val c11 = h00 * h22 - h02 * h02
    val c12 = h01 * h02 - h00 * h12; val c22 = h00 * h11 - h01 * h01
    val det = h00 * c00 + h01 * c01 + h02 * c02
    val upd = Seq(
      b._1 + (c00 * g0 + c01 * g1 + c02 * g2) / det,
      b._2 + (c01 * g0 + c11 * g1 + c12 * g2) / det,
      b._3 + (c02 * g0 + c12 * g1 + c22 * g2) / det)
    val nb = upd.map(v => BigDecimal(v).setScale(9, HALF_UP).toDouble)
    ((nb(0), nb(1), nb(2)), upd, pMargins.result().toSeq)
  }

  private def engineBeta(rounds: Int): (Double, Double, Double) = {
    val feats = TextQueries.lrFeatures(spark, sf)
    val beta0 = spark.range(1).select(
      lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
    val bf = (1 to rounds).foldLeft(beta0)((b, _) => TextQueries.lrStep(feats, b))
      .collect().head
    (bf.getDouble(0), bf.getDouble(1), bf.getDouble(2))
  }

  test("replay matches the engine and all quantization margins hold") {
    val rows = featRows
    var b = (0.0, 0.0, 0.0)
    var allP = Seq.empty[Double]
    var allUpd = Seq.empty[Double]
    (1 to 2).foreach { t =>
      val (nb, upd, pm) = replayStep(rows, b)
      assert(nb == engineBeta(t), s"round $t: replay $nb != engine β")
      allP ++= pm; allUpd ++= upd.map(boundaryMargin(_, 9))
      b = nb
    }
    val minP = allP.min
    val minB = allUpd.min
    info(f"min p margin = $minP%.3e (9-dp cells) over ${allP.size} sigmoids")
    info(f"min β margin = $minB%.3e (9-dp cells)")
    assert(minP > 1e-6, "a sigmoid sits too close to its 9-dp boundary — " +
      "1-ulp exp divergence could flip p_q")
    assert(minB > 1e-6, "a β update sits too close to its 9-dp boundary")
  }

  test("x1 feature and scoring ln terms sit clear of their boundaries") {
    val x1raw = graft.tables.Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .select((size(expr("filter(toks, t -> t = 'the')")) * lit(10L))
        .cast("double") / size(col("toks"))).collect().map(_.getDouble(0))
    val mx = x1raw.map(boundaryMargin(_, 6)).min
    info(f"min x1 margin = $mx%.3e (6-dp cells) over ${x1raw.length} docs")
    assert(mx > 1e-6)

    val rows = featRows
    val b = engineBeta(2)
    val lnTerms = rows.map { case (y, x1, x2) =>
      val z = (b._1 + b._2 * x1) + b._3 * x2
      val p = 1.0 / (1.0 + math.exp(-z))
      if (y == 1.0) math.log(p) else math.log(1.0 - p)
    }
    val ml = lnTerms.map(boundaryMargin(_, 12)).min
    info(f"min ln-term margin = $ml%.3e (12-dp cells)")
    assert(ml > 1e-4, "a log-loss term sits too close to its 12-dp boundary")
  }

  test("calibration decile cuts and mean-p quantization sit clear") {
    val rows = featRows
    val b = engineBeta(2)
    val ps = rows.map { case (_, x1, x2) =>
      1.0 / (1.0 + math.exp(-((b._1 + b._2 * x1) + b._3 * x2))) }
    val mCut = ps.map { p =>
      val v = p * 10; math.abs(v - math.rint(v)) }.min
    info(f"min |p·10 − nearest int| = $mCut%.3e")
    assert(mCut > 1e-9,
      "a p sits on a decile boundary — the calibration bucket could " +
        "flip on 1-ulp exp divergence")
    val mQ = ps.map(boundaryMargin(_, 12)).min
    info(f"min p margin = $mQ%.3e (12-dp cells)")
    assert(mQ > 1e-4, "a mean-p term sits too close to its 12-dp boundary")
  }

  test("cross-validation: held-out accuracy confirms the in-sample fit") {
    val rows = TextQueries.queries("text_quality_lr_cv")(spark, sf).collect()
    assert(rows.length == 3, "one row per fold")
    assert(rows.map(_.getAs[Long]("n_test")).sum == 500L,
      "folds must partition the corpus")
    rows.foreach { r =>
      val acc = r.getAs[Double]("acc_r")
      info(f"fold ${r.getAs[Long]("fold")}: n=${r.getAs[Long]("n_test")} " +
        f"acc=$acc%.3f ll=${r.getAs[Double]("ll_r")}%.3f")
      assert(acc > 0.85,
        s"held-out accuracy $acc collapsed — in-sample fit was memorization")
    }
  }

  test("fit is a real distillation: accuracy ≫ base rate, z clear of 0") {
    val r = TextQueries.queries("text_quality_lr")(spark, sf).collect().head
    val n = r.getAs[Long]("n"); val nPos = r.getAs[Long]("n_pos")
    val acc = r.getAs[Double]("acc_r")
    val base = math.max(nPos.toDouble / n, 1.0 - nPos.toDouble / n)
    info(f"acc=$acc%.3f base=$base%.3f ll=${r.getAs[Double]("ll_r")}%.3f")
    assert(acc > base + 0.2, s"accuracy $acc should beat base rate $base")

    val b = engineBeta(2)
    val minAbsZ = featRows.map { case (_, x1, x2) =>
      math.abs((b._1 + b._2 * x1) + b._3 * x2) }.min
    info(f"min |z| at final β = $minAbsZ%.3e")
    assert(minAbsZ > 1e-9,
      "a scoring z sits at the decision boundary — the accuracy count " +
        "could differ between engines")
  }
}
