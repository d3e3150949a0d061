package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** `text_quality_nb`'s decision s₁ > s₀ is an exact decimal compare —
  * the only float anywhere is the one-time 9-dp quantization of each
  * model entry. This pins (a) every model log-prob's distance to its
  * 9-dp boundary (the only place 1-ulp ln divergence could leak in),
  * (b) that no document sits on an exact decision tie, and (c) the
  * fit's sanity vs the base rate and vs the discriminative LR.
  */
class NbSpec extends SparkSpec {

  private def boundaryMargin(v: Double, dp: Int): Double = {
    val cells = BigDecimal(v) * BigDecimal(10).pow(dp)
    val frac = cells - BigDecimal(cells.toBigInt)
    val f = if (frac < 0) frac + 1 else frac
    (f - BigDecimal("0.5")).abs.toDouble
  }

  test("model log-probs and priors sit clear of the 9-dp boundary") {
    val lt = TextQueries.lrLabeledTokens(spark, sf)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val model = lt.groupBy(_._2).map { case (tok, xs) =>
      (tok, xs.count(_._1 == 1L).toLong, xs.count(_._1 == 0L).toLong) }.toSeq
    val t1 = model.map(_._2).sum; val t0 = model.map(_._3).sum
    val v = model.size
    val entries = model.flatMap { case (_, c1, c0) =>
      Seq(math.log((c1 + 1).toDouble / (t1 + v)),
          math.log((c0 + 1).toDouble / (t0 + v))) }
    val m = entries.map(boundaryMargin(_, 9)).min
    info(f"min model-entry margin = $m%.3e (9-dp cells) over ${entries.size}")
    assert(m > 1e-6, "a model log-prob sits too close to its 9-dp boundary")
  }

  test("no document sits on an exact decision tie; fit beats base rate") {
    val HALF_UP = BigDecimal.RoundingMode.HALF_UP
    val lt = TextQueries.lrLabeledTokens(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val model = lt.groupBy(_._3).map { case (tok, xs) =>
      tok -> (xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong) }
    val t1 = model.values.map(_._1).sum; val t0 = model.values.map(_._2).sum
    val v = model.size
    def q9(x: Double) = BigDecimal(x).setScale(9, HALF_UP)
    val lp = model.map { case (tok, (c1, c0)) =>
      tok -> (q9(math.log((c1 + 1).toDouble / (t1 + v))),
              q9(math.log((c0 + 1).toDouble / (t0 + v)))) }
    val docs = lt.groupBy(_._1)
    val n1 = docs.count(_._2.head._2 == 1L); val n0 = docs.size - n1
    val pr1 = q9(math.log(n1.toDouble / (n1 + n0)))
    val pr0 = q9(math.log(n0.toDouble / (n1 + n0)))
    val gaps = docs.values.map { xs =>
      val s1 = xs.map(x => lp(x._3)._1).sum + pr1
      val s0 = xs.map(x => lp(x._3)._2).sum + pr0
      (s1 - s0).abs
    }
    val minGap = gaps.min
    info(f"min |s1 − s0| decision gap = ${minGap.toDouble}%.3e (exact decimal)")
    assert(minGap > 0, "a document sits on an exact decision tie")

    val r = TextQueries.queries("text_quality_nb")(spark, sf).collect().head
    val base = math.max(n1, n0).toDouble / (n1 + n0)
    val acc = r.getAs[Double]("acc_r")
    info(f"NB acc=$acc%.3f base=$base%.3f (LR reference ≈ 0.946)")
    assert(acc > base + 0.05,
      s"NB accuracy $acc should beat the base rate $base")
  }
}
