package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Sparse tf-idf cosine retrieval (`search_tfidf_cosine`): full
  * scalar recomputation of vectors/norms/cosine, the idf
  * 9-dp-quantization margin audit (the one transcendental), and the
  * cosine range bound.
  */
class TfidfCosineSpec extends SparkSpec {

  private val QueryTerms = Seq("dup", "spark", "vector")

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  private lazy val got = TextQueries.queries("search_tfidf_cosine")(spark, sf)
    .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_terms_hit"), r.getAs[Double]("score_r")))

  private lazy val idfRaw: Map[String, Double] = {
    val n = docs.size
    docs.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) =>
      t -> (math.log((n + 1.0) / (xs.size + 1.0)) + 1.0)
    }
  }

  test("top-20 equals a from-scratch scalar vector-space model") {
    val idfQ = idfRaw.view.mapValues(v =>
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    val qw = QueryTerms.map(idfQ)
    val nq = math.sqrt(qw.map(x => x * x).sum.toDouble)
    val scored = docs.toSeq.flatMap { case (id, toks) =>
      val tf = toks.groupBy(identity).view.mapValues(_.size).toMap
      val w = tf.map { case (t, f) => t -> (BigDecimal(f) * idfQ(t)) }
      val nd = math.sqrt(w.values.map(x => x * x).sum.toDouble)
      val hits = QueryTerms.filter(tf.contains)
      if (hits.isEmpty) None else {
        val dot = hits.map(t => idfQ(t) * w(t)).sum.toDouble
        Some((id, hits.size.toLong, dot / (nq * nd)))
      }
    }
    val want = scored.sortBy { case (id, _, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, h, s), i) =>
        (i + 1L, id, h,
         BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(got.toSeq === want)
  }

  test("idf 9-dp quantization margin clears 1-ulp ln divergence") {
    val margins = idfRaw.values.map { v =>
      val frac = BigDecimal(v).*(BigDecimal(1000000000L))
        .remainder(BigDecimal(1)).abs.toDouble
      (math.min(frac, 1.0 - frac) / 1e9, math.ulp(v))
    }
    val (minDist, maxUlp) = (margins.map(_._1).min, margins.map(_._2).max)
    assert(minDist > 100 * maxUlp,
      s"9-dp idf margin $minDist too close to ulp $maxUlp")
  }

  test("scores are genuine cosines: in (0, 1], monotone with rank") {
    assert(got.forall { case (_, _, _, s) => s > 0.0 && s <= 1.0 })
    assert(got.map(_._4).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
  }
}
