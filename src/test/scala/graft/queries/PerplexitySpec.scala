package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Held-out perplexity (`text_perplexity_heldout`): from-scratch
  * scalar recomputation of the parity-split model (train even, score
  * odd, add-1 backoff for unseen bigrams/histories), plus the
  * rounding-margin audit for the one per-doc transcendental (exp) the
  * query emits at 4 dp.
  */
class PerplexitySpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).collect()
    .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  private lazy val rows =
    TextQueries.queries("text_perplexity_heldout")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap

  /** Scalar held-out model: per-doc UNROUNDED mean log-prob for every
    * scored (odd) doc — the engine-shared double the query's exp and
    * roundings run on.
    */
  private lazy val scalarAvg: Map[Long, Double] = {
    val train = docs.filter(_._1 % 2 == 0)
    val bigrams = train.values.flatMap(t => t.zip(t.drop(1))).toSeq
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = train.values.flatten.toSet.size
    docs.collect { case (id, t) if id % 2 == 1 && t.size >= 2 =>
      val bs = t.zip(t.drop(1))
      val slp = bs.map { b =>
        BigDecimal(math.log((c12.getOrElse(b, 0) + 1.0) / (c1.getOrElse(b._1, 0) + v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> slp.toDouble / bs.size
    }
  }

  test("per-doc score equals a from-scratch held-out scalar model") {
    assert(rows.keySet === scalarAvg.keySet) // only the held-out half is scored
    scalarAvg.keys.toSeq.sorted.take(5).foreach { id =>
      val avg = scalarAvg(id)
      val expAvg = BigDecimal(avg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expPpl = BigDecimal(math.exp(-avg)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(id).getAs[Long]("n_bigrams") === (docs(id).size - 1).toLong)
      assert(rows(id).getAs[Double]("avg_logprob_r") === expAvg, s"doc $id avg")
      assert(rows(id).getAs[Double]("ppl_r") === expPpl, s"doc $id ppl")
    }
  }

  test("unseen mass binds: held-out scores are worse than in-corpus") {
    val inCorpus = TextQueries.queries("text_bigram_lm")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob_r")).toMap
    val heldOut = rows.view.mapValues(_.getAs[Double]("avg_logprob_r")).toMap
    val common = heldOut.keySet.intersect(inCorpus.keySet)
    assert(common.nonEmpty)
    // means over the shared docs: backoff mass must cost probability
    val meanHeld = common.iterator.map(heldOut).sum / common.size
    val meanIn = common.iterator.map(inCorpus).sum / common.size
    assert(meanHeld < meanIn,
      s"held-out mean $meanHeld should be below in-corpus mean $meanIn")
  }

  test("exp rounding margin clears 1-ulp engine divergence") {
    // ppl is the only output rounded AFTER a transcendental whose
    // input is engine-shared; measure each doc's distance from its
    // 4-dp boundary (on the true unrounded value) and require it to
    // dwarf the ~1-ulp libm-vs-JDK gap.
    val margins = scalarAvg.values.map { avg =>
      val ppl = math.exp(-avg)
      val frac = BigDecimal(ppl).*(BigDecimal(10000))
        .remainder(BigDecimal(1)).abs.toDouble
      val dist = math.min(frac, 1.0 - frac) / 1e4
      (dist, math.ulp(ppl))
    }
    val (minDist, maxUlp) = (margins.map(_._1).min, margins.map(_._2).max)
    assert(minDist > 100 * maxUlp,
      s"4-dp boundary margin $minDist too close to ulp $maxUlp")
  }
}
