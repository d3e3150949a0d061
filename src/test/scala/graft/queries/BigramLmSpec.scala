package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Independent recomputation of the bigram-LM score from raw token
  * sequences in plain Scala — the model math (add-1 smoothing,
  * quantized log-probs, decimal mean) re-derived without DataFrames.
  */
class BigramLmSpec extends SparkSpec {

  test("per-doc score equals a from-scratch scalar recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val bigrams = docs.values.flatMap(t => t.zip(t.drop(1))).toSeq
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = docs.values.flatten.toSet.size
    val rows = TextQueries.queries("text_bigram_lm")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    // spot-check 5 deterministic docs against the scalar model
    docs.keys.toSeq.sorted.take(5).foreach { id =>
      val bs = docs(id).zip(docs(id).drop(1))
      val slp = bs.map { b =>
        BigDecimal(math.log((c12(b) + 1.0) / (c1(b._1) + v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expected = BigDecimal(slp.toDouble / bs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows(id).getAs[Long]("n_bigrams") === bs.size.toLong)
      assert(rows(id).getAs[Double]("avg_logprob_r") === expected, s"doc $id")
    }
    // all scores are genuine log-probabilities
    assert(rows.values.forall(_.getAs[Double]("avg_logprob_r") < 0.0))
  }
}
