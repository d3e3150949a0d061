package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Independent recomputation + retrieval-semantics checks for BM25 and
  * the inverted index: the score math is re-derived from raw counts in
  * plain Scala (no DataFrame), and the rare query term must dominate
  * the ranking (that is what idf is FOR).
  */
class Bm25Spec extends SparkSpec {

  private val terms = Seq("dup", "spark", "vector")

  test("top-1 score equals a from-scratch scalar recomputation") {
    val top = TextQueries.queries("text_bm25")(spark, sf)
      .collect().minBy(_.getAs[Long]("rank"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val id = top.getAs[Long]("doc_id")
    val score = terms.map { t =>
      val tf = docs(id).count(_ == t).toDouble
      if (tf == 0) BigDecimal(0)
      else {
        val df = docs.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val tfn = tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (docs(id).size / avgdl)))
        BigDecimal(idf * tfn).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
    }.sum
    assert(score.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble ===
      top.getAs[Double]("score_r"), top.toString)
  }

  test("the rare term dominates: every top-20 doc contains it") {
    val topIds = TextQueries.queries("text_bm25")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val withRare = Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(topIds.subsetOf(withRare),
      s"docs without 'dup' outranked rare-term docs: ${topIds -- withRare}")
  }

  test("posting heads are the true 10 smallest doc ids per token") {
    val row = TextQueries.queries("text_inverted_index")(spark, sf)
      .collect().minBy(_.getAs[Long]("rank"))
    val tok = row.getAs[String]("token")
    val expected = Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), tok))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.take(10)
    assert(row.getAs[String]("postings_head") === expected.mkString(","))
  }

  test("keyword extraction: scores recompute from raw tf/df, ranks ordered, ≤3 per doc") {
    import graft.tables.Tables
    val rows = TextQueries.queries("text_keywords")(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = toks.length
    val tf = toks.flatMap { case (d, ts) => ts.map(t => (d, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.toSeq.map(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    def idf6(dfv: Long): BigDecimal =
      BigDecimal(math.log(1.0 + ((n - dfv).toDouble + 0.5) / (dfv + 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { r =>
      val (d, t) = (r.getLong(0), r.getString(2))
      assert(r.getLong(3) == tf((d, t)) && r.getLong(4) == df(t))
      assert(r.getDouble(5) == (idf6(df(t)) * BigDecimal(tf((d, t)))).toDouble)
    }
    rows.groupBy(_.getLong(0)).foreach { case (d, rs) =>
      assert(rs.length <= 3 && rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length))
      // the extracted keywords genuinely are the doc's best-scoring terms
      val all = toks.toMap.apply(d).distinct
        .map(t => (t, (idf6(df(t)) * BigDecimal(tf((d, t)))).toDouble))
        .sortBy { case (t, sc) => (-sc, t) }.take(rs.length)
      assert(rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq == all.map(_._1))
    }
  }

  test("posting-head rank filter plans as a group limit, not a full sort-collect") {
    // the shipped query's FINAL frame is a TinyOrder rank whose eager
    // localCheckpoint truncates the executed plan to a checkpoint
    // scan, so the group-limit assertion reads the pre-rank chain
    // (the same frame the query ranks — not a replica)
    val plan = TextQueries.invertedIndexTop20(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rn<=10 not pushed to WindowGroupLimit:\n${plan.take(1500)}")
  }
}
