package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for the filter-calibration report (`text_quality_auc`): the
  * rank-sum AUC recomputed from raw (score, label) pairs, the
  * confusion matrix partition, and the P/R/F1 identities.
  */
class QualityAucSpec extends SparkSpec {

  private lazy val row =
    TextQueries.queries("text_quality_auc")(spark, sf).collect().head

  private lazy val pairs =
    TextQueries.queries("text_quality")(spark, sf)
      .select(col("doc_id"), col("quality"))
      .join(graft.tables.Tables.documents(spark, sf)
        .select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))

  test("AUC equals the exhaustive pairwise Mann-Whitney statistic") {
    val pos = pairs.filter(_._2).map(_._1)
    val neg = pairs.filterNot(_._2).map(_._1)
    var wins = 0.0
    pos.foreach { p =>
      neg.foreach { q =>
        if (p > q) wins += 1.0 else if (p == q) wins += 0.5
      }
    }
    val auc = BigDecimal(wins / (pos.length.toDouble * neg.length))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(math.abs(row.getDouble(2) - auc) < 1e-9, s"${row.getDouble(2)} vs $auc")
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) < 1.0)
  }

  test("confusion matrix partitions the corpus; P/R/F1 are its identities") {
    val (tp, fp, fn, tn) =
      (row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6))
    assert(tp + fp + fn + tn == pairs.length)
    assert(tp == pairs.count(p => p._2 && p._1 >= 0.6))
    assert(fp == pairs.count(p => !p._2 && p._1 >= 0.6))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(7) == r6(tp.toDouble / (tp + fp)))
    assert(row.getDouble(8) == r6(tp.toDouble / (tp + fn)))
    assert(row.getDouble(9) == r6(2.0 * tp / (2.0 * tp + fp + fn)))
  }
}
