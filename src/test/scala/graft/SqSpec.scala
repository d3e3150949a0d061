package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries
import graft.tables.Tables

/** Laws for the SQ8 scalar-quantization family: code range, the
  * uniform-grid reconstruction error bound (the guarantee that makes
  * 4× compression usable), and the ADC recall floor against the exact
  * brute-force ranking on the fixture.
  */
class SqSpec extends SparkSpec {

  private lazy val minmax =
    SimilarityQueries.queries("sq_minmax")(spark, sf).collect()
      .map(r => r.getLong(0).toInt -> (r.getDouble(1), r.getDouble(2))).toMap

  private lazy val codes =
    SimilarityQueries.queries("sq_codes")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getInt(2)).toMap

  private lazy val raw = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  test("codes cover the int8 range and never leave it") {
    assert(codes.values.forall(c => c >= 0 && c <= 255))
    // the grid is anchored on corpus min/max, so both extremes occur
    assert(codes.values.min == 0 && codes.values.max == 255)
  }

  test("midpoint reconstruction error ≤ half a cell per dimension") {
    raw.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, d0) =>
        val (mn, mx) = minmax(d0 + 1)
        val rng = mx - mn
        val cell = rng / 255.0
        val xhat =
          if (rng == 0.0) mn
          else mn + (codes((id, d0 + 1)) + 0.5) * rng / 255.0
        assert(math.abs(x.toDouble - xhat) <= cell / 2.0 + 1e-12,
          s"vec $id dim $d0: x=$x xhat=$xhat cell=$cell")
      }
    }
  }

  test("ADC ranking recalls most of the exact brute-force top-k") {
    def topSet(name: String) =
      SimilarityQueries.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSet("ann_topk_bruteforce")
    val sq = topSet("ann_topk_sq")
    val recalls = exact.map { case (q, t) =>
      sq(q).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    info(f"SQ8 recall@5 vs exact: $mean%.2f")
    // 8-bit midpoint reconstruction loses little: the floor is far
    // above what PQ's 4-bit codes achieve on the same fixture
    assert(mean >= 0.8, f"SQ8 recall collapsed: $mean%.2f")
  }
}
