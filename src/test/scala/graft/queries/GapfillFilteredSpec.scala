package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for the two round-7 additions that are easy to get subtly
  * wrong: gap-fill (grid density and carry semantics) and filtered
  * ANN (pre-filter vs post-filter).
  */
class GapfillFilteredSpec extends SparkSpec {

  test("gapfill: dense grid, gaps carry the last observed value") {
    val rows = EventQueries.queries("events_gapfill")(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val hours = rows.map(_.getLong(1)).distinct.length
    // the grid is the full cross product — that is what "dense" means
    assert(rows.length === types * hours)
    // after a type's first observation, locf is never null again
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      val firstObs = ordered.indexWhere(!_.getBoolean(3))
      assert(ordered.drop(firstObs).forall(r => !r.isNullAt(4)), t)
      // and every pre-observation row is null (nothing to carry)
      assert(ordered.take(firstObs).forall(_.isNullAt(4)), t)
    }
    // gaps exist at this sf — the operator is not vacuous
    assert(rows.exists(_.getBoolean(3)))
  }

  test("lerp: anchors exact at observations, interpolations between their anchors") {
    val gf = EventQueries.queries("events_gapfill")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val lerp = EventQueries.queries("events_gapfill_lerp")(spark, sf).collect()
    var interpolated = 0
    lerp.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      if (!r.getBoolean(2)) {
        // at an observation the lerp IS the observed hourly mean (the
        // locf query carries the same value at observation rows)
        assert(r.getDouble(3) === gf(key).getDouble(4), key.toString)
      } else if (!r.isNullAt(3)) {
        interpolated += 1
        // an interpolated value never escapes the corpus value range
        assert(r.getDouble(3) >= -1e-6 && r.getDouble(3) <= 1000.0, r.toString)
      }
    }
    assert(interpolated > 0, "no gap was interpolated — vacuous")
  }

  test("filtered ANN: every neighbor satisfies the query's predicate") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = SimilarityQueries.queries("ann_topk_filtered")(spark, sf).collect()
    res.foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) === labels(r.getAs[Long]("q_id")),
        s"neighbor crosses the predicate: $r")
    }
    // the predicate binds: filtered neighbors differ from unfiltered
    val unfiltered = SimilarityQueries.queries("ann_topk_fast")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val changed = res.count(r =>
      unfiltered((r.getLong(0), r.getLong(1))) != r.getLong(2))
    assert(changed > 0, "filter never changed a ranking — vacuous predicate")
  }
}
