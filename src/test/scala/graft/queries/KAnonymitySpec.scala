package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for the residual k-anonymity ladder (`pipeline_k_anonymity`)
  * and its apply stage (`pipeline_anonymize`): counts recomputed from
  * raw events, the residual ladder rule, exactly-once cell coverage —
  * and the release guarantee itself: EVERY published row carries ≥ K
  * people (the property the naive whole-group ladder breaks).
  */
class KAnonymitySpec extends SparkSpec {

  private val DayMs = 86400000L
  private val WeekMs = 7L * DayMs
  private val K = EventQueries.KAnonK

  private lazy val rows =
    EventQueries.queries("pipeline_k_anonymity")(spark, sf).collect()

  private lazy val cells = Tables.events(spark, sf)
    .select(col("event_type"), col("user_id"), col("ts_ms")).collect()
    .map { r =>
      val day = r.getLong(2) - r.getLong(2) % DayMs
      (r.getString(0), r.getLong(1) % 10, day)
    }

  private lazy val nDay = cells.groupBy(identity).view.mapValues(_.length.toLong).toMap

  private lazy val rWeek = nDay.toSeq
    .filter(_._2 < K)
    .groupBy { case ((t, b, d), _) => (t, b, d - d % WeekMs) }
    .view.mapValues(_.map(_._2).sum).toMap

  private lazy val rAll = nDay.toSeq
    .filter { case ((t, b, d), n) =>
      n < K && rWeek.getOrElse((t, b, d - d % WeekMs), 0L) < K
    }
    .groupBy { case ((t, b, _), _) => (t, b) }
    .view.mapValues(_.map(_._2).sum).toMap

  test("day counts and both residuals match a raw recomputation") {
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == nDay(key), s"n_day $key")
      assert(r.getLong(4) ==
        rWeek.getOrElse((key._1, key._2, key._3 - key._3 % WeekMs), 0L),
        s"r_week $key")
      assert(r.getLong(5) == rAll.getOrElse((key._1, key._2), 0L), s"r_all $key")
    }
  }

  test("anon_level follows the residual ladder rule") {
    rows.foreach { r =>
      val (nd, rw, ra) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val expect =
        if (nd >= K) 0L else if (rw >= K) 1L else if (ra >= K) 2L else -1L
      assert(r.getLong(6) == expect, r.toString)
    }
    // the fixture exercises the ladder, not just level 0
    assert(rows.map(_.getLong(6)).distinct.length >= 2)
  }

  test("every quasi-identifier cell appears exactly once") {
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length)
    assert(got.toSet == cells.toSet)
  }

  test("release guarantee: every published row carries ≥ K people, none lost") {
    val rel = EventQueries.queries("pipeline_anonymize")(spark, sf).collect()
    assert(rel.nonEmpty)
    rel.foreach { r =>
      assert(r.getLong(4) >= K, s"sub-K published row: $r")
      assert(r.getLong(5) >= 1L)
    }
    // population conservation: published + suppressed = corpus
    val published = rel.map(_.getLong(4)).sum
    val suppressed = rows.filter(_.getLong(6) == -1L).map(_.getLong(3)).sum
    assert(published + suppressed == cells.length)
    // merged rows merge the exact residual population
    assert(rel.exists(_.getLong(5) > 1L), "no cell ever merged — apply vacuous")
  }
}
