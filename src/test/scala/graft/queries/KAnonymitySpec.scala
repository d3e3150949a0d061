package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for the k-anonymity generalization ladder
  * (`pipeline_k_anonymity`): counts recomputed from raw events, the
  * count-nesting law, the privacy guarantee at the chosen level, and
  * exactly-once cell coverage.
  */
class KAnonymitySpec extends SparkSpec {

  private val DayMs = 86400000L
  private val WeekMs = 7L * DayMs

  private lazy val rows =
    EventQueries.queries("pipeline_k_anonymity")(spark, sf).collect()

  private lazy val cells = Tables.events(spark, sf)
    .select(col("event_type"), col("user_id"), col("ts_ms")).collect()
    .map { r =>
      val day = r.getLong(2) - r.getLong(2) % DayMs
      (r.getString(0), r.getLong(1) % 10, day)
    }

  test("all three level counts match a raw recomputation") {
    val nDay = cells.groupBy(identity).view.mapValues(_.length).toMap
    val nWeek = cells.map { case (t, b, d) => (t, b, d - d % WeekMs) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val nAll = cells.map { case (t, b, _) => (t, b) }
      .groupBy(identity).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == nDay(key), s"n_day $key")
      assert(r.getLong(4) == nWeek((key._1, key._2, key._3 - key._3 % WeekMs)),
        s"n_week $key")
      assert(r.getLong(5) == nAll((key._1, key._2)), s"n_all $key")
    }
  }

  test("counts nest: n_day ≤ n_week ≤ n_all") {
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5),
        r.toString)
    }
  }

  test("the chosen level carries ≥ K people — and no finer level does") {
    val k = EventQueries.KAnonK
    rows.foreach { r =>
      val (nd, nw, na) = (r.getLong(3), r.getLong(4), r.getLong(5))
      r.getLong(6) match {
        case 0L => assert(nd >= k)
        case 1L => assert(nw >= k && nd < k)
        case 2L => assert(na >= k && nw < k)
        case -1L => assert(na < k)
        case l => fail(s"unknown level $l")
      }
    }
    // the fixture exercises the ladder, not just level 0
    assert(rows.map(_.getLong(6)).distinct.length >= 2)
  }

  test("every quasi-identifier cell appears exactly once") {
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length)
    assert(got.toSet == cells.toSet)
  }
}
