package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for session path mining (`events_paths`): the full top-k
  * table recomputed from raw events with an independent in-memory
  * sessionizer, and the ranking/count structure.
  */
class PathsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val rows =
    EventQueries.queries("events_paths")(spark, dir).collect()

  test("top-k table matches an independent in-memory recomputation") {
    val raw = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
      .collect()
    val trigrams = raw.groupBy(_.getLong(0)).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(r => (r.getLong(2), r.getLong(1)))
      // the events_sessionize boundary rule: new session when the gap
      // exceeds 30 min
      var sid = 0L
      var prev = Long.MinValue
      val labeled = ordered.map { r =>
        if (prev == Long.MinValue || r.getLong(2) - prev > 1800000L) sid += 1
        prev = r.getLong(2)
        (sid, r.getString(3))
      }
      labeled.groupBy(_._1).toSeq.flatMap { case (s, evs) =>
        evs.map(_._2).sliding(3).filter(_.length == 3)
          .map(t => (t.mkString(">"), u * 1000000L + s))
      }
    }
    val counts = trigrams.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(_._2).distinct.length.toLong)
    }.toMap
    val expected = counts.toSeq
      .map { case (p, (n, s)) => (p, n, s) }
      .sortBy { case (p, n, _) => (-n, p) }
      .take(20).zipWithIndex
      .map { case ((p, n, s), i) => (i + 1L, p, n, s) }
    val got = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got == expected)
  }

  test("ranking and reach structure hold") {
    val sorted = rows.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getString(1) < b.getString(1)))
      case _ => ()
    }
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2), r.toString))
  }
}
