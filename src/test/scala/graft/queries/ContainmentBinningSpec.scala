package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for containment scoring (`dedup_containment`) and
  * equal-frequency binning (`events_binning`).
  */
class ContainmentBinningSpec extends SparkSpec {

  test("containment: ratio identities, bounds, and dominance over Jaccard") {
    val rows = DedupQueries.queries("dedup_containment")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ni, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (ca, cb) = (r.getDouble(5), r.getDouble(6))
      assert(ni <= math.min(na, nb), r.toString)
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ca == r6(ni.toDouble / na) && cb == r6(ni.toDouble / nb))
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      // containment dominates Jaccard: |A∩B|/min ≥ |A∩B|/|A∪B|
      val jac = ni.toDouble / (na + nb - ni)
      assert(math.max(ca, cb) >= jac - 1e-9)
      assert(r.getBoolean(7) == (math.max(ca, cb) >= 0.8), r.toString)
    }
    // the asymmetric case exists on the fixture: a pair where one
    // direction is near-total and the other is not
    assert(rows.exists(r =>
      math.abs(r.getDouble(5) - r.getDouble(6)) > 0.1))
  }

  test("binning: equal-frequency fill, ordered non-overlapping ranges, full coverage") {
    val rows = EventQueries.queries("events_binning")(spark, sf).collect()
    val n = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L), t)
      val sizes = rs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$t sizes ${sizes.toSeq}")
      // ntile gives the remainder to the FIRST buckets
      val ordered = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ordered.sliding(2).forall { case Array(a, b) => a >= b; case _ => true }, t)
      // ranges are ordered (ties at the boundary may touch)
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3), s"$t: $a | $b")
        case _ => ()
      }
      rs.foreach(r => assert(r.getDouble(3) <= r.getDouble(4)))
    }
  }
}
