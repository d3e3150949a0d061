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

  test("modularity: exact recompute from edges+labels; one-cluster partitions score zero") {
    val rows = DedupQueries.queries("graph_modularity")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val edges = DedupQueries.lshEdges(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lbl = DedupQueries.queries("dedup_cc")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.length.toDouble
    val eIn = edges.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy { case (a, _) => lbl(a) }.view.mapValues(_.length.toLong).toMap
    val dSum = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(lbl).view.mapValues(_.length.toLong).toMap
    var q = BigDecimal(0)
    dSum.foreach { case (c, d) =>
      val qc = BigDecimal(eIn.getOrElse(c, 0L) / m - (d / (2 * m)) * (d / (2 * m)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val (ge, gd, gq) = rows(c)
      assert(ge == eIn.getOrElse(c, 0L) && gd == d, s"component $c")
      assert(gq == qc.toDouble, s"component $c: $gq vs $qc")
      q += qc
    }
    assert(rows(-1L)._3 == q.toDouble)
    assert(rows(-1L)._3 >= -0.5 && rows(-1L)._3 <= 1.0)
    // degenerate-partition identity: if ALL edges are intra-component
    // of a single component, its q_c is 1·(m/m) − 1² = 0
    if (dSum.size == 1) assert(rows(-1L)._3 == 0.0)
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
