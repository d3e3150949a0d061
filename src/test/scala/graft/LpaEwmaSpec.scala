package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, EventQueries}

/** Property pins for the round-9 series/graph additions:
  * `events_ewma`'s kernel recomputed independently in Scala, and
  * `graph_lpa`'s structural laws against the CC ground truth.
  */
class LpaEwmaSpec extends SparkSpec {

  test("events_ewma matches an independent per-series recomputation") {
    val rows = EventQueries.queries("events_ewma")(spark, sf)
      .filter(col("event_type") === "click")
      .orderBy(col("ts_ms"), col("event_id")).collect()
    assert(rows.nonEmpty)
    val series = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("ts_ms"), col("value"))
      .orderBy(col("ts_ms"), col("event_id")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")))

    val alpha = 0.2
    series.indices.foreach { t =>
      val lo = math.max(0, t - 31)
      // quantized-term fold, oldest→newest like the query's frame
      val expected = BigDecimal((lo to t).map { j =>
        val lag = t - j
        BigDecimal(series(j)._2 * alpha * math.pow(0.8, lag))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = rows(t).getAs[Double]("ewma")
      assert(math.abs(got - expected) < 1e-9,
        s"event ${series(t)._1}: ewma $got != recomputed $expected")
    }
  }

  test("graph_lpa communities refine the CC components and reach a fixpoint") {
    val lpa = DedupQueries.queries("graph_lpa")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("community_id")).toMap
    val cc = DedupQueries.queries("dedup_cc")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    assert(lpa.keySet === cc.keySet)

    // labels propagate only along edges ⇒ a community never spans two
    // CC components (LPA refines the CC partition)
    val byCommunity = lpa.groupBy(_._2).view.mapValues(_.keys.toSeq)
    byCommunity.foreach { case (cid, members) =>
      val comps = members.map(cc).distinct
      assert(comps.size === 1,
        s"community $cid spans CC components $comps")
    }
    val nCommunities = lpa.values.toSet.size
    val nComponents = cc.values.toSet.size
    info(s"$nCommunities LPA communities over $nComponents CC components")
    assert(nCommunities >= nComponents)

    // determinism: a rerun (fresh artifacts path is memoized per
    // session, but the vote rounds re-execute) reproduces the labels
    val again = DedupQueries.queries("graph_lpa")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("community_id")).toMap
    assert(again === lpa, "LPA labels are not deterministic across runs")
  }
}
