package graft

import org.apache.spark.sql.functions._
import graft.queries.{dec, DedupQueries, EventQueries}

/** Boundary-margin + semantic sanity for the round-9 pair
  * `events_acf` and `graph_adamic_adar`.
  *
  * Both queries hash-match a DuckDB oracle while mixing libm/JDK
  * transcendentals into quantized decimal sums, so each gets the
  * EntropySpec treatment: re-derive every quantized term and pin its
  * distance from the rounding boundary, then assert the statistics
  * behave like the statistics they claim to be.
  */
class AcfAdamicSpec extends SparkSpec {

  test("ACF lag rows are bounded, lag-complete, and pair counts shrink with lag") {
    val rows = EventQueries.queries("events_acf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      // |ACF| can exceed 1 slightly only through estimator noise on
      // short series; the fixture's series are hundreds of hours long
      assert(math.abs(acf) <= 1.0 + 1e-6,
        s"${r.getAs[String]("event_type")} lag ${r.getAs[Long]("lag_hours")}: acf=$acf")
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("lag_hours")).toSet == Set(1L, 2L, 3L, 24L),
        s"$t missing a lag row")
      // a longer lag can never have MORE aligned pairs than a shorter
      // one on the same hour grid
      val pairsByLag = rs.map(r =>
        r.getAs[Long]("lag_hours") -> r.getAs[Long]("n_pairs")).toMap
      assert(pairsByLag(24L) <= pairsByLag(1L), s"$t pair counts inverted")
    }
  }

  test("ACF matches an independent exact-decimal reimplementation") {
    // the query's exactness claim: every aggregate is an exact decimal
    // sum of exact 9-dp products, centering is scalar double math.
    // Recompute all of it independently (Scala BigDecimal sums, same
    // finish order) and demand equality at the full 6-dp output.
    val hourly = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
              (col("ts_ms") - col("ts_ms") % 3600000L).as("hour_ms"),
              col("value"))
      .groupBy(col("event_type"), col("hour_ms"))
      .agg(count(lit(1)).as("nh"), sum(dec(col("value"))).as("s_dec"))
      .select(col("event_type"), col("hour_ms"),
              round(col("s_dec").cast("double") / col("nh"), 9)
                .cast("decimal(18,9)").as("y"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_ms"),
        r.getAs[java.math.BigDecimal]("y")))
    val expected = hourly.groupBy(_._1).flatMap { case (t, rs) =>
      val n = rs.length.toLong
      val sy = rs.map(r => BigDecimal(r._3)).sum
      val s2 = rs.map(r => BigDecimal(r._3) * BigDecimal(r._3)).sum
      val ybar = sy.toDouble / n
      val den = s2.toDouble - 2.0 * ybar * sy.toDouble + n * ybar * ybar
      val byHour = rs.map(r => r._2 -> BigDecimal(r._3)).toMap
      Seq(1, 2, 3, 24).flatMap { k =>
        val pairs = rs.flatMap(r => byHour.get(r._2 + k * 3600000L)
          .map(yb => (BigDecimal(r._3), yb)))
        if (pairs.isEmpty) None else {
          val sab = pairs.map { case (a, b) => a * b }.sum
          val sa = pairs.map(_._1).sum
          val sb = pairs.map(_._2).sum
          val num = sab.toDouble - ybar * sa.toDouble - ybar * sb.toDouble +
            pairs.length * ybar * ybar
          val acf = BigDecimal(num / den)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((t, k.toLong) -> (pairs.length.toLong, acf))
        }
      }
    }
    val got = EventQueries.queries("events_acf")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag_hours")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (key, exp) =>
      assert(got(key) == exp, s"$key: got ${got(key)}, expected $exp")
    }
  }

  test("cross-correlation is lag-0 symmetric, bounded, and pair-complete") {
    val rows = EventQueries.queries("events_cross_corr")(spark, sf).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[Long]("lag_hours"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("ccf")))
    val types = rows.map(_._1).distinct.sorted
    // every ordered pair at every lag (full hour grid ⇒ no empty join)
    assert(rows.length == types.length * (types.length - 1) * 3)
    rows.foreach { case (a, b, k, n, ccf) =>
      assert(a != b)
      assert(n > 0)
      assert(math.abs(ccf) <= 1.0 + 1e-6, s"($a,$b,k=$k): ccf=$ccf")
    }
    // CCF(a,b,0) ≡ CCF(b,a,0): identical pair set, symmetric formula
    val lag0 = rows.filter(_._3 == 0L).map(r => (r._1, r._2) -> r._5).toMap
    lag0.foreach { case ((a, b), v) =>
      assert(lag0((b, a)) == v, s"lag-0 asymmetry: ($a,$b)=$v vs ${lag0((b, a))}")
    }
  }

  test("Adamic-Adar predicts only non-edges, with sane scores and margins") {
    val out = DedupQueries.queries("graph_adamic_adar")(spark, sf).collect()
    assert(out.nonEmpty, "fixture produced no predicted links")
    // existing (symmetrized) edge set for the non-edge check
    val edges = DedupQueries.lshEdges(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val degs = sym.toSeq.groupBy(_._1).map { case (v, es) => v -> es.size }
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val cn = r.getAs[Long]("common_neighbors")
      val score = r.getAs[Double]("aa_score")
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(!sym((a, b)), s"($a,$b) is an existing edge — not a prediction")
      assert(cn >= 1 && score > 0, s"($a,$b): cn=$cn score=$score")
      // score ≤ cn/ln(2): every middle vertex has degree ≥ 2
      assert(score <= cn / math.log(2.0) + 1e-9, s"($a,$b) score above bound")
    }
    // 1/ln(deg) quantization margins over the degrees that can appear
    val margins = degs.values.filter(d => d >= 2 && d <= 64).map { d =>
      val v = 1.0 / math.log(d.toDouble)
      val f = v * 1e12 - math.floor(v * 1e12)
      math.abs(f - 0.5)
    }
    val minMargin = margins.min
    info(f"min 1/ln(deg) margin = $minMargin%.3e over ${margins.size} degrees")
    assert(minMargin > 1e-6)
  }
}
