package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Theil-Sen robust slope: from-scratch scalar recomputation of the
  * hourly series → pairwise slopes → rank-median chain, plus the
  * robustness property that motivates the operator (an injected
  * outlier hour drags OLS far more than the pairwise median). The
  * unbounded all-pairs formulation RETIRED from the query surface in
  * r13 (`theilsenOver` with no bound) is exercised directly here —
  * this spec plus Round13OpsSpec's span-covering-bound identity keep
  * the exact formula tree verified while `events_theilsen_win`
  * carries the bench/scale row.
  */
class TheilSenSpec extends SparkSpec {

  /** Scalar hourly mean series per type, the query's 9-dp convention. */
  private lazy val hourly: Map[String, Seq[(Long, BigDecimal)]] = {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("ts_ms"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1) - r.getLong(1) % 3600000L,
                 BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((t, h), vs) =>
        (t, h, BigDecimal(vs.map(_._3).sum.toDouble / vs.size)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP))
      }
      .groupBy(_._1).view.mapValues(_.map(v => (v._2, v._3)).sortBy(_._1)).toMap
  }

  private def pairSlopes(series: Seq[(Long, Double)]): Seq[Double] =
    (for {
      i <- series.indices; j <- (i + 1) until series.size
    } yield (series(j)._2 - series(i)._2) /
            ((series(j)._1 - series(i)._1) / 3600000.0)).toSeq

  private def rankMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    (s((n + 1) / 2 - 1) + s(n / 2)) / 2.0
  }

  test("per-type slope equals a from-scratch scalar recomputation") {
    val got = EventQueries.theilsenOver(EventQueries.hourlySeries(spark, sf))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope_per_hour_r"))).toMap
    assert(got.keySet === hourly.keySet)
    hourly.foreach { case (t, series) =>
      val slopes = pairSlopes(series.map { case (h, y) => (h, y.toDouble) })
      val expected = BigDecimal(rankMedian(slopes))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(t)._1 === slopes.size.toLong, s"type $t n_pairs")
      assert(got(t)._2 === expected, s"type $t slope")
    }
  }

  test("windowed variant equals the scalar bounded-pair recomputation") {
    // fixture span is ~720 h > 168 h, so the bound genuinely prunes
    val got = EventQueries.queries("events_theilsen_win")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope_per_hour_r"))).toMap
    hourly.foreach { case (t, series0) =>
      val series = series0.map { case (h, y) => (h, y.toDouble) }
      val slopes = (for {
        i <- series.indices; j <- (i + 1) until series.size
        dh = (series(j)._1 - series(i)._1) / 3600000L
        if dh <= 168L
      } yield (series(j)._2 - series(i)._2) / dh.toDouble).toSeq
      val expected = BigDecimal(rankMedian(slopes))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(t)._1 === slopes.size.toLong, s"type $t n_pairs")
      assert(got(t)._1 < pairSlopes(series).size, s"type $t bound must prune")
      assert(got(t)._2 === expected, s"type $t slope")
    }
  }

  test("breakdown property: an outlier hour moves OLS far more than Theil-Sen") {
    val (t, series0) = hourly.head
    val series = series0.map { case (h, y) => (h, y.toDouble) }
    def ols(s: Seq[(Long, Double)]): Double = {
      val xs = s.map(_._1.toDouble / 3600000.0)
      val ys = s.map(_._2)
      val n = s.size
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(x => x * x).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val corrupted = series.updated(series.size - 1,
      (series.last._1, series.last._2 + 1000.0))
    val dOls = math.abs(ols(corrupted) - ols(series))
    val dTs = math.abs(rankMedian(pairSlopes(corrupted)) -
                       rankMedian(pairSlopes(series)))
    assert(dTs < dOls / 10.0,
      s"Theil-Sen shift $dTs should be <10% of OLS shift $dOls for one outlier")
  }
}
