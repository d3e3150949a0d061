package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** `events_regression` fits per-series OLS from exact decimal moment
  * sums and rounds slope/intercept/R² once at 6 dp. The hash check
  * against DuckDB is only sound while no unrounded output sits on a
  * 6-dp rounding boundary (both engines derive the same doubles from
  * the same exact sums in the same arithmetic order, so divergence is
  * 0 by construction — but a fixture landing a value at exactly
  * x.xxxxxx5 would turn any future 1-ulp drift into oracle flake).
  * This pins the boundary margin and the fit's statistical sanity.
  */
class RegressionSpec extends SparkSpec {

  test("per-series OLS outputs sit clear of their 6-dp rounding boundary") {
    val sums = EventQueries.regressionSums(spark, sf).collect()
    assert(sums.length >= 3, s"expected >=3 series, got ${sums.length}")

    val boundaryMargins = sums.flatMap { r =>
      val n = r.getAs[Long]("n").toDouble
      val sx = r.getAs[Double]("sx"); val sy = r.getAs[Double]("sy")
      val sxy = r.getAs[Double]("sxy"); val sxx = r.getAs[Double]("sxx")
      val syy = r.getAs[Double]("syy")
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slopeMs = num / den
      Seq(
        slopeMs * 3600000.0,
        sy / n - slopeMs * (sx / n),
        (num * num) / (den * (n * syy - sy * sy)))
        .map { v =>
          // distance of v·1e6's fractional part from the .5 boundary
          val frac = {
            val f = (v * 1e6) - math.floor(v * 1e6)
            f
          }
          math.abs(frac - 0.5)
        }
    }
    val minMargin = boundaryMargins.min
    info(f"min |frac − 0.5| boundary margin = $minMargin%.3e (1e-6 units) over ${boundaryMargins.length} outputs")
    assert(minMargin > 1e-6,
      f"an OLS output sits $minMargin%.3e from its 6-dp rounding " +
        "boundary — the oracle hash check is unsound on this fixture")
  }

  test("fit is sane: intercept tracks the series mean, R² near zero") {
    val rows = EventQueries.queries("events_regression")(spark, sf).collect()
    val means = graft.tables.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("mean")).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val icpt = r.getAs[Double]("intercept")
      val r2 = r.getAs[Double]("r2")
      // intercept = fitted value at T0 (series start); with the
      // fixture's near-zero slope it must sit near the series mean.
      assert(math.abs(icpt - means(t)) < 0.5 * means(t) + 1.0,
        s"$t: intercept $icpt far from mean ${means(t)}")
      assert(r2 >= 0.0 && r2 < 0.2, s"$t: R²=$r2 out of [0, 0.2)")
    }
  }
}
