package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** `events_stl`'s decomposition identity and centering, and
  * `events_ab_cuped`'s A/A-test sanity + the CUPED adjustment
  * identity, proven engine-side on the fixture.
  */
class StlCupedSpec extends SparkSpec {

  test("STL: y = trend + seasonal + residual; seasonal centered; edges NULL") {
    val rows = EventQueries.queries("events_stl")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("hour_ms"))
      // first/last 12 hours cannot have a full ±12 window
      sorted.take(12).foreach(r => assert(r.isNullAt(r.fieldIndex("trend_r")),
        s"$t: leading edge should have NULL trend"))
      sorted.takeRight(12).foreach(r => assert(r.isNullAt(r.fieldIndex("trend_r")),
        s"$t: trailing edge should have NULL trend"))
      // decomposition identity on interior rows (6-dp outputs → 2e-6 slack)
      sorted.filterNot(_.isNullAt(sorted.head.fieldIndex("trend_r"))).foreach { r =>
        val y = r.getAs[Double]("y_r")
        val sum = r.getAs[Double]("trend_r") + r.getAs[Double]("seasonal_r") +
          r.getAs[Double]("resid_r")
        assert(math.abs(y - sum) < 2e-6, s"$t@${r.getAs[Long]("hour_ms")}: " +
          s"y=$y != trend+seasonal+resid=$sum")
      }
      // seasonal profile sums to ~0 (24 9-dp values re-centered)
      val seasonal = sorted.map(r =>
        (r.getAs[Long]("hour_ms") % 86400000L / 3600000L,
         r.getAs[Double]("seasonal_r"))).distinct
      assert(seasonal.length == 24, s"$t: expected 24 hod seasonal values")
      val s = seasonal.map(_._2).sum
      // 24 seasonal values each independently 6-dp rounded → up to
      // 24·0.5e-6 of accumulated rounding around the exact-0 center
      assert(math.abs(s) < 1.5e-5, s"$t: seasonal profile sums to $s, not 0")
    }
  }

  test("CUPED: A/A no-effect, nonnegative variance reduction, adjustment identity") {
    val r = EventQueries.queries("events_ab_cuped")(spark, sf).collect().head
    val z = r.getAs[Double]("z_r")
    assert(math.abs(z) < 4.0,
      s"deterministic-hash A/A split must not show a large effect, z=$z")
    val vr = r.getAs[Double]("var_reduction_r")
    assert(vr >= 0.0 && vr < 1.0,
      s"pooled-θ variance reduction must be in [0,1): $vr")
    assert(r.getAs[Long]("n0") > 3 && r.getAs[Long]("n1") > 3,
      "both variants must be populated")
    // diff_cuped = diff − θ·(mx1 − mx0): recompute mx per variant
    val e = graft.tables.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts_ms"), col("value"))
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getDouble(2)))
    val split = 1704067200000L + 15L * 86400000L
    val perUser = e.groupBy(_._1).flatMap { case (u, evs) =>
      val pre = evs.filter(_._2 < split).map(_._3)
      val post = evs.filter(_._2 >= split).map(_._3)
      if (pre.nonEmpty && post.nonEmpty) {
        def m9(xs: Seq[Double]) = BigDecimal(
          xs.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.size)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((u, m9(pre.toSeq), m9(post.toSeq)))
      } else None
    }.toSeq
    def variantOf(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${u}#ab".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(14)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val mx = perUser.groupBy(p => variantOf(p._1))
      .map { case (v, ps) => v -> ps.map(_._2).sum / ps.size }
    val theta = r.getAs[Double]("theta_r")
    val expected = r.getAs[Double]("diff_r") - theta * (mx(1L) - mx(0L))
    val got = r.getAs[Double]("diff_cuped_r")
    assert(math.abs(got - expected) < 1e-3,
      s"CUPED identity: diff_cuped $got != diff − θ·Δmx $expected")
  }
}
