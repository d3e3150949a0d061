package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `pipeline_dp_release` rounds (n + Laplace noise) to an integer
  * while the noise carries a transcendental (ln of the md5-uniform):
  * the two engines' ln can differ by 1 ulp, so the hash check is
  * sound only while every noisy value sits clear of its .5 rounding
  * boundary by more than that divergence. Re-derive every draw and
  * pin the margin, plus the mechanism's statistical sanity.
  */
class DpReleaseSpec extends SparkSpec {

  private def rows = EventQueries.queries("pipeline_dp_release")(spark, sf)
    .collect()
    .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_ms"),
      r.getAs[Long]("n"), r.getAs[Long]("n_noisy")))

  test("noisy counts sit clear of their integer rounding boundary") {
    val margins = rows.map { case (t, d, n, _) =>
      val key = s"$t#$d#dp"
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md5.take(13), 16)
      val u = (h.toDouble + 0.5) / 4503599627370496.0
      val v = u - 0.5
      val noise = -math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
      val x = n + noise
      math.abs((x - math.floor(x)) - 0.5)
    }
    val minMargin = margins.min
    info(f"min |frac − 0.5| margin = $minMargin%.3e over ${margins.length} draws")
    assert(minMargin > 1e-9,
      "a noisy count sits on its rounding boundary — 1-ulp ln divergence could flip it")
  }

  test("the release is non-negative and noise is Laplace(1)-sized") {
    val rs = rows
    assert(rs.nonEmpty)
    rs.foreach { case (_, _, _, noisy) => assert(noisy >= 0) }
    // mean |noisy − n| ≈ E|Laplace(1)| = 1 (integer rounding shifts it
    // slightly; a generous band still catches a broken seed or scale)
    val mad = rs.map { case (_, _, n, noisy) => math.abs(noisy - n).toDouble }
      .sum / rs.length
    info(f"mean |noise| after rounding = $mad%.3f (E = 1.0)")
    assert(mad > 0.3 && mad < 3.0, s"mean absolute noise $mad is not Laplace(1)-sized")
    // determinism: same seed, same release
    assert(rows.toSeq == rs.toSeq)
  }
}
