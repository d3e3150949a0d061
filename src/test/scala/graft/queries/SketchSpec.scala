package graft.queries

import graft.SparkSpec

/** Semantic guarantees of the deterministic sketches that the oracle
  * hash-compare can't express: count-min never under-counts (the
  * one-sided error bound is the sketch's defining property), and the
  * HLL estimate lands within a generous multiple of its theoretical
  * standard error (1.04/√m ≈ 6.5% at m=256).
  */
class SketchSpec extends SparkSpec {

  test("count-min estimates are one-sided: cnt_cms >= cnt_true on every heavy hitter") {
    val rows = TextQueries.queries("sketch_cms_tokens")(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: cms ${r.getLong(2)} < true ${r.getLong(1)}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
  }

  test("HLL estimate is within 5 standard errors of the truth") {
    val r = EventQueries.queries("sketch_hll_users")(spark, sf).collect().head
    val (est, truth) = (r.getDouble(4), r.getLong(5))
    val se = 1.04 / math.sqrt(256.0)
    assert(truth > 0)
    assert(math.abs(est - truth) / truth <= 5 * se,
      s"estimate $est vs true $truth exceeds 5 standard errors")
  }
}
