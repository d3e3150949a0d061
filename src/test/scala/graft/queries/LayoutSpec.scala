package graft.queries

import graft.SparkSpec

/** Pins the mixed-workload law the z-order layout exists for: a
  * single-dimension sort is near-optimal on its own dimension and
  * scans EVERYTHING on the other, while the Morton curve bounds both
  * dimensions per file, so its worst predicate still skips.
  *
  * Runs on sf0.01: the sf0.001 events fixture has only ~30 distinct
  * users, which makes each user's row-run span few days — a
  * user-sorted layout is then accidentally day-clustered too and the
  * contrast degenerates (measured, not hypothesized).
  */
class LayoutSpec extends SparkSpec {

  private lazy val table = EventQueries
    .queries("layout_zorder")(spark, "/root/testdata/sf0.01")
    .collect()
    .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def worst(layout: String): Long =
    table.collect { case ((l, _), n) if l == layout => n }.max

  test("z-order's worst predicate beats each single-dim layout's worst") {
    assert(worst("zorder") < worst("by_user"),
      s"zorder ${worst("zorder")} !< by_user ${worst("by_user")}")
    assert(worst("zorder") < worst("by_time"),
      s"zorder ${worst("zorder")} !< by_time ${worst("by_time")}")
  }

  test("each single-dim layout fails its off-dimension completely") {
    // the off-dimension predicate prunes nothing: that is the gap
    // z-order closes
    assert(table(("by_user", "p_day")) === EventQueries.ZFiles.toLong)
    assert(table(("by_time", "p_user")) === EventQueries.ZFiles.toLong)
    // while z-order skips on every predicate
    Seq("p_user", "p_day", "p_both").foreach { p =>
      assert(table(("zorder", p)) < EventQueries.ZFiles.toLong, p)
    }
  }

  test("the 2-D predicate is where the curve wins outright") {
    assert(table(("zorder", "p_both")) <= table(("by_user", "p_both")))
    assert(table(("zorder", "p_both")) <= table(("by_time", "p_both")))
  }
}
