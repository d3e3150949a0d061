package graft.queries

import graft.SparkSpec

/** Pins the mechanism the shared-artifact posture rests on: a
  * memoized frame must (a) build exactly once per (session, dir, key),
  * (b) stay READABLE after `spark.catalog.clearCache()` — the harness
  * calls that between every query, and localCheckpoint blocks live
  * outside the catalog cache — and (c) rebuild after an explicit
  * `Artifacts.clear()` (ScaleBench's full-cost mode).
  */
class ArtifactsSpec extends SparkSpec {

  test("build-once, clearCache-survival, rebuild-after-clear") {
    var builds = 0
    def build = { builds += 1; spark.range(5).toDF("v") }

    Artifacts.materialized(spark, "/artifacts-spec", "t") { build }
    assert(builds === 1)

    spark.catalog.clearCache()
    val again = Artifacts.materialized(spark, "/artifacts-spec", "t") { build }
    assert(builds === 1, "memo missed — artifact rebuilt after clearCache")
    // the data itself must still be servable post-clearCache
    assert(again.collect().map(_.getLong(0)).sorted.toSeq === (0L until 5L))

    Artifacts.clear()
    Artifacts.materialized(spark, "/artifacts-spec", "t") { build }
    assert(builds === 2, "clear() did not force a rebuild")
  }

  test("artifacts are keyed per dir and per name") {
    var builds = 0
    def build = { builds += 1; spark.range(3).toDF("v") }
    Artifacts.clear()
    Artifacts.materialized(spark, "/dir-a", "k") { build }
    Artifacts.materialized(spark, "/dir-b", "k") { build }
    Artifacts.materialized(spark, "/dir-a", "k2") { build }
    Artifacts.materialized(spark, "/dir-a", "k") { build } // hit
    assert(builds === 3)
    Artifacts.clear()
  }

  test("clearDir evicts one dir's artifacts, leaving other dirs memoized") {
    var builds = 0
    def build = { builds += 1; spark.range(2).toDF("v") }
    Artifacts.clear()
    Artifacts.materialized(spark, "/dir-a", "k") { build }
    Artifacts.materialized(spark, "/dir-b", "k") { build }
    Artifacts.clearDir(spark, "/dir-a")
    Artifacts.materialized(spark, "/dir-b", "k") { build } // still a hit
    Artifacts.materialized(spark, "/dir-a", "k") { build } // rebuilt
    assert(builds === 3)
    Artifacts.clear()
  }

  test("passthrough returns the raw un-checkpointed build and skips the memo") {
    var builds = 0
    def build = { builds += 1; spark.range(4).toDF("v") }
    Artifacts.clear()
    Artifacts.passthrough = true
    try {
      val df = Artifacts.materialized(spark, "/dir-pt", "k") { build }
      Artifacts.materialized(spark, "/dir-pt", "k") { build }
      assert(builds === 2, "passthrough must not memoize")
      // the plan must carry the full build, not a checkpoint scan
      assert(!df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    } finally Artifacts.passthrough = false
    Artifacts.materialized(spark, "/dir-pt", "k") { build }
    Artifacts.materialized(spark, "/dir-pt", "k") { build } // memo hit again
    assert(builds === 3)
    Artifacts.clear()
  }
}
