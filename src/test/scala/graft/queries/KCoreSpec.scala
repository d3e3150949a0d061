package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proves the bounded peel budget is an engineering cap, not an
  * approximation: KcRounds and KcRounds + 1 must give identical
  * coreness (the fixture reached its fixpoint), and the core
  * hierarchy must nest.
  */
class KCoreSpec extends SparkSpec {

  test("peel reaches its fixpoint within the round budget") {
    val at = DedupQueries.kcoreness(spark, sf, DedupQueries.KcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val more = DedupQueries.kcoreness(spark, sf, DedupQueries.KcRounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at === more, "one extra peel round changed coreness — budget too small")
  }

  test("core hierarchy nests and the graph has depth") {
    val by = DedupQueries.queries("graph_kcore")(spark, sf)
      .groupBy(col("coreness")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vertex classified, all levels within the cap
    assert(by.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // the dedup graph is near-dup-dense: a 2-core must exist
    assert(by.filter(_._1 >= 2L).values.sum > 0,
      s"no vertex survived the 2-core peel: $by")
  }
}
