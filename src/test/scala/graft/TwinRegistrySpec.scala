package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TwinRegistry

/** Enforces [[TwinRegistry]]'s three-way partition over the live
  * query surface (no SparkSession needed — pure map arithmetic over
  * `SparkEntry.queries`/`oracleSql`):
  *
  *   batch = oracle-twinned ⊎ differentSemantics ⊎ cantTwin
  *
  * so twin gaps stay DECLARED design: a new batch query without a
  * twin fails until registered, and a registered query that gains a
  * twin fails until its entry is removed.
  */
class TwinRegistrySpec extends AnyFunSuite {

  private val all = SparkEntry.queries.keySet
  private val oracle = SparkEntry.oracleSql
  private val stream = all.filter(_.startsWith("stream_"))
  private val batch = all -- stream
  private val streamSql = stream.map(oracle)
  private val twinned = batch.filter(b => streamSql.contains(oracle(b)))
  private val registered = TwinRegistry.cantTwin.values.flatten.toSet
  private val diffSem = TwinRegistry.differentSemantics.keySet

  test("every query has an oracle (the partition's precondition)") {
    assert((all -- oracle.keySet).isEmpty,
      s"queries without oracles: ${(all -- oracle.keySet).toSeq.sorted}")
  }

  test("every batch query is twinned or declared") {
    val unaccounted = batch -- twinned -- registered -- diffSem
    assert(unaccounted.isEmpty,
      "batch queries neither oracle-twinned nor registered: " +
        s"${unaccounted.toSeq.sorted} — add a streaming twin or a " +
        "TwinRegistry entry with a reason")
  }

  test("no registry entry is stale") {
    // an entry that became oracle-twinned must be deleted
    assert(((registered ++ diffSem) & twinned).isEmpty,
      "registered but actually twinned (delete the entry): " +
        s"${((registered ++ diffSem) & twinned).toSeq.sorted}")
    // an entry must name a live batch query
    assert(((registered ++ diffSem) -- batch).isEmpty,
      "registered but not a live batch query: " +
        s"${((registered ++ diffSem) -- batch).toSeq.sorted}")
    // one reason per query
    val counted = TwinRegistry.cantTwin.values.flatten.toSeq
    assert(counted.size == counted.distinct.size,
      s"duplicated across reasons: ${counted.diff(counted.distinct)}")
    assert((registered & diffSem).isEmpty)
  }

  test("differentSemantics targets are live streaming queries") {
    val targets = TwinRegistry.differentSemantics.values.toSet
    assert((targets -- stream).isEmpty,
      s"targets not live stream queries: ${(targets -- stream).toSeq.sorted}")
  }
}
