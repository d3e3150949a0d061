package graft

import graft.queries.Artifacts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** THE serving-plan scale gate (VERDICT r10 item 1, made a red test):
  * no query may funnel a DATA-SIZED frame through a single-partition
  * shuffle — the plan shape behind every global `Window.orderBy`,
  * and the one shape that cannot survive a 100× scale-up.
  *
  * "Data-sized" is decided empirically, not structurally: every batch
  * query executes at sf0.001 and the row count entering each
  * SinglePartition exchange is read from the executed plan's shuffle
  * metrics; queries whose largest single-partition shuffle exceeds a
  * floor re-run at sf0.01 (10× the rows), and FAIL if that count
  * grew with the data. Constant-size frames (slice offsets, boundary
  * arrays, replicate grids, sketch registers) pass at any sf; an
  * unpartitioned window/sort over rows that track the corpus cannot.
  *
  * Streaming twins are excluded (their serving-time finishes share
  * these same batch code paths; executing 40 bounded replays here
  * would triple the suite's wall clock for no added plan coverage).
  */
class SinglePartitionSweepSpec extends SparkSpec {

  /** Row floor below which a single-partition shuffle is scale-free
    * noise at sf0.001 (offsets frames, stat rows, codebooks).
    */
  private val Floor = 8L

  /** Growth bound: a suspect fails if its single-partition rows at
    * sf0.01 exceed this multiple of its sf0.001 rows (the fixtures
    * are 10× apart; grid-shaped frames grow ≤ ~2× via longer spans).
    */
  private val MaxGrowth = 4.0

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case i: InMemoryTableScanExec => p +: allNodes(i.relation.cachedPlan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    self ++ p.subqueries.flatMap(allNodes)
  }

  /** Max rows written into any SinglePartition shuffle of the final
    * executed plan of `df`'s materialization (0 when there are none).
    */
  private def maxSinglePartitionRows(df: DataFrame): Long = {
    val qe = df.queryExecution
    // materialize THIS QueryExecution (not a fresh one from a write),
    // so the shuffle metrics live on the plan instance we inspect
    qe.toRdd.count()
    allNodes(qe.executedPlan).collect {
      case se: ShuffleExchangeExec if se.outputPartitioning == SinglePartition =>
        se.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.foldLeft(0L)(math.max)
  }

  private def run(name: String, dir: String): Long = {
    Artifacts.clear()
    spark.catalog.clearCache()
    Artifacts.passthrough = true
    try maxSinglePartitionRows(SparkEntry.queries(name)(spark, dir))
    finally {
      Artifacts.passthrough = false
      spark.catalog.clearCache()
    }
  }

  test("no single-partition shuffle grows with the data, across every batch query") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    val at1 = names.map(n => n -> run(n, "/root/testdata/sf0.001")).toMap
    val suspects = at1.filter(_._2 > Floor).keys.toSeq.sorted
    info(s"suspects re-run at sf0.01: ${suspects.mkString(", ")}")
    val failures = suspects.flatMap { n =>
      val r1 = at1(n)
      val r10 = run(n, "/root/testdata/sf0.01")
      info(f"$n: $r1%d -> $r10%d (${r10.toDouble / r1}%.2f x)")
      if (r10 > r1 * MaxGrowth)
        Some(f"$n: single-partition rows $r1%d → $r10%d (${r10.toDouble / r1}%.1f×)")
      else None
    }
    assert(failures.isEmpty,
      "data-sized single-partition shuffles (the ntile/global-window " +
        s"shape that dies at 100×):\n${failures.mkString("\n")}")
  }
}
