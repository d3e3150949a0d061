package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join via bin quantization — the scale topology
  * for `fact.value BETWEEN dim.lo AND dim.hi` predicates.
  *
  * A naive range join has no equi-key, so Spark plans a
  * BroadcastNestedLoopJoin: every fact row tests every interval —
  * fine for a handful of intervals, O(|fact|·|dim|) at scale. The
  * binned rewrite quantizes the range key into fixed-width bins:
  * each fact row lands in exactly one bin, each interval is exploded
  * to the bins it covers, and the join becomes a plain hash equi-join
  * on the bin id plus a residual `lo <= v < hi` filter. Cost is
  * O(|fact| + |dim|·bins-per-interval) with full shuffle/broadcast
  * planner freedom on the equi-key — the same quantize-to-equi-join
  * trick as as-of joins (AsOfJoin) and time windows.
  *
  * Semantics: half-open intervals [lo, hi) — a row on a shared
  * boundary joins only the upper band, so non-overlapping bands stay
  * non-overlapping in the output.
  */
object RangeJoin {

  /** Inner join of `fact` to interval table `dim` on
    * `lo <= value < hi`, executed as a binned equi-join.
    *
    * `binWidth` trades dim replication (intervals spanning many bins)
    * against bin selectivity (many intervals sharing a bin); pick it
    * near the typical interval width. Result equals the naive range
    * join row-for-row, independent of binWidth.
    */
  def binned(fact: DataFrame, dim: DataFrame, value: Column,
             lo: Column, hi: Column, binWidth: Double): DataFrame = {
    val factB = fact.withColumn("__bin", floor(value / binWidth))
    // an interval [lo, hi) covers bins floor(lo/w) .. floor(hi/w)
    // minus the empty upper sliver when hi is exactly on a boundary
    val dimB = dim.withColumn("__bin",
      explode(sequence(
        floor(lo / binWidth).cast("long"),
        greatest(
          when(hi % binWidth === 0.0, floor(hi / binWidth) - 1)
            .otherwise(floor(hi / binWidth)).cast("long"),
          floor(lo / binWidth).cast("long")))))
    factB.join(dimB, Seq("__bin"))
      .filter(lo <= value && value < hi)
      .drop("__bin")
  }
}
