package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order statistics for frames PROVEN tiny (≲ 10⁴ rows: top-k results
  * after a distributed `orderBy().limit(k)`, per-slice offset tables,
  * per-stratum count frames, contingency cells) — computed as a
  * triangular SELF-JOIN instead of an unpartitioned window.
  *
  * Why not `Window.orderBy(...)`: an empty partition spec funnels the
  * frame through one task AND logs a per-execution WindowExec warning
  * that drowns the signal the warning exists to give (a data-sized
  * frame accidentally hitting a global window). A constant partition
  * key does not help — the optimizer strips foldable keys and the
  * exec sees an empty spec again. For a frame of n rows the
  * triangular join is n² pairs — at the documented sizes that is at
  * most ~10⁸ comparisons spread across the cluster, no
  * single-partition sort, no warning, and every plan stays
  * whole-stage-codegen joins + hash aggregates.
  *
  * Requirements: `sortCols` must form a TOTAL order (include a unique
  * tiebreak) with non-null keys, every column ascending — express
  * descending order as `negate(col)`, the [[GlobalOrder]] convention.
  * Data-sized frames must use [[GlobalOrder]] instead.
  */
object TinyOrder {

  /** Keys must be NON-NULL (ADVICE r12, the [[GlobalOrder.normKey]]
    * convention): a NULL key silently falls out of the `<` comparison
    * and the struct-equality join — the row would get rank 1 / prefix
    * 0 instead of an error — so each key raises loudly instead.
    */
  private def key(sortCols: Seq[Column]): Column =
    struct(sortCols.zipWithIndex.map { case (c, i) =>
      when(c.isNull, raise_error(lit(
        s"TinyOrder sort key c$i is NULL — keys must form a " +
          "non-null total order; coalesce NULLs to a sentinel that " +
          "encodes the intended NULL placement"))).otherwise(c).as(s"c$i")
    }: _*)

  /** df + 1-based rank `out` under the total order `sortCols`:
    * rank(r) = 1 + |{r′ : key(r′) < key(r)}|.
    */
  def rank(df: DataFrame, out: String, sortCols: Seq[Column]): DataFrame =
    prefixAgg(df, lit(1L), out, sortCols, "sum", lit(0L),
      post = _ + lit(1L))

  /** df + the EXCLUSIVE running sum of `value` under `sortCols`
    * (0 for the first row) — the tiny-frame
    * `sum(value).over(orderBy(...).rowsBetween(unboundedPreceding, -1))`.
    */
  def exclusivePrefixSum(df: DataFrame, value: Column, out: String,
                         sortCols: Seq[Column]): DataFrame =
    prefixAgg(df, value, out, sortCols, "sum", lit(0L))

  /** df + the EXCLUSIVE running max of `value` under `sortCols`
    * (NULL for the first row) — the tiny-frame
    * `max(value).over(orderBy(...).rowsBetween(unboundedPreceding, -1))`.
    */
  def exclusivePrefixMax(df: DataFrame, value: Column, out: String,
                         sortCols: Seq[Column]): DataFrame =
    prefixAgg(df, value, out, sortCols, "max",
      lit(null).cast("double"))

  private def prefixAgg(df: DataFrame, value: Column, out: String,
                        sortCols: Seq[Column], agg: String, zero: Column,
                        post: Column => Column = identity): DataFrame = {
    // The triangular join references the frame three times (left side,
    // value side, distinct-key side). The frame is tiny by contract,
    // but the CHAIN THAT PRODUCES IT usually is not (a full-corpus
    // aggregate), and the three plan subtrees differ by projection so
    // ReuseExchange cannot deduplicate them — without materialization
    // the upstream pass runs three times (measured: the r12 rank/search
    // bench regressions). persist() computes it once; the eager
    // localCheckpoint below then lets us unpersist BEFORE returning
    // (ADVICE r13: the old persist leaked one cached frame per call for
    // callers outside the clearCache()-between-queries harnesses).
    val mat = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = key(sortCols)
    val left = mat.withColumn("__to_k", k)
    val right = mat.select(k.as("__to_kb"), value.as("__to_v"))
    // broadcast the value side: the frame is tiny by contract, and the
    // non-equi join must plan as BroadcastNestedLoopJoin, never a
    // CartesianProduct
    val offs = left.select(col("__to_k")).distinct()
      .join(broadcast(right), col("__to_kb") < col("__to_k"))
      .groupBy(col("__to_k"))
      .agg(call_function(agg, col("__to_v")).as("__to_agg"))
    val joined = left.join(broadcast(offs), Seq("__to_k"), "left")
      .withColumn(out, post(coalesce(col("__to_agg"), zero)))
      .drop("__to_k", "__to_agg")
    // Eagerly materialize the (tiny) result so the upstream chain runs
    // exactly once, then release the cache — no leak across composed
    // calls. Lineage truncation is safe at this size: losing a tiny
    // localCheckpoint block fails the job rather than recomputing a
    // data-sized chain, the right trade for a ≲10⁴-row frame.
    val result = joined.localCheckpoint()
    mat.unpersist()
    result
  }
}
