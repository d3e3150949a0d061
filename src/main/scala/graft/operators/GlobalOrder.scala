package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global order statistics — row numbers and prefix sums
  * over a TOTAL order — without the single-partition `Window.orderBy`
  * that funnels the whole frame through one task.
  *
  * Shape (the classic two-phase parallel prefix):
  *   1. DETERMINISTIC range slicing: a hash-gated sample of the sort
  *      key (a per-row predicate — no RNG) is sorted once
  *      (sample-sized, 1/`sampleMod` of the data) and `numParts − 1`
  *      boundary keys are picked at its quantile positions; every row
  *      computes its slice id by comparing its key against the
  *      broadcast boundaries. This replaces `repartitionByRange`,
  *      whose boundary sampling is seeded by the physical RDD id —
  *      two plan branches over the same frame would slice it
  *      DIFFERENTLY (observed: inconsistent rank offsets), while the
  *      hash-gated boundaries are pure functions of the data.
  *   2. rank/cumsum WITHIN each slice (a window partitioned by the
  *      slice id — max task = largest slice, never the whole frame);
  *   3. per-slice totals (≤ numParts rows) → exclusive running
  *      offsets (a window over the numParts-row frame — partition-
  *      COUNT-sized, a constant, not data-sized) → broadcast join;
  *   4. global statistic = slice offset + local statistic.
  *
  * Requirements: the sort key must be a TOTAL order (include a unique
  * tiebreak column) with non-null keys, every sort column ASCENDING —
  * callers express descending order by negating a numeric column, so
  * boundary comparison, `array_sort` and the slice window all share
  * one ascending struct order.
  *
  * Scale knobs: `numParts` ≈ the cluster's reduce parallelism;
  * `sampleMod` scales with expected row count so the boundary sort
  * stays sample-sized (n/1024 at fixture scale; a 100 TB deployment
  * raises it so the sample stays ~1e6 keys). Slice balance is the
  * same sampling guarantee Spark's own RangePartitioner gives.
  *
  * This is the serving-time shape for the quintile scoring
  * (`events_rfm`), the layout file assignment (`layout_zorder` /
  * `layout_hilbert`), the PPS sampler's token cumsum
  * (`pipeline_sample_weighted`) and the quantile-sketch audit's
  * order statistics (`sketch_quantiles`) — each previously a global
  * `ntile`/`row_number`/`sum over ORDER BY` window (VERDICT r10).
  */
object GlobalOrder {

  /** Default slice count — bounds every in-slice sort at |data|/32 at
    * fixture scale; a cluster deployment raises it to O(cores).
    */
  val DefaultParts = 32

  /** Default hash-sample gate: ~n/1024 keys reach the boundary sort. */
  val DefaultSampleMod = 1024

  /** The sort key as ONE ascending struct — plain struct comparison
    * (and `array_sort`) then realizes the order. Descending columns
    * must arrive pre-normalized as `negate(c)` (numeric only): the
    * `ColumnNode` SortOrder wrapper behind `.desc` is `private[sql]`
    * in Spark 4 and cannot be evaluated inside a struct, so reject it
    * loudly instead of failing at codegen. Keys must be NON-NULL —
    * a NULL key makes every boundary comparison NULL (the row lands
    * in slice 0 silently) and breaks the total order, so each key is
    * wrapped in a per-row null check that raises instead (ADVICE r11;
    * a null-test branch per column is codegen'd and costs nothing
    * next to the slice shuffle the operator exists to run).
    */
  private def normKey(sortCols: Seq[Column]): Column =
    struct(sortCols.zipWithIndex.map { case (c, i) =>
      require(!c.node.getClass.getName.endsWith("SortOrder"),
        s"GlobalOrder sort columns must be plain expressions — " +
          s"express descending order as negate(col), got: $c")
      when(c.isNull, raise_error(lit(
        s"GlobalOrder sort key c$i is NULL — keys must form a " +
          "non-null total order; coalesce NULLs to a sentinel that " +
          "encodes the intended NULL placement"))).otherwise(c).as(s"c$i")
    }: _*)

  /** One-row frame holding the sorted boundary-key array (size ≤
    * numParts − 1, possibly smaller when the sample is tiny — empty
    * slices are harmless).
    *
    * Small-sample posture (ADVICE r11): when the hash-gated sample
    * yields FEWER than `numParts − 1` keys, quantile-picking would
    * repeat the same few keys (collapsing most slices empty), so the
    * fallback uses EVERY distinct sampled key as a boundary — the
    * frame still fans out over sample+1 slices instead of one. A
    * fully EMPTY sample (probability e^(−n/sampleMod)) degrades to a
    * single slice; that is only non-negligible when n ≲ 10·sampleMod
    * (≈10k rows at the default gate), where a one-task window is
    * performance-benign anyway. Callers ranking frames they KNOW are
    * mid-sized (10k–1M rows) should pass `sampleMod ≈ expectedRows /
    * 64` so the boundary sort sees ~64 keys while staying
    * sample-sized.
    */
  private def boundsFrame(keyed: DataFrame, numParts: Int, sampleMod: Int) =
    keyed
      .filter(pmod(xxhash64(col("__go_k")), lit(sampleMod.toLong)) === 0L)
      .agg(array_sort(collect_list(col("__go_k"))).as("__go_samp"))
      .select(
        when(size(col("__go_samp")) < lit(numParts - 1),
          array_distinct(col("__go_samp")))
        .otherwise(filter(
          transform(
            array((1 until numParts).map(i => lit(i)): _*),
            // 0-based, null-on-out-of-bounds `get` (never element_at:
            // an empty sample would THROW under ANSI mode, which is on
            // by default in Spark 4) — nulls are filtered to no-ops
            i => get(col("__go_samp"),
              greatest(lit(0),
                call_function("div",
                  i.cast("long") * size(col("__go_samp")).cast("long"),
                  lit(numParts.toLong)).cast("int") - lit(1)))),
          b => b.isNotNull)).as("__go_bounds"))

  /** keyed rows + `__go_pid` (contiguous slice id under the key
    * order) — deterministic, so every re-evaluation of any plan
    * branch slices identically.
    */
  private def sliced(df: DataFrame, sortCols: Seq[Column],
                     numParts: Int, sampleMod: Int): DataFrame = {
    val keyed = df.withColumn("__go_k", normKey(sortCols))
    // behavioral backstop to normKey's name-based SortOrder guard
    // (ADVICE r11): force analysis NOW, so a sort-direction wrapper
    // that slips past the guard (e.g. after a Spark-internal rename)
    // fails here with an actionable message instead of deep inside
    // codegen of a downstream stage.
    try keyed.schema catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          "GlobalOrder sort columns must be plain ascending " +
            "expressions (use negate(col) for descending): " +
            e.getMessage, e)
    }
    keyed.crossJoin(broadcast(boundsFrame(keyed, numParts, sampleMod)))
      .withColumn("__go_pid",
        size(filter(col("__go_bounds"), b => col("__go_k") > b)))
      .drop("__go_bounds")
  }

  /** Exclusive per-slice offsets from a per-slice total frame
    * (`__go_pid`, `__go_tot`): a cumsum over ≤ numParts rows — as a
    * [[TinyOrder]] triangular join (≤ numParts² pairs), so the
    * operator that exists to eliminate unpartitioned windows contains
    * none itself.
    */
  private def offsets(totals: DataFrame) =
    TinyOrder.exclusivePrefixSum(totals, col("__go_tot"), "__go_off",
        Seq(col("__go_pid")))
      .select(col("__go_pid"), col("__go_off"))

  /** df + a 1-based global row number `out` under the total order
    * `sortCols` — the distributed `row_number().over(orderBy(...))`.
    */
  def withRowNumber(df: DataFrame, out: String, sortCols: Seq[Column],
                    numParts: Int = DefaultParts,
                    sampleMod: Int = DefaultSampleMod): DataFrame = {
    val s = sliced(df, sortCols, numParts, sampleMod)
    val offs = offsets(
      s.groupBy(col("__go_pid")).agg(count(lit(1)).as("__go_tot")))
    s.withColumn("__go_lrn",
        row_number().over(
          Window.partitionBy(col("__go_pid")).orderBy(col("__go_k")))
          .cast("long"))
      .join(broadcast(offs), Seq("__go_pid"))
      .withColumn(out, col("__go_off") + col("__go_lrn"))
      .drop("__go_pid", "__go_k", "__go_lrn", "__go_off")
  }

  /** df + the running sum of `value` under the total order `sortCols`
    * — the distributed `sum(value).over(orderBy(...))`. `inclusive`
    * picks ROWS UNBOUNDED PRECEDING..CURRENT vs ..−1 (the exclusive
    * prefix, 0 for the first row).
    */
  def withPrefixSum(df: DataFrame, value: Column, out: String,
                    sortCols: Seq[Column], inclusive: Boolean = true,
                    numParts: Int = DefaultParts,
                    sampleMod: Int = DefaultSampleMod): DataFrame = {
    val s = sliced(df, sortCols, numParts, sampleMod)
      .withColumn("__go_v", value)
    val offs = offsets(
      s.groupBy(col("__go_pid")).agg(sum(col("__go_v")).as("__go_tot")))
    val upper = if (inclusive) 0L else -1L
    s.withColumn("__go_lcs",
        coalesce(
          sum(col("__go_v")).over(
            Window.partitionBy(col("__go_pid")).orderBy(col("__go_k"))
              .rowsBetween(Window.unboundedPreceding, upper)),
          lit(0L)))
      .join(broadcast(offs), Seq("__go_pid"))
      .withColumn(out, col("__go_off") + col("__go_lcs"))
      .drop("__go_pid", "__go_k", "__go_v", "__go_lcs", "__go_off")
  }

  /** The exact `ntile(n)` tile of a global row number `rn` out of
    * `total` rows — SQL-standard semantics (the first `total % tiles`
    * tiles get one extra row), as pure integer column arithmetic so
    * tile assignment composes with [[withRowNumber]] instead of a
    * global ntile window. Callers supply `total` from a broadcast
    * count.
    */
  def ntileOf(rn: Column, total: Column, tiles: Int): Column = {
    val t = lit(tiles.toLong)
    val n = total.cast("long")
    val base = call_function("div", n, t) // thin-tile size (integral)
    val rem = pmod(n, t) // count of fat (+1-row) tiles
    val cut = (base + lit(1L)) * rem // rows covered by the fat tiles
    when(rn <= cut,
        call_function("div", rn - lit(1L), base + lit(1L)) + lit(1L))
      .otherwise(
        rem + call_function("div", rn - cut - lit(1L), base) + lit(1L))
  }
}
