package graft

import graft.queries._

/** Plan-quality invariants, asserted (not eyeballed): filters reach
  * the parquet scan, projections prune the read schema, narrow
  * operators stay shuffle-free, and nothing degenerates to a
  * cartesian product. These are the properties that decide whether a
  * plan survives a 100 TB scale-up; a regression (e.g. an expression
  * change that blocks pushdown) fails CI instead of the next bench.
  *
  * Planner-dependent choices (broadcast vs shuffle join) are NOT
  * asserted — at test scale every frame is under the broadcast
  * threshold, and those decisions flip with stats by design.
  */
class PlanShapeSpec extends SparkSpec {

  // Memoized artifacts (queries/Artifacts.scala) localCheckpoint their
  // builds eagerly, so consumer plans contain only an opaque LogicalRDD
  // scan and these sweeps would be BLIND to regressions inside the
  // artifact builds (clear()ing alone doesn't help — the rebuild is
  // checkpointed again). Passthrough mode returns the raw un-checkpointed
  // build, so every plan carries its full build inline (cheap at
  // sf0.001; the iterative CC/Lloyd interiors still truncate per round
  // by design — their per-round bodies are spec'd separately).
  private def fullPlanQuery(name: String) = {
    Artifacts.passthrough = true
    try SparkEntry.queries(name)(spark, sf)
    finally Artifacts.passthrough = false
  }

  private def executedPlan(name: String): String =
    fullPlanQuery(name).queryExecution.executedPlan.toString

  private def optimizedScan(name: String): String =
    // formatted explain carries the scan's PushedFilters/ReadSchema
    fullPlanQuery(name).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q1_agg: quantity filter is pushed into the parquet scan, columns pruned") {
    val plan = optimizedScan("q1_agg")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,50.0)]"),
      s"filter not pushed:\n${plan.take(2000)}")
    // 4 referenced lineitem columns of 16 — the scan schema must not
    // include unreferenced ones like l_comment/l_shipdate
    assert(!plan.contains("l_comment") && !plan.contains("l_shipdate"))
  }

  test("narrow extension operators plan with zero exchanges") {
    // pure projections: any Exchange here means a scale regression
    Seq("text_stats", "text_quality", "text_fingerprint", "text_bpe_tokens",
        "text_redact", "text_repetition", "text_c4_filters", "pipeline_sample")
      .foreach { name =>
        val plan = executedPlan(name)
        assert(!plan.contains("Exchange"), s"$name gained a shuffle:\n${plan.take(1500)}")
      }
    // dedup_simhash joins doc->next (one broadcast of a projection) —
    // the simhash computation itself must not force a shuffle
    val sh = executedPlan("dedup_simhash")
    assert(!sh.contains("ShuffleExchange"), s"dedup_simhash shuffles:\n${sh.take(1500)}")
  }

  test("no cartesian products anywhere in the query surface") {
    // the two intended cross joins are against one-row broadcast
    // frames (centroid array / plane literals) and must plan as
    // BroadcastNestedLoopJoin, never CartesianProduct
    SparkEntry.queries.keys.filterNot(_.startsWith("stream")).foreach { name =>
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${plan.take(1500)}")
    }
  }

  test("aggregations are partial (map-side combine before the exchange)") {
    // HashAggregate(partial) -> Exchange -> HashAggregate(final): the
    // partial phase must appear under the exchange for the flagship agg
    val plan = optimizedScan("q1_agg")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0)
    assert(plan.indexOf("Exchange") > firstAgg || plan.contains("partial_"),
      "no partial aggregation phase visible")
  }

  test("AQE skew-join splits the hot partition (metric-asserted, not eyeballed)") {
    // adversarial 90%-hot-key join, thresholds scaled to test size; the
    // final adaptive plan must report the skew split in its own
    // AQEShuffleRead metrics — the runtime answer to skew that
    // q_salted_join's static rewrite complements (SkewBench measures
    // the wall-clock three-way contrast at 20M rows)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (_, parts, splits, plan) = SkewBench.runJoin(
        SkewBench.skewedFact(spark, 400000L).join(SkewBench.dimTable(spark), "k"))
      assert(parts >= 1, s"no skewed partition detected:\n${plan.take(1500)}")
      assert(splits >= 2, s"skewed partition not split:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("text_bm25: the documents scan reads only doc_id and text") {
    val plan = optimizedScan("text_bm25")
    assert(!plan.contains("source") && !plan.contains("n_chars"),
      s"bm25 scan reads unreferenced columns:\n${plan.take(1500)}")
  }

  test("events_profile: one scan, no joins — a single-pass profile") {
    val plan = executedPlan("events_profile")
    assert(!plan.contains("Join"), s"profiler joins:\n${plan.take(1500)}")
    assert("FileScan|LogicalRDD".r.findAllIn(plan).length <= 1,
      s"profiler scans the table more than once:\n${plan.take(1500)}")
  }

  test("dedup_lsh_pairs: no forced broadcast of the corpus, star edges bounded") {
    // the query must leave corpus-side join strategy to the planner —
    // i.e. contain no ResolvedHint/broadcast() on the token-set table.
    // (At fixture scale the PLANNER may still pick broadcast; the
    // logical plan must simply not force it.)
    val logical = fullPlanQuery("dedup_lsh_pairs")
      .queryExecution.optimizedPlan.toString
    assert(!logical.contains("ResolvedHint"),
      "corpus join carries a broadcast hint — OOM by construction at scale")
  }

  test("events_drift: the whole two-sided chart rides ONE sort, ONE exchange") {
    // the running frames chain into consecutive Window nodes (their
    // withColumn dependencies force the split) but they all share the
    // identical partition-sort — so the plan must carry exactly one
    // Sort and one data Exchange; a second sort/shuffle means the
    // prefix-identity rewrite regressed to multiple passes
    val plan = executedPlan("events_drift")
    assert("\\+- Sort ".r.findAllIn(plan).length == 1, plan.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      plan.take(1500)) // window sort + the tiny stats-agg exchange
  }

  test("text_keywords: the per-doc top-3 plans as a group limit") {
    // the rank filter must compile to WindowGroupLimit (map-side ≤3
    // rows per doc BEFORE the shuffle) — a plain Window + Filter
    // ships every doc×term row through the sort
    val plan = executedPlan("text_keywords")
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }

  test("pipeline_sample_wor: the reservoir top-K plans as a map-side take") {
    // the merge-law claim made physical: rn ≤ K over the global key
    // order must compile to TakeOrderedAndProject (each map task keeps
    // its own top-K, the merge re-selects — exactly the A-ES
    // truncation law) or WindowGroupLimit — without either, the
    // 'sample' ships the whole corpus through one reducer's sort.
    // Read from the pre-rank frame: the final TinyOrder rank's eager
    // localCheckpoint truncates the shipped query's executed plan to
    // a checkpoint scan that can't show the take.
    import graft.queries.DedupQueries
    val plan = DedupQueries.worTake(DedupQueries.worKeys(
        graft.tables.Tables.documents(spark, sf)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") ||
           plan.contains("WindowGroupLimit"), plan.take(1500))
  }

  test("events_bootstrap_ci: all 32 replicates ride ONE corpus exchange") {
    // the Poisson-bootstrap pitch is 64 partial-aggregated sums in a
    // single pass: exactly one exchange may touch row-sized data (the
    // per-type hash agg); the replicate explode + rank run on the
    // ~|types|-row frame after it
    val plan = executedPlan("events_bootstrap_ci")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"$exchanges exchanges:\n${plan.take(1500)}")
    assert("HashAggregate".r.findAllIn(plan).nonEmpty)
  }

  test("events_binning: one shuffle feeds the per-type ntile, one the re-agg") {
    // window on (type) + partial-aggregable summary: two exchanges
    // max; more means the bin table re-shuffles row-sized data
    val plan = executedPlan("events_binning")
    assert("Exchange".r.findAllIn(plan).length <= 2, plan.take(1500))
  }
}
