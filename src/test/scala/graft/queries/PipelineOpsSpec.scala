package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant tests for the round-5 pipeline operators (the oracle
  * checks them end-to-end against DuckDB; these pin the semantic
  * properties a hash compare can't express — independence from the
  * oracle's own formula, coverage/partition laws, and the
  * exact-implies-near containment of incremental dedup).
  */
class PipelineOpsSpec extends SparkSpec {

  test("text_repetition matches an independent Scala recomputation per doc") {
    val got = TextQueries.queries("text_repetition")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(50).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val toks = r.getString(1).split(" ", -1).toSeq
      def dupFrac(k: Int): Double = {
        val n = toks.length - (k - 1)
        if (n <= 0) 0.0
        else {
          val grams = (0 until n).map(i => toks.slice(i, i + k).mkString(" "))
          BigDecimal(1.0 - grams.distinct.length.toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
      val (n, d2, d3, d5) = got(r.getLong(0))
      assert(n === toks.length.toLong)
      assert(d2 === dupFrac(2), s"doc ${r.getLong(0)} 2-gram")
      assert(d3 === dupFrac(3), s"doc ${r.getLong(0)} 3-gram")
      assert(d5 === dupFrac(5), s"doc ${r.getLong(0)} 5-gram")
    }
  }

  test("pipeline_shuffle: a permutation — every doc once, contiguous positions per (split, shard)") {
    val rows = DedupQueries.queries("pipeline_shuffle")(spark, sf).collect()
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_.getLong(0)).distinct.length.toLong === nDocs)
    rows.groupBy(r => (r.getString(1), r.getLong(2))).foreach {
      case ((split, shard), rs) =>
        val pos = rs.map(_.getLong(3)).sorted.toSeq
        assert(pos === (1L to rs.length).toSeq,
          s"positions not contiguous in ($split, $shard)")
    }
  }

  test("pipeline_shuffle is rerun-stable (deterministic hash order, no rand())") {
    val a = DedupQueries.queries("pipeline_shuffle")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = DedupQueries.queries("pipeline_shuffle")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a === b)
  }

  test("dedup_incremental: covers exactly the batch; matches are base docs; exact implies near") {
    val rows = DedupQueries.queries("dedup_incremental")(spark, sf).collect()
    val batch = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 4).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === batch)
    rows.foreach { r =>
      val exact = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val near = if (r.isNullAt(2)) None else Some(r.getLong(2))
      // matches must come from the base corpus, never the batch itself
      (exact ++ near).foreach(m => assert(m % 5 != 4, s"batch-internal match $m"))
      // identical text => identical signature => shared band bucket, so
      // an exact duplicate can never be reported as band-novel
      if (exact.isDefined)
        assert(near.isDefined, s"doc ${r.getLong(0)}: exact dup but near-novel")
      assert(r.getBoolean(3) === (exact.isEmpty && near.isEmpty))
    }
  }

  test("curated corpus writes split-partitioned parquet; read-back prunes partitions") {
    // the batch SINK posture: a pipeline materializes its curated
    // output partitioned by the split column, so downstream training
    // jobs read train/ val/ test/ via partition pruning, never a full
    // scan + filter
    val out = java.nio.file.Files.createTempDirectory("graft-curated-").toString
    try {
      val curated = DedupQueries.queries("pipeline_split")(spark, sf)
      curated.write.mode("overwrite").partitionBy("split").parquet(out)
      val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split=")).toSet
      assert(dirs === Set("split=train", "split=val", "split=test"))
      val back = spark.read.parquet(out)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("component_id"), col("split"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(rows(back) === rows(curated))
      // the split filter must reach the scan as a partition filter
      val plan = back.filter(col("split") === "val").queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert("PartitionFilters: \\[.*split#\\d+ = val".r.findFirstIn(plan).isDefined,
        s"split filter not pruning partitions:\n${plan.take(1500)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("pipeline_mix: per-source quota respected, selection is a greedy prefix") {
    val rows = DedupQueries.queries("pipeline_mix")(spark, sf).collect()
    assert(rows.length.toLong ===
      graft.tables.Tables.documents(spark, sf).count())
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)),
      "degenerate selection — quota selects everything or nothing")
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val target = rs.head.getLong(4)
      assert(rs.map(_.getLong(4)).distinct.length === 1, s"$src: target not constant")
      val selTokens = rs.filter(_.getBoolean(6)).map(_.getLong(2)).sum
      assert(selTokens <= target, s"$src: selected $selTokens > quota $target")
      // greedy prefix: cum_tokens of selected rows are all <= target and
      // every unselected row's cumsum exceeds the target (no gaps)
      rs.foreach { r =>
        assert(r.getBoolean(6) === (r.getLong(5) <= target),
          s"$src doc ${r.getLong(0)}: selection not the cumsum prefix")
      }
    }
  }

  test("pipeline_sample_weighted: exactly n hits, PPS guarantee for heavy docs") {
    val n = DedupQueries.WeightedSampleN.toLong
    val rows = DedupQueries.queries("pipeline_sample_weighted")(spark, sf).collect()
    assert(rows.map(_.getLong(3)).sum === n, "systematic sampler must place exactly n positions")
    rows.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) > 0)))
    // inclusion guarantee: any doc with n_tokens >= T/n is hit at least once
    val t = rows.map(_.getLong(1)).sum
    rows.filter(_.getLong(1) >= (t + n - 1) / n).foreach { r =>
      assert(r.getBoolean(4), s"doc ${r.getLong(0)} exceeds T/n but was not selected")
    }
  }

  test("text_c4_filters: keep is the rule conjunction; every rule splits the corpus") {
    val df = TextQueries.queries("text_c4_filters")(spark, sf)
    val flagCols = df.columns.filter(_.startsWith("ok_"))
    val rows = df.collect()
    val idx = df.columns.zipWithIndex.toMap
    rows.foreach { r =>
      assert(r.getBoolean(idx("keep")) ===
        flagCols.forall(c => r.getBoolean(idx(c))), s"doc ${r.getLong(0)}")
    }
    // the augmentation exists so no rule is vacuous — each must have
    // real positive AND negative rows on the fixture
    flagCols.foreach { c =>
      val pos = rows.count(_.getBoolean(idx(c)))
      assert(pos > 0 && pos < rows.length, s"$c is vacuous ($pos/${rows.length})")
    }
    val kept = rows.count(_.getBoolean(idx("keep")))
    assert(kept > 0 && kept < rows.length)
  }

  test("events_retention: offset 0 counts every cohort member exactly once") {
    val rows = EventQueries.queries("events_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    rows.keys.foreach { case (_, off) => assert(off >= 0L) }
    // independent recomputation of cohort sizes: min event day per user
    val cohortSizes = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"),
        (col("ts_ms") - col("ts_ms") % 86400000L).as("day_ms"))
      .groupBy(col("user_id")).agg(min(col("day_ms")).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cohortSizes.foreach { case (day, n) =>
      assert(rows((day, 0L)) === n, s"cohort $day offset-0 != cohort size")
    }
    // retention never exceeds the cohort size at any offset
    rows.foreach { case ((day, _), n) => assert(n <= cohortSizes(day)) }
  }

  test("dedup_semantic: total, cluster-consistent, min-exemplar keep rule") {
    val out = SimilarityQueries.queries("dedup_semantic")(spark, sf).collect()
    val nVecs = graft.tables.Tables.embeddings(spark, sf).count()
    assert(out.length.toLong === nVecs)
    val list = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (vec, rep, isDup) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      assert(rep <= vec, s"rep $rep > vec $vec")
      assert(isDup === (rep < vec))
      // the exemplar lives in the same trained cluster
      assert(list(rep) === list(vec), s"rep $rep in another cluster than $vec")
    }
    // at least one semantic dup exists at the fixture operating point
    assert(out.exists(_.getBoolean(3)), "threshold marks nothing — dead operator")
  }
}
