package graft.queries

import graft.SparkSpec

/** Semantic guarantees of the deterministic sketches that the oracle
  * hash-compare can't express: count-min never under-counts (the
  * one-sided error bound is the sketch's defining property), and the
  * HLL estimate lands within a generous multiple of its theoretical
  * standard error (1.04/√m ≈ 6.5% at m=256).
  */
class SketchSpec extends SparkSpec {

  test("count-min estimates are one-sided: cnt_cms >= cnt_true on every heavy hitter") {
    val rows = TextQueries.queries("sketch_cms_tokens")(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: cms ${r.getLong(2)} < true ${r.getLong(1)}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
  }

  test("HLL estimate is within 5 standard errors of the truth") {
    val r = EventQueries.queries("sketch_hll_users")(spark, sf).collect().head
    val (est, truth) = (r.getDouble(4), r.getLong(5))
    val se = 1.04 / math.sqrt(256.0)
    assert(truth > 0)
    assert(math.abs(est - truth) / truth <= 5 * se,
      s"estimate $est vs true $truth exceeds 5 standard errors")
  }

  test("quantile sketch: grid-resolution error bound holds on every quantile") {
    val rows = EventQueries.queries("sketch_quantiles")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(50L, 90L, 95L, 99L))
    rows.foreach { r =>
      val (est, truth) = (r.getDouble(1), r.getDouble(2))
      // estimate = lower edge of the bucket holding the true kth order
      // statistic, so it sits within one 1/4-wide cell below the truth
      assert(est <= truth && truth - est < 0.25,
        s"p${r.getLong(0)}: est $est vs true $truth breaks the 1/4-grid bound")
    }
  }

  test("bloom filter: no false negatives, and partial filters OR-merge to the batch filter") {
    import org.apache.spark.sql.functions._
    val rows = EventQueries.queries("sketch_bloom")(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // the defining one-sided guarantee: every present key is a member
    assert(rows.getOrElse((true, false), 0L) === 0L, s"false negatives: $rows")
    assert(rows.getOrElse((true, true), 0L) > 0L)

    val base = graft.tables.Tables.events(spark, sf)
      .select(col("user_id").cast("string").as("key")).distinct()
    val batchBits = EventQueries.bloomBits(base)
      .collect().map(_.getLong(0)).toSet
    // OR law: union of per-part partial filters == the batch filter
    val parts = Seq(base.filter(col("key").cast("long") % 2 === 0),
                    base.filter(col("key").cast("long") % 2 =!= 0))
    val merged = parts.map(p => EventQueries.bloomBits(p)
      .collect().map(_.getLong(0)).toSet).reduce(_ union _)
    assert(batchBits.nonEmpty && merged === batchBits)
  }

  test("quantile sketch: merged partial histograms equal the batch histogram") {
    import org.apache.spark.sql.functions._
    val vals = graft.tables.Tables.events(spark, sf)
      .filter(col("value").isNotNull).select(col("value"))
    val batch = EventQueries.quantileBuckets(vals)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    // split on an arbitrary per-row predicate and merge by bucket SUM —
    // the additive law the streaming twin relies on
    val parts = Seq(
      vals.filter(col("value") * 100 % 3 < 1.5),
      vals.filter(!(col("value") * 100 % 3 < 1.5)))
    val merged = parts
      .map(p => EventQueries.quantileBuckets(p)
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt")))
      .reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val b = batch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b.nonEmpty && b === m)
  }

  test("join-size estimate is exactly 1/p-scaled truth over the hash-sampled keys") {
    import org.apache.spark.sql.functions._
    // sf0.001 has ~30 distinct users — the 1/8 sample can be empty;
    // the law needs a populated sample
    val dir = "/root/testdata/sf0.01"
    val r = EventQueries.queries("sketch_join_size")(spark, dir).collect().head
    val (nSampled, est, truth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // recompute the estimator from raw rows + Java MD5 — independent
    // of both engines' hash/agg paths
    def md5h(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(7).map("%02x".format(_)).mkString, 16)
    }
    val byUser = graft.tables.Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.groupBy(_.getString(1)).view.mapValues(_.length).toMap)
      .toMap
    val contribs = byUser.collect {
      case (u, f) if f.contains("view") && f.contains("purchase") =>
        (u, f("view").toLong * f("purchase"))
    }
    val sampled = contribs.filter { case (u, _) =>
      md5h(u) % EventQueries.JoinSampleP == 0
    }
    assert(nSampled == sampled.size)
    assert(est == sampled.map(_._2).sum * EventQueries.JoinSampleP)
    assert(truth == contribs.map(_._2).sum)
    assert(nSampled > 0, "sample empty at sf0.01 — law vacuous")
    // and the estimate is informative at this rate
    assert(math.abs(est - truth).toDouble / truth < 0.5)
  }
}
