package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** `pipeline_pareto` computes the skyline with an O(n log n)
  * staircase; the DuckDB oracle is the O(n²) dominance definition.
  * This proves the equivalence ENGINE-side too (independent of the
  * oracle), plus the completeness property. `pipeline_sample_wor`
  * ranks on a 12-dp-quantized ln-key; this pins the selection-edge
  * gap and rounding-boundary margins against the engines' 1-ulp ln
  * divergence, the weighted-inclusion bias, and the merge law that
  * justifies per-partition truncation (the scale argument).
  */
class ParetoSampleSpec extends SparkSpec {

  test("staircase skyline == quadratic dominance definition (engine-side)") {
    val d = graft.tables.Tables.documents(spark, sf).select(
      col("doc_id"), col("n_chars"),
      round(size(array_distinct(split(col("text"), " "))).cast("double")
            / size(split(col("text"), " ")), 9).as("ttr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val naive = d.filter { case (_, c1, t1) =>
      !d.exists { case (_, c2, t2) =>
        c2 >= c1 && t2 >= t1 && (c2 > c1 || t2 > t1) }
    }.map(_._1).toSet
    val engine = DedupQueries.queries("pipeline_pareto")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    info(s"frontier size ${engine.size} of ${d.length} docs")
    assert(engine == naive, "staircase frontier != dominance definition")
    assert(engine.nonEmpty && engine.size < d.length)
  }

  test("every excluded point is dominated by a frontier point") {
    val d = graft.tables.Tables.documents(spark, sf).select(
      col("doc_id"), col("n_chars"),
      round(size(array_distinct(split(col("text"), " "))).cast("double")
            / size(split(col("text"), " ")), 9).as("ttr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val frontier = DedupQueries.queries("pipeline_pareto")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val front = d.filter(p => frontier.contains(p._1))
    d.filterNot(p => frontier.contains(p._1)).foreach { case (id, c, t) =>
      assert(front.exists { case (_, fc, ft) =>
        fc >= c && ft >= t && (fc > c || ft > t) },
        s"doc $id excluded but not dominated by any frontier point")
    }
  }

  private def keys = graft.tables.Tables.documents(spark, sf)
    .select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      conv(substring(md5(concat(col("doc_id").cast("string"), lit("#wor"))),
        1, 12), 16, 10).cast("long").as("h"))
    .collect()
    .map { r =>
      val h = r.getLong(2); val w = r.getLong(1)
      val key = math.log((h + 1).toDouble / 281474976710656.0) / w
      (r.getLong(0), w, key)
    }

  test("sample_wor selection edge and 12-dp boundary margins hold") {
    val ks = keys
    val sortedKeys = ks.map { case (id, _, k) =>
      (BigDecimal(k).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble, id)
    }.sortBy { case (k, id) => (-k, id) }
    val gap = sortedKeys(DedupQueries.WorSampleK - 1)._1 -
      sortedKeys(DedupQueries.WorSampleK)._1
    info(f"rank-K/K+1 rounded-key gap = $gap%.3e")
    assert(gap > 1e-11 || (gap == 0.0 &&
      sortedKeys(DedupQueries.WorSampleK - 1)._2 <
        sortedKeys(DedupQueries.WorSampleK)._2),
      "selection edge decided inside one quantization step without a " +
        "deterministic id tiebreak")
    val m = ks.map { case (_, _, k) =>
      val f = k * 1e12 - math.floor(k * 1e12)
      math.abs(f - 0.5)
    }.min
    info(f"min key margin = $m%.3e (1e-12 units)")
    assert(m > 1e-6, "a key sits too close to its 12-dp boundary")
  }

  test("weighted inclusion bias + per-partition truncation merge law") {
    val sample = DedupQueries.queries("pipeline_sample_wor")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens")))
    val ks = keys
    val corpusMean = ks.map(_._2).sum.toDouble / ks.length
    val sampleMean = sample.map(_._2).sum.toDouble / sample.length
    info(f"mean tokens: corpus $corpusMean%.1f vs sample $sampleMean%.1f")
    assert(sampleMean > corpusMean,
      "weight-proportional sampling must over-select heavy docs")

    // merge law: top-K within arbitrary shards, re-selected, equals
    // the global top-K — the property that lets every map task
    // truncate to K before the shuffle
    val k = DedupQueries.WorSampleK
    def topK(xs: Iterable[(Long, Double)]): Seq[(Long, Double)] =
      xs.toSeq.sortBy { case (id, key) => (-key, id) }.take(k)
    val quant = ks.map { case (id, _, key) =>
      (id, BigDecimal(key).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val global = topK(quant).map(_._1)
    val sharded = topK(quant.groupBy(_._1 % 3).values
        .flatMap(a => topK(a.toSeq)).toSeq)
      .map(_._1)
    assert(sharded == global, "per-shard truncated top-K != global top-K")
    assert(sample.map(_._1).toSet == global.toSet,
      "engine sample != reference top-K")
  }
}
