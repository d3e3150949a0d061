package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-15 pins: the span-coverage interval union
  * (dedup_substring_coverage / pipeline_substring_impact) against a
  * brute-force per-token recompute, and the GramHashes ↔
  * ShingleHashes hash-identity contract.
  */
class Round15OpsSpec extends SparkSpec {

  import spark.implicits._

  private val K = 4

  /** A hand-built corpus with every coverage shape: disjoint dup
    * spans, overlapping dup spans (gap < k), a doc shorter than k, a
    * doc with zero duplicated grams, and a doc that repeats its own
    * gram (internal repeat — counts only if the gram also appears in
    * ANOTHER doc).
    */
  private lazy val corpus = Seq(
    // docs 1/2 share the run "a b c d e" (2 grams at k=4) AND the
    // disjoint run "p q r s" — overlapping + disjoint intervals
    (1L, "a b c d e x x1 x2 p q r s"),
    (2L, "y y1 y2 a b c d e z p q r s"),
    // doc 3: no gram shared with anyone
    (3L, "u v w m n o t g h i"),
    // doc 4: shorter than k — zero grams, zero coverage row
    (4L, "s1 s2 s3"),
    // doc 5 repeats "a b c d" internally; the gram is also in 1/2 so
    // BOTH occurrences are duplicated positions
    (5L, "a b c d q5 a b c d")
  ).toDF("doc_id", "text")

  /** Brute-force truth: token t of doc d is covered iff some gram
    * with corpus-wide distinct-doc df ≥ 2 starts in [t−k+1, t]. */
  private def bruteCoverage(
      docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val t = text.split(" ")
      (0 to t.length - K).map(p => (id, p, t.slice(p, p + K).mkString(" ")))
    }
    val df2 = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    docs.map { case (id, text) =>
      val n = text.split(" ").length
      val dupStarts = grams.filter(g => g._1 == id && df2(g._3)).map(_._2)
      val covered = dupStarts.flatMap(p => p until p + K).distinct.size
      id -> (n.toLong, dupStarts.size.toLong, covered.toLong)
    }.toMap
  }

  test("spanCoverageFrom matches the brute-force per-token recompute") {
    val got = Dedup.spanCoverageFrom(corpus, Dedup.gramTable(corpus, K), K)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val want = bruteCoverage(Seq(
      (1L, "a b c d e x x1 x2 p q r s"),
      (2L, "y y1 y2 a b c d e z p q r s"),
      (3L, "u v w m n o t g h i"),
      (4L, "s1 s2 s3"),
      (5L, "a b c d q5 a b c d")))
    assert(got.keySet == want.keySet)
    for ((id, (n, dup, cov)) <- want) {
      val (gn, gdup, gcov, grate) = got(id)
      assert(gn == n, s"doc $id n_tokens")
      assert(gdup == dup, s"doc $id n_dup_grams")
      assert(gcov == cov, s"doc $id covered_tokens")
      assert(math.abs(grate - cov.toDouble / n) < 1e-6, s"doc $id coverage_r")
    }
    // shape pins: the short doc has a zero row, doc 3 is uncovered,
    // docs 1/2 have strictly partial coverage, doc 5's internal
    // repeat double-counts positions but unions to 8 covered tokens
    assert(want(4L) == ((3L, 0L, 0L)))
    assert(want(3L)._3 == 0L)
    assert(want(1L)._3 > 0L && want(1L)._3 < want(1L)._1)
    assert(want(5L) == ((9L, 2L, 8L)))
  }

  test("GramHashes is the positional expansion of ShingleHashes") {
    // distinct(GramHashes) == ShingleHashes for every doc (same md5
    // kernel, dedup vs positional), and gram count = n − k + 1
    val both = corpus.select(col("doc_id"),
        graft.functions.GramHashes(graft.text.TextOps.tokens(col("text")), K)
          .as("pos"),
        graft.functions.ShingleHashes(graft.text.TextOps.tokens(col("text")), K)
          .as("dis"),
        size(graft.text.TextOps.tokens(col("text"))).as("n"))
      .collect()
    for (r <- both) {
      val pos = r.getSeq[Long](1)
      val dis = r.getSeq[Long](2)
      assert(pos.distinct == dis,
        s"doc ${r.getLong(0)}: distinct positional grams != shingle hashes")
      assert(pos.length == math.max(r.getInt(3) - K + 1, 0))
    }
  }

  test("substringStrip is the exact complement of the coverage measure") {
    val docs = corpus
    val grams = Dedup.gramTable(docs, K)
    val cov = Dedup.spanCoverageFrom(docs, grams, K)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val stripped = Dedup.substringStrip(docs, grams, K)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped.keySet == cov.keySet)
    for ((id, (n, kept, text)) <- stripped) {
      // kept = n_tokens − covered_tokens, token for token
      assert(n == cov(id)._1)
      assert(kept == cov(id)._1 - cov(id)._2, s"doc $id kept_tokens")
      val toks = text.split(" ").filter(_.nonEmpty)
      assert(toks.length == kept, s"doc $id stripped token count")
      // survivors are a subsequence of the original document
      val orig = texts(id).split(" ")
      var oi = 0
      for (t <- toks) {
        while (oi < orig.length && orig(oi) != t) oi += 1
        assert(oi < orig.length, s"doc $id: '$t' out of order in strip")
        oi += 1
      }
    }
    // doc 3 (no duplicated spans) survives verbatim; docs 1/2 lose
    // their shared runs but keep the unique middles
    assert(stripped(3L)._3 == texts(3L))
    assert(stripped(1L)._3.contains("x1") && !stripped(1L)._3.contains("a b c d"))
  }

  test("incremental coverage: batch grams against an explicit base set") {
    // base = docs 1-3, batch = docs 4-5. Doc 5's "a b c d" grams ARE
    // in base (doc 1); doc 4 is shorter than k — zero row.
    val docs = corpus
    val grams = Dedup.gramTable(docs, K)
    val baseGrams = grams.filter(col("doc_id") <= 3).select(col("gram_h")).distinct()
    val batchPos = grams.filter(col("doc_id") >= 4).join(baseGrams, "gram_h")
    val got = Dedup.coverageOver(
        docs.filter(col("doc_id") >= 4).select(col("doc_id"), col("text")),
        batchPos, K)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(4L, 5L))
    assert(got(4L) == ((3L, 0L, 0L)))
    // doc 5 = "a b c d q5 a b c d": both "a b c d" occurrences (pos 0
    // and 5) exist in base via doc 1 → union covers 8 of 9 tokens
    assert(got(5L) == ((9L, 2L, 8L)))
  }

  // ---- perceptual media hash ----------------------------------------

  test("ahash is resize/re-encode invariant where pixel sums are not") {
    import graft.multimodal.MultimodalOps
    val key = 0x0F5A3C9112345L // arbitrary 60-bit pattern, mixed bits
    val a = MultimodalOps.ahashPng(MultimodalOps.synthPattern(64, 64, key))
    val b = MultimodalOps.ahashPng(MultimodalOps.synthPattern(97, 41, key))
    // same scene at different sizes: identical perceptual hash...
    assert(a._4 == key && b._4 == key,
      s"ahash must recover the pattern key: ${a._4} / ${b._4} vs $key")
    // ...but different dims and global pixel sums — the statistic
    // tier (mm_near_dup's feature vector) cannot bucket this pair
    assert(a._1 != b._1 && a._2 != b._2 && a._3 != b._3)
    // degenerate keys stay deterministic: all-dark pattern hashes to 0
    assert(MultimodalOps.ahashPng(MultimodalOps.synthPattern(32, 32, 0L))._4 == 0L)
  }

  test("perceptual fixture pairs share every band; ahash matches the key chain") {
    import graft.multimodal.MultimodalOps
    val hashed = MultimodalOps.ahashPngs(
        MultimodalOps.perceptualTable(spark, sf).limit(64))
      .select(col("media_id"), col("ahash"), col("sum3"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc pairs (2k, 2k+1): identical ahash (the resized duplicate),
    // and at least one pair differs in raw pixel sums
    val pairs = hashed.keys.groupBy(_ / 2).values.filter(_.size == 2)
    assert(pairs.nonEmpty)
    for (p <- pairs) {
      val Seq(x, y) = p.toSeq.sorted
      assert(hashed(x)._1 == hashed(y)._1, s"pair ($x,$y) ahash mismatch")
    }
    assert(pairs.exists { p =>
      val Seq(x, y) = p.toSeq.sorted
      hashed(x)._2 != hashed(y)._2
    }, "fixture should contain a pair the sum-statistic tier misses")
  }

  test("substring impact aggregates the per-doc coverage exactly") {
    val docs = corpus.withColumn("source",
      when(col("doc_id") <= 2, "s_a").otherwise("s_b"))
    val cov = Dedup.spanCoverageFrom(
      docs.select(col("doc_id"), col("text")), Dedup.gramTable(docs, K), K)
    val impact = cov.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("covered_tokens")).as("dup"), sum(col("n_tokens")).as("tot"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = bruteCoverage(Seq(
      (1L, "a b c d e x x1 x2 p q r s"),
      (2L, "y y1 y2 a b c d e z p q r s"),
      (3L, "u v w m n o t g h i"),
      (4L, "s1 s2 s3"),
      (5L, "a b c d q5 a b c d")))
    val wantA = (want(1L)._3 + want(2L)._3, want(1L)._1 + want(2L)._1)
    val wantB = (want(3L)._3 + want(4L)._3 + want(5L)._3,
      want(3L)._1 + want(4L)._1 + want(5L)._1)
    assert(impact("s_a") == wantA)
    assert(impact("s_b") == wantB)
  }
}
