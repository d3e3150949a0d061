package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication primitives for document-scale pipelines (SURVEY.md
  * §2.9): exact fingerprints, MinHash signatures + LSH banding,
  * SimHash. All pure Catalyst expressions over token/shingle arrays —
  * per-row, partition-local, no shuffles until the (tiny) band-bucket
  * join, which is the standard web-scale dedup topology: O(n)
  * signature pass + shuffle on band keys that only carries
  * (doc_id, band_hash) pairs, never the documents themselves.
  *
  * Constants (16 hashes, 4 bands × 4 rows) are fixed so the DuckDB
  * oracles can inline identical formulas: hash_j(s) =
  * ((2j+1)·h(s) + 12345j + 7) mod (2^31 − 1) with h = md5-prefix
  * (TextOps.tokenHash31); every intermediate stays < 2^37.
  */
object Dedup {
  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand = 4
  val P: Long = 2147483647L

  /** Exact content fingerprint (normalization hook point). */
  def exactFingerprint(text: Column): Column = md5(text)

  /** MinHash signature (array of NumHashes longs) over a (not
    * necessarily distinct) shingle/token array. Routed through the
    * codegen'd [[graft.functions.MinHashSig]] kernel — one streaming
    * pass with internal string dedup and all 16 affine minima folded
    * compiled; the HOF formulation ([[minhashSignatureHof]]) walked
    * 16 × |distinct| interpreted lambdas per row.
    */
  def minhashSignature(shingleArr: Column): Column =
    graft.functions.MinHashSig(shingleArr)

  /** Reference HOF formulation of [[minhashSignature]]; kept only as
    * the independent cross-check oracle in MinHashSigSpec.
    */
  private[graft] def minhashSignatureHof(shingleArr: Column): Column = {
    // Hash every shingle ONCE (md5+conv dominate), then take NumHashes
    // mins over cheap affine re-hashes. The element_at(transform(array(
    // …)), 1) wrapper is a let-binding: without it projection collapse
    // inlines the md5 pass into each of the NumHashes lambdas (a
    // measured 15× slowdown at sf0.1).
    val hashes = transform(shingleArr, s => TextOps.tokenHash31(s))
    element_at(
      transform(array(hashes), hs =>
        transform(sequence(lit(0), lit(NumHashes - 1)), j =>
          array_min(transform(hs, h =>
            ((lit(2L) * j + 1L) * h + j * 12345L + 7L) % P)))),
      1)
  }

  /** LSH band hashes: md5 over each band's signature slice. Explode
    * the result and shuffle on (band, band_hash) to find candidates.
    */
  def bandHashes(signature: Column): Column =
    bandHashesCfg(signature, NumBands, RowsPerBand)

  /** Parameterized banding over the same signature — the (b, r) knob
    * of the LSH S-curve (match probability 1 − (1 − j^r)^b): more,
    * narrower bands → recall; fewer, wider bands → precision.
    * `dedup_lsh_sweep` measures the tradeoff; the production config
    * above is one point on the curve.
    */
  def bandHashesCfg(signature: Column, bands: Int, rowsPer: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.cast("long").as("band"),
        md5(concat_ws(",",
          transform(slice(signature, b * rowsPer + lit(1), lit(rowsPer)),
            x => x.cast("string")))).as("band_hash")))

  /** Exact Jaccard over two distinct-element arrays:
    * |A∩B| / (|A| + |B| − |A∩B|) — one intersection instead of
    * building the union array.
    */
  def jaccard(a: Column, b: Column): Column =
    let1(size(array_intersect(a, b))) { i =>
      i / (size(a) + size(b) - i).cast("double")
    }

  private def let1(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** MinHash Jaccard estimate: agreeing signature positions / total. */
  def minhashEstimate(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v) / lit(NumHashes).cast("double")

  /** 32-bit SimHash over a token array (with multiplicity): bit b is
    * set iff Σ_tokens (±1 by bit b of the token hash) is positive.
    * Routed through the codegen'd [[graft.functions.SimHash32]]
    * expression — the HOF formulation ([[simhashHof]]) interprets
    * 32 × |toks| lambdas per row (measured 21.5 s vs ~0.3 s for 5,000
    * sf0.1 docs).
    */
  def simhash(toks: Column): Column =
    graft.functions.SimHash32(transform(toks, t => TextOps.tokenHash31(t)))

  /** Reference HOF formulation of [[simhash]]; kept only as the
    * independent cross-check oracle in DedupSpec.
    */
  private[graft] def simhashHof(toks: Column): Column = {
    val hashes = transform(toks, t => TextOps.tokenHash31(t))
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) => {
      val pow2b = pow(lit(2.0), b).cast("long")
      val bitSum = aggregate(hashes, lit(0L), (s, h) =>
        s + ((h / pow2b.cast("double")).cast("long") % 2L) * 2L - 1L)
      acc + when(bitSum > 0, pow2b).otherwise(0L)
    })
  }

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Substring/sequence-level dedup stats: chunk every document into
    * overlapping `k`-token spans (the codegen [[graft.functions.ShingleHashes]]
    * kernel — distinct span hashes per doc in one compiled pass),
    * hash-group spans across the corpus (count per span = its document
    * frequency), and report per doc how many of its spans recur in
    * other documents. Docs shorter than `k` tokens keep a row with
    * zero spans. Linear end-to-end: one projection + one
    * partial-aggregable hash agg on span_h + one shuffle join back +
    * one hash agg on doc_id — never pair-shaped.
    *
    * @param docs (doc_id: long, text: string)
    * @return (doc_id, n_spans, n_shared_spans, max_span_df,
    *         has_shared_span)
    */
  def substringStats(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    // Convenience one-shot form: recomputes the span projection in
    // both consuming branches. Pipelines should materialize
    // [[spanTable]] once and call [[substringStatsFrom]] — that is
    // what the dedup_substring query does via its shared artifact (a
    // persist here would leak a cached dataset per call with no
    // release handle).
    substringStatsFrom(docs, spanTable(docs, k))

  /** The exploded (doc_id, span_h) table — one row per distinct
    * k-token span per doc. Callers that feed several consumers should
    * persist/materialize it (DedupQueries shares it as an artifact).
    */
  def spanTable(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(TextOps.tokens(col("text")), k)).as("span_h"))

  /** The POSITIONAL gram table — one row per k-token gram occurrence,
    * with its token position: (doc_id, pos, gram_h). The positional
    * sibling of [[spanTable]] ([[graft.functions.GramHashes]] keeps
    * gram order where ShingleHashes deduplicates), feeding the
    * coverage computation interval-union positions [[spanTable]]
    * cannot. O(total tokens) rows; at 100 TB this is the pipeline's
    * materialized grams table, written once beside the spans table.
    */
  def gramTable(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      posexplode(graft.functions.GramHashes(TextOps.tokens(col("text")), k))
        .as(Seq("pos", "gram_h")))

  /** Per-document duplicated-span COVERAGE (the Lee-et-al substring
    * dedup measure): the fraction of a doc's tokens inside a k-token
    * span that also appears in ≥2 distinct documents. A token t is
    * covered iff some duplicated gram starts in [t−k+1, t]; since all
    * intervals have length exactly k, the interval-union length is
    * Σ min(k, pos_i − pos_{i−1}) over the doc's sorted duplicated
    * gram starts (first term = k) — one lag window partitioned by
    * doc_id (bounded by doc length, never global).
    *
    * Linear end-to-end: one gram-hash agg for document frequency
    * (two-phase countDistinct, partial-aggregable), one gram-keyed
    * shuffle join back, one per-doc window + hash agg. Never
    * pair-shaped — the join carries gram OCCURRENCES (O(total
    * tokens)), not doc pairs.
    *
    * @param docs (doc_id: long, text: string)
    * @return (doc_id, n_tokens, n_dup_grams, covered_tokens,
    *         coverage_r) — docs shorter than k keep a zero row
    */
  def spanCoverageFrom(docs: org.apache.spark.sql.DataFrame,
                       grams: org.apache.spark.sql.DataFrame,
                       k: Int): org.apache.spark.sql.DataFrame = {
    val dupGrams = grams.groupBy(col("gram_h"))
      .agg(countDistinct(col("doc_id")).as("gram_df"))
      .filter(col("gram_df") >= 2)
      .select(col("gram_h"))
    coverageOver(docs, grams.join(dupGrams, "gram_h"), k)
  }

  /** The interval-union finish shared by the corpus-wide and
    * incremental coverage forms: given the duplicated gram
    * OCCURRENCES (doc_id, pos), union the length-k intervals per doc
    * (Σ min(k, gap) over sorted starts — one lag window bounded by
    * doc length) and left-join zeros for uncovered docs.
    */
  private[graft] def coverageOver(docs: org.apache.spark.sql.DataFrame,
                                  dupPos: org.apache.spark.sql.DataFrame,
                                  k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cov = dupPos.select(col("doc_id"), col("pos"))
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("c",
        when(col("prev").isNull, lit(k))
          .otherwise(least(lit(k), col("pos") - col("prev"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_grams"),
           sum(col("c")).cast("long").as("covered_tokens"))
    docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L))
          / col("n_tokens").cast("double"), 6).as("coverage_r"))
  }

  /** The span-dedup ACTION (Lee-et-al substring removal): rebuild
    * each document with every token inside a duplicated ≥k-token span
    * REMOVED. Covered positions come from the same duplicated-gram
    * occurrences as [[spanCoverageFrom]], expanded to token indices
    * (one bounded explode of k per occurrence, distinct-folded);
    * surviving tokens re-join in document order via an in-group
    * array_sort — per-doc bounded, never a global sort. Everything
    * else is the coverage chain's hash aggs and one anti-join on
    * (doc_id, pos) — linear, the transform a curation run actually
    * applies after the impact row justifies it.
    *
    * @return (doc_id, n_tokens, kept_tokens, stripped_text) — fully
    *         covered docs keep a row with kept_tokens = 0 and ''
    */
  def substringStrip(docs: org.apache.spark.sql.DataFrame,
                     grams: org.apache.spark.sql.DataFrame,
                     k: Int): org.apache.spark.sql.DataFrame = {
    val dupGrams = grams.groupBy(col("gram_h"))
      .agg(countDistinct(col("doc_id")).as("gram_df"))
      .filter(col("gram_df") >= 2)
      .select(col("gram_h"))
    val covered = grams.join(dupGrams, "gram_h")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val toks = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("stripped_text"))
    docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("stripped_text"), lit("")).as("stripped_text"))
  }

  /** The maximal-SPAN audit table (VERDICT r15 item 6): coverage says
    * how much of a doc is duplicated; auditors ask WHICH spans. Merge
    * the length-k intervals of the duplicated gram occurrences into
    * maximal (doc_id, span_start, span_end) islands — gaps-and-islands
    * over the same one-per-doc lag window the coverage finish uses
    * (break when the next start exceeds prev + k, island id = running
    * sum of breaks), then one hash agg per island. Σ island lengths ≡
    * covered_tokens by construction (spec-pinned). Bounded by doc
    * length per partition, never global.
    *
    * @return (doc_id, span_start, span_end, n_grams) — token-index
    *         bounds inclusive, n_grams = duplicated gram starts inside
    */
  def substringIntervals(docs: org.apache.spark.sql.DataFrame,
                         grams: org.apache.spark.sql.DataFrame,
                         k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dupGrams = grams.groupBy(col("gram_h"))
      .agg(countDistinct(col("doc_id")).as("gram_df"))
      .filter(col("gram_df") >= 2)
      .select(col("gram_h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams.join(dupGrams, "gram_h")
      .select(col("doc_id"), col("pos"))
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > k, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
           (max(col("pos")) + (k - 1)).cast("long").as("span_end"),
           count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_grams"))
  }

  /** [[substringStats]] body over a prebuilt span table. */
  def substringStatsFrom(docs: org.apache.spark.sql.DataFrame,
                         spans: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spanDf = spans.groupBy(col("span_h"))
      .agg(count(lit(1)).as("n_docs"))
    val perDoc = spans.join(spanDf, "span_h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_shared_spans"),
           max(col("n_docs")).as("max_span_df"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"),
        coalesce(col("max_span_df"), lit(0L)).as("max_span_df"),
        (coalesce(col("n_shared_spans"), lit(0L)) > 0).as("has_shared_span"))
  }
}
