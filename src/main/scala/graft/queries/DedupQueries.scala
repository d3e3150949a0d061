package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.tables.Tables
import graft.text.TextOps

/** Dedup extension operators over `documents` (SURVEY.md §2.9).
  * Five flavors: exact (hash-group), MinHash signature + LSH banding
  * (scale path for near-dup candidate generation), candidate-pair
  * verification with exact Jaccard, MinHash-estimate-vs-exact
  * calibration on fixed pairs, and SimHash with Hamming distances.
  */
object DedupQueries {

  val queries: Map[String, Q] = Map(

    // Exact dedup: md5 fingerprint groups — keep lowest doc_id,
    // count members (the hash-groupBy scale pattern).
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("fp", Dedup.exactFingerprint(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
             count(lit(1)).as("n_copies"))),

    // MinHash + LSH banding: per-doc band hashes (the shuffle key of
    // web-scale near-dup dedup). Output is the exploded band table.
    "dedup_minhash_bands" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
        .withColumn("sig", Dedup.minhashSignature(array_distinct(col("toks"))))
        .select(col("doc_id"),
                explode(Dedup.bandHashes(col("sig"))).as("bh"))
        .select(col("doc_id"), col("bh.band").as("band"),
                col("bh.band_hash").as("band_hash"))),

    // LSH candidate pairs: docs sharing ≥1 band bucket, verified with
    // exact token-set Jaccard (only pairs ≥ 0.2 are near-dup
    // candidates worth emitting).
    "dedup_lsh_pairs" -> ((s, dir) => {
      // Cache the signature pass: the self-join would otherwise
      // recompute the whole minhash pipeline for each side. At cluster
      // scale this is the classic two-phase topology — one O(n)
      // signature job materialized, then a shuffle keyed on the band
      // slice that only moves ids + signatures, never documents.
      //
      // Two scale choices vs the naive bands-join-distinct:
      // (1) the join key is the RAW 4-long signature slice (band,
      //     k0..k3) — no md5 band strings on the shuffle (narrower
      //     rows, primitive-equality codegen join);
      // (2) a pair that matches in several bands is emitted only from
      //     its FIRST matching band (a per-row filter over the carried
      //     signatures) — candidate uniqueness by construction,
      //     replacing a global distinct() shuffle of ~2× the candidate
      //     count (measured 7 s of an 11 s total at sf0.1).
      val sigs = Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(col("doc_id"),
          Dedup.minhashSignature(array_distinct(col("toks"))).as("sig"))
        .persist()
      def side(n: String) = {
        val cols = (0 until Dedup.RowsPerBand).map(i =>
          element_at(col(s"sig_$n"), col("band") * Dedup.RowsPerBand + i + 1).as(s"k$i"))
        sigs.select(col("doc_id").as(n), col("sig").as(s"sig_$n"),
            explode(sequence(lit(0), lit(Dedup.NumBands - 1))).as("band"))
          .select(Seq(col(n), col(s"sig_$n"), col("band")) ++ cols: _*)
      }
      val keys = Seq("band") ++ (0 until Dedup.RowsPerBand).map(i => s"k$i")
      // sequence(0, band) is always ascending; the bp < band guard
      // (And short-circuits in codegen) restricts to strictly earlier
      // bands, so band = 0 yields no candidates to test.
      val earlierMatch = size(filter(
        sequence(lit(0), col("band")),
        bp => bp < col("band") && (0 until Dedup.RowsPerBand).map(i =>
          element_at(col("sig_doc_a"), bp * Dedup.RowsPerBand + i + 1) ===
            element_at(col("sig_doc_b"), bp * Dedup.RowsPerBand + i + 1))
          .reduce(_ && _))) > 0
      val cand = side("doc_a").join(side("doc_b"), keys)
        .filter(col("doc_a") < col("doc_b"))
        .filter(!earlierMatch)
        .select("doc_a", "doc_b")
      // Verify on DISTINCT 31-bit token-hash sets, not strings: the
      // md5 route hashes identically in the oracle, so the Jaccard
      // values agree bit-for-bit, and intersecting long arrays is ~4×
      // cheaper than hashing strings per candidate pair — this is the
      // per-pair hot loop (millions of candidates at scale).
      // SHUFFLE joins on the doc ids, never broadcast: the token-set
      // table IS the corpus — at 100 TB broadcasting it (on either
      // side, let alone both) is an executor OOM by construction. The
      // candidate table is the one that could be broadcast when small,
      // but its size is data-dependent (grows with near-dup density),
      // so leave both sides to the shuffle planner / AQE.
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          array_distinct(transform(TextOps.tokens(col("text")),
            t => graft.text.TextOps.tokenHash31(t))).as("tokset"))
        .persist()
      cand
        .join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("tokset", "set_a"), "doc_a")
        .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("tokset", "set_b"), "doc_b")
        .withColumn("jac", Dedup.jaccard(col("set_a"), col("set_b")))
        .filter(col("jac") >= 0.2)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard_r"))
    }),

    // MinHash estimate vs exact Jaccard on fixed consecutive pairs —
    // the estimator-calibration query (and the n-gram-Jaccard scorer).
    "dedup_jaccard_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("tokset", array_distinct(TextOps.tokens(col("text"))))
        .withColumn("sig", Dedup.minhashSignature(col("tokset")))
        .select(col("doc_id"), col("tokset"), col("sig"))
      val a = docs.select(col("doc_id").as("doc_a"), col("tokset").as("set_a"), col("sig").as("sig_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("tokset").as("set_b"), col("sig").as("sig_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1)
        .select(col("doc_a"), col("doc_b"),
          round(Dedup.jaccard(col("set_a"), col("set_b")), 6).as("jaccard_r"),
          Dedup.minhashEstimate(col("sig_a"), col("sig_b")).as("minhash_est"))
    }),

    // SimHash near-dup: 32-bit simhash per doc + Hamming distance to
    // the next doc (pairing fixed for determinism).
    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("simhash", Dedup.simhash(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("simhash"))
      val nxt = docs.select(col("doc_id").as("next_id"), col("simhash").as("next_sh"))
      docs.join(nxt, col("next_id") === col("doc_id") + 1, "left")
        .select(col("doc_id"), col("simhash"),
          when(col("next_sh").isNotNull, Dedup.hamming(col("simhash"), col("next_sh")))
            .as("hamming_next"))
    })
  )

  // ---- DuckDB twins ---------------------------------------------------

  private val h31 = "CAST(concat('0x', substr(md5(%s), 1, 14)) AS BIGINT) %% 2147483647"

  private def sigCte(tokExpr: String): String =
    s"""list_transform(generate_series(0, 15), j ->
       |  list_min(list_transform($tokExpr, s ->
       |    ((2*j + 1) * (${h31.format("s")}) + j*12345 + 7) % 2147483647)))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash_bands" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |)
         |SELECT doc_id, CAST(b AS BIGINT) AS band,
         |  md5(array_to_string(list_transform(sig[b*4 + 1 : b*4 + 4], x -> CAST(x AS VARCHAR)), ',')) AS band_hash
         |FROM sigs, generate_series(0, 3) t(b)""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH sigs AS (
         |  SELECT doc_id, ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |), bands AS (
         |  SELECT doc_id, b,
         |    md5(array_to_string(list_transform(sig[b*4 + 1 : b*4 + 4], x -> CAST(x AS VARCHAR)), ',')) AS band_hash
         |  FROM sigs, generate_series(0, 3) t(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.band_hash = b.band_hash
         |  WHERE a.doc_id < b.doc_id
         |), toksets AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(string_split(text, ' '), s ->
         |      ${h31.format("s")})) AS tokset
         |  FROM documents
         |)
         |SELECT doc_a, doc_b, round(jac, 6) AS jaccard_r FROM (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(ta.tokset, tb.tokset)) /
         |      CAST(len(list_distinct(list_concat(ta.tokset, tb.tokset))) AS DOUBLE) AS jac
         |  FROM cand
         |  JOIN toksets ta ON ta.doc_id = doc_a
         |  JOIN toksets tb ON tb.doc_id = doc_b
         |) WHERE jac >= 0.2""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    list_distinct(string_split(text, ' ')) AS tokset,
         |    ${sigCte("list_distinct(string_split(text, ' '))")} AS sig
         |  FROM documents
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.tokset, b.tokset)) /
         |    CAST(len(list_distinct(list_concat(a.tokset, b.tokset))) AS DOUBLE), 6) AS jaccard_r,
         |  CAST(len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) AS BIGINT) / 16.0 AS minhash_est
         |FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1""".stripMargin,

    "dedup_simhash" ->
      s"""WITH hashes AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ' '), t -> ${h31.format("t")}) AS th
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(0, 31), b ->
         |      CASE WHEN list_sum(list_transform(th, h ->
         |          ((h // CAST(power(2, b) AS BIGINT)) % 2) * 2 - 1)) > 0
         |        THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |  FROM hashes
         |)
         |SELECT a.doc_id, a.simhash,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming_next
         |FROM sh a LEFT JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin
  )
}
