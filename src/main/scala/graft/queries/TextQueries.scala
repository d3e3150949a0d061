package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.text.TextOps
import graft.operators.GlobalOrder

/** Text-analysis extension operators over `documents` (SURVEY.md
  * §2.9): token statistics, quality scoring, language-ID heuristic,
  * token frequency (generator/explode path), and order-sensitive
  * document fingerprinting. All single-pass narrow projections +
  * one partial-aggregable shuffle where grouped.
  */
object TextQueries {

  /** Sliding-window chunk geometry for `text_chunk`: window of
    * ChunkSize chars advancing by ChunkStride (overlap = Size−Stride)
    * — the standard RAG / context-prep shape. Fixture docs are 48-553
    * chars, so every doc yields 1-7 chunks and both the overlap and
    * the short-tail cases are exercised.
    */
  private val ChunkSize = 120
  private val ChunkStride = 90

  /** `text_quality_lr` Newton-step budget (bounded like the
    * Lloyd/CC/PageRank loops; β trajectory is 9-dp-quantized at each
    * round boundary so N chained rounds stay engine-identical).
    */
  private val LrRounds = 2

  /** `text_normalize`'s mojibake-repair table — the
    * UTF-8-read-as-cp1252 double-encoding class (bytes of é = C3 A9
    * redisplayed as 'Ã©', of U+2019 = E2 80 99 as 'â€™'). Fixed and
    * ordered; both engines fold it into the SAME chain of plain
    * (non-regex) replaces, so the repair is engine-identical by
    * construction. Escapes, not raw glyphs, so no editor/encoding
    * round-trip can silently corrupt the table.
    */
  private val MojibakeRepairs: Seq[(String, String)] = Seq(
    "\u00C3\u00A9" -> "\u00E9", // 'A-tilde, copyright' -> e-acute
    "\u00C3\u00A8" -> "\u00E8", // -> e-grave
    "\u00C3\u00B1" -> "\u00F1", // -> n-tilde
    "\u00C3\u00BC" -> "\u00FC", // -> u-umlaut
    "\u00E2\u20AC\u0153" -> "\u201C", // 'a-circ, euro, oe' -> left dquote
    "\u00E2\u20AC\u2122" -> "\u2019") // 'a-circ, euro, tm' -> right squote

  /** Planted positives for `text_normalize` (the text_c4_filters
    * device: the fixture corpus is clean ASCII, so deterministic
    * doc_id-keyed suffixes give both rules real positive AND negative
    * rows on BOTH engines): every repair-table entry once, and an
    * NFD-decomposed 'deja' (e/a + combining accents U+0301/U+0300)
    * that only NFC composition fixes.
    */
  private val MojiSuffix =
    " caf\u00C3\u00A9 ni\u00C3\u00B1o cr\u00C3\u00A8me \u00C3\u00BCber" +
    " \u00E2\u20AC\u0153mojibake\u00E2\u20AC\u2122"
  private val NfdSuffix = " de\u0301ja\u0300 vu"

  /** DuckDB single-quoted literal of a Scala constant \u2014 the oracle
    * interpolates the SAME strings the Spark side folds, so the two
    * repair chains cannot drift.
    */
  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  /** The repair chain as nested DuckDB replace()s, folded in the
    * identical order as the Spark side.
    */
  private def mojibakeRepairSql = MojibakeRepairs.foldLeft("raw") {
    case (e, (bad, good)) => s"replace($e, ${sqlLit(bad)}, ${sqlLit(good)})"
  }

  /** The per-doc `needs_normalize` flag — text_normalize's detection
    * projection (planted suffixes + repair chain + NFC check) shared
    * with pipeline_select_v2's flag set. Map-only, zero exchanges.
    */
  private[queries] def normalizeFlags(s: org.apache.spark.sql.SparkSession,
                                      dir: String) = {
    val aug = concat(col("text"),
      when(col("doc_id") % 5 === 0, lit(MojiSuffix)).otherwise(lit("")),
      when(col("doc_id") % 4 === 0, lit(NfdSuffix)).otherwise(lit("")))
    Tables.documents(s, dir)
      .select(col("doc_id"), aug.as("raw"))
      .withColumn("repaired", MojibakeRepairs.foldLeft(col("raw")) {
        case (c, (bad, good)) => replace(c, lit(bad), lit(good))
      })
      .select(col("doc_id"),
        (col("repaired") =!= col("raw") ||
          graft.functions.NfcNormalize(col("repaired")) =!= col("repaired"))
          .as("needs_normalize"))
  }

  /** The SQL twin of [[normalizeFlags]] as one `nrm` CTE (same Scala
    * constants, same fold), for oracles that join the flag.
    */
  private[queries] def normalizeFlagsCte: String =
    // NOTE: this string is INTERPOLATED into other oracles' stripMargin
    // templates, so no line may begin with '|' (a leading concat '||'
    // would lose a pipe to the consumer's stripMargin — caught r16);
    // concat operators stay at line ends.
    s"""nrm AS (
       |  SELECT doc_id,
       |    (repaired <> raw OR nfc_normalize(repaired) <> repaired)
       |      AS needs_normalize
       |  FROM (
       |    SELECT doc_id, raw, $mojibakeRepairSql AS repaired
       |    FROM (
       |      SELECT doc_id, text ||
       |        CASE WHEN doc_id % 5 = 0 THEN ${sqlLit(MojiSuffix)} ELSE '' END ||
       |        CASE WHEN doc_id % 4 = 0 THEN ${sqlLit(NfdSuffix)} ELSE '' END
       |          AS raw
       |      FROM documents
       |    )
       |  )
       |)""".stripMargin

  /** `text_quality_lr_cv` fold count (md5-mod doc sharding). */
  private val LrCvFolds = 3L

  /** 12-dp term quantization for per-row transcendental contributions
    * (the bigram-LM convention): round, then exact decimal sum.
    */
  private def q12(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c, 12).cast("decimal(38,12)")

  /** `text_quality_lr` design matrix. Label: the rule-based quality
    * gate (text_quality's composite ≥ 0.6 — the pipeline_select
    * threshold), i.e. the classifier is DISTILLING the heuristic
    * filter into a 2-feature model (the fastText-on-heuristic-labels
    * pattern: the rules are slow/brittle at serving, the distilled
    * model is one dot product). Features deliberately overlap the
    * rule inputs only partially — x1 = 'the'-marker rate per 10
    * tokens, x2 = token count /100 — so the fit is informative
    * (≈0.94 train accuracy vs 0.50 base rate on the fixture), not
    * separable. Both features are exact integer-count IEEE
    * divisions. private[graft]: LrSpec re-derives margins from it.
    */
  /** The text_quality projection, parameterized by the docs frame so
    * the streaming twin can score each arriving micro-batch.
    */
  private[graft] def qualityOf(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"),
        let1(TextOps.tokens(col("text"))) { t =>
          let1(struct(
              size(t).cast("long").as("n_tokens"),
              size(array_distinct(t)).cast("long").as("n_distinct"),
              (TextOps.tokenCount(t, "the") + TextOps.tokenCount(t, "a")).as("n_stop"),
              length(col("text")).cast("long").as("n_chars"))) { st =>
            val nTok = st.getField("n_tokens")
            val ttr = st.getField("n_distinct") / nTok
            val stopRatio = st.getField("n_stop") / nTok
            val meanLen = (st.getField("n_chars") - (nTok - 1)) / nTok
            struct(
              round(ttr, 6).as("ttr"),
              round(stopRatio, 6).as("stop_ratio"),
              // 9-dp double round (off any 6-dp half boundary), then a
              // DECIMAL 6-dp round whose half-up tie semantics agree on
              // both engines — round-on-DOUBLE tie behavior diverged on
              // one sf0.1 doc sitting exactly on x.xxxxx5 (r13)
              round(round(ttr * 0.4 + (lit(1.0) - stopRatio) * 0.3 +
                    least(meanLen / 10.0, lit(1.0)) * 0.3, 9)
                  .cast("decimal(18,9)"), 6)
                .cast("double").as("quality"))
          }
        }.as("q"))
      .select(col("doc_id"), col("q.ttr").as("ttr"),
              col("q.stop_ratio").as("stop_ratio"),
              col("q.quality").as("quality"))

  /** The per-doc add-1 bigram-LM score table — `text_bigram_lm`'s
    * output, materialized once per (session, dir) through the
    * Artifacts memo and read by both the LM report and
    * `pipeline_ccnet_buckets`' bucket cut (VERDICT r17 item 8: a
    * curation pipeline scores the corpus once; the bucket stage reads
    * the stored score table, it does not re-train the LM).
    */
  private[graft] def bigramLmScores(s: org.apache.spark.sql.SparkSession,
                                    dir: String): org.apache.spark.sql.DataFrame =
    Artifacts.materialized(s, dir, "bigram_lm_scores") {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val bi = toks
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2), " +
          "i -> struct(element_at(t, i + 1) AS w1, element_at(t, i + 2) AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = toks.select(explode(col("t")).as("w")).distinct()
        .agg(count(lit(1)).as("v"))
      bi
        .join(c12, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .withColumn("lp", round(log(
          (col("c12") + lit(1L)).cast("double") /
          (col("c1") + col("v")).cast("double")), 9).cast("decimal(28,9)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("slp").cast("double") / col("n_bigrams"), 6)
            .as("avg_logprob_r"))
    }

  private[graft] def lrFeaturesOf(docs: org.apache.spark.sql.DataFrame) = {
    // r17 (guide §2.4 — remove shuffles outright): the label and the
    // features both derive from ONE tokenization of the same row, so
    // compute them in a single projection. The previous shape ran
    // qualityOf(docs) and a second tokenizing branch and re-JOINED
    // them on doc_id — a per-row double tokenize plus a shuffle join
    // that the streaming twin paid once per micro-batch per epoch
    // (9 evaluations in stream_quality_lr's replay). Expressions are
    // verbatim qualityOf's quality chain + the old feature columns —
    // same values (oracle-pinned at 3 SFs).
    docs.select(
      col("doc_id"),
      let1(TextOps.tokens(col("text"))) { t =>
        let1(struct(
            size(t).cast("long").as("n_tokens"),
            size(array_distinct(t)).cast("long").as("n_distinct"),
            TextOps.tokenCount(t, "the").as("n_the"),
            (TextOps.tokenCount(t, "the") + TextOps.tokenCount(t, "a")).as("n_stop"),
            length(col("text")).cast("long").as("n_chars"))) { st =>
          val nTok = st.getField("n_tokens")
          val ttr = st.getField("n_distinct") / nTok
          val stopRatio = st.getField("n_stop") / nTok
          val meanLen = (st.getField("n_chars") - (nTok - 1)) / nTok
          val quality = round(round(ttr * 0.4 + (lit(1.0) - stopRatio) * 0.3 +
                least(meanLen / 10.0, lit(1.0)) * 0.3, 9)
              .cast("decimal(18,9)"), 6).cast("double")
          struct(
            when(quality >= 0.6, lit(1)).otherwise(lit(0))
              .cast("decimal(1,0)").as("y"),
            round((st.getField("n_the") * lit(10L)).cast("double")
                / st.getField("n_tokens"), 6).cast("decimal(8,6)").as("x1q"),
            (st.getField("n_tokens").cast("decimal(6,0)")
              * lit(new java.math.BigDecimal("0.01")).cast("decimal(3,2)"))
              .as("x2q"))
        }
      }.as("f"))
      .select(col("doc_id"), col("f.y").as("y"),
              col("f.x1q").as("x1q"), col("f.x2q").as("x2q"))
  }

  private[graft] def lrFeatures(s: org.apache.spark.sql.SparkSession, dir: String) =
    lrFeaturesOf(Tables.documents(s, dir))

  /** Per-occurrence (doc, label, token) rows — the multinomial NB
    * training/scoring input (same quality-gate label as the LR).
    */
  private[graft] def lrLabeledTokens(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val label = qualityOf(Tables.documents(s, dir))
      .select(col("doc_id"), (col("quality") >= 0.6).as("pos"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .join(label, "doc_id")
      .select(col("doc_id"),
        when(col("pos"), 1L).otherwise(0L).as("y"), col("tok"))
  }

  /** One Newton/IRLS step: β → β + (XᵀWX)⁻¹ Xᵀ(y − p). The corpus
    * pass is ONE hash agg of 9 mergeable decimal sums (3 gradient +
    * 6 Hessian cells). The ONLY float quantization per row is the
    * sigmoid itself (p → 9-dp decimal): every gradient/Hessian term
    * is then an EXACT decimal product of exact decimals (x1q/x2q are
    * exact-decimal features; w = p_q(1−p_q) is recast to 9 dp from an
    * exact-decimal input, which both engines round identically), so
    * no per-term value can sit near a float rounding boundary — the
    * hazard a first 12-dp-per-term draft measurably had (a round-2
    * term landed 1.7e-18 from its boundary; LrSpec now pins p's much
    * wider 9-dp margins instead). The 3×3 solve is a fixed-order
    * cofactor projection on the 1-row frame; the new β is
    * 9-dp-requantized (the kmeans_train round-boundary convention) so
    * the chained trajectory is engine-identical.
    */
  /** Per-row sigmoid chain at a frozen β: x as doubles, z, p, the
    * 9-dp p quantization, and the exact-decimal ymp/w9 derived cols.
    */
  private def lrRowChain(featsXbeta: org.apache.spark.sql.DataFrame) =
    featsXbeta
      .withColumn("x1", col("x1q").cast("double"))
      .withColumn("x2", col("x2q").cast("double"))
      .withColumn("z", (col("b0") + col("b1") * col("x1")) + col("b2") * col("x2"))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
      .withColumn("pq", round(col("p"), 9).cast("decimal(11,9)"))
      .withColumn("ymp", col("y") - col("pq"))
      // round() BEFORE the narrowing cast: Spark's decimal cast rounds
      // HALF_UP but DuckDB's truncates toward zero — a bare CAST made
      // half the w9 values differ by 1e-9 between engines (caught when
      // a CV fold's β crossed a 6-dp boundary); both engines' round()
      // on an exact decimal input agree, ties included
      .withColumn("w9",
        round(col("pq") * (lit(1).cast("decimal(10,9)") - col("pq")), 9)
          .cast("decimal(11,9)"))

  /** The mergeable half of a Newton round: 9 exact decimal sums per
    * frozen β — per-micro-batch partial rows sum-merged per β equal
    * the one-pass aggregation exactly (`stream_quality_lr`'s claim).
    */
  private[graft] def lrPartials(feats: org.apache.spark.sql.DataFrame,
                                beta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lrRowChain(feats.crossJoin(broadcast(beta)))
      .groupBy(col("b0"), col("b1"), col("b2")).agg(
        sum(col("ymp")).as("g0"),
        sum(col("x1q") * col("ymp")).as("g1"),
        sum(col("x2q") * col("ymp")).as("g2"),
        sum(col("w9")).as("h00"),
        sum(col("x1q") * col("w9")).as("h01"),
        sum(col("x2q") * col("w9")).as("h02"),
        sum((col("x1q") * col("x1q")) * col("w9")).as("h11"),
        sum((col("x1q") * col("x2q")) * col("w9")).as("h12"),
        sum((col("x2q") * col("x2q")) * col("w9")).as("h22"))

  /** [[lrPartials]] keyed by an extra worker/shard column — one
    * 9-sum partial row PER SHARD at the frozen β (the federated
    * worker gradients `stream_quality_lr` merges). Same row chain,
    * same exact-decimal sums; merging the per-shard rows by decimal
    * SUM equals [[lrPartials]]' one-pass aggregation bit-for-bit
    * (decimal addition is associative and commutative).
    */
  private[graft] def lrPartialsBy(feats: org.apache.spark.sql.DataFrame,
                                  beta: org.apache.spark.sql.DataFrame,
                                  key: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    lrRowChain(feats.crossJoin(broadcast(beta)))
      .groupBy(key, col("b0"), col("b1"), col("b2")).agg(
        sum(col("ymp")).as("g0"),
        sum(col("x1q") * col("ymp")).as("g1"),
        sum(col("x2q") * col("ymp")).as("g2"),
        sum(col("w9")).as("h00"),
        sum(col("x1q") * col("w9")).as("h01"),
        sum(col("x2q") * col("w9")).as("h02"),
        sum((col("x1q") * col("x1q")) * col("w9")).as("h11"),
        sum((col("x1q") * col("x2q")) * col("w9")).as("h12"),
        sum((col("x2q") * col("x2q")) * col("w9")).as("h22"))

  /** [[lrScorePartials]] keyed by an extra worker/shard column — the
    * additive scoring partials per shard (same merge argument as
    * [[lrPartialsBy]]).
    */
  private[graft] def lrScorePartialsBy(feats: org.apache.spark.sql.DataFrame,
                                       beta: org.apache.spark.sql.DataFrame,
                                       key: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    lrRowChain(feats.crossJoin(broadcast(beta)))
      .groupBy(key, col("b0"), col("b1"), col("b2")).agg(
        count(lit(1)).as("n_c"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("np"),
        sum(q12(when(col("y") === 1, log(col("p")))
          .otherwise(log(lit(1.0) - col("p"))))).as("lls"),
        sum(when((col("z") > 0) === (col("y") === 1), 1L).otherwise(0L))
          .as("accs"))

  /** The 3×3 cofactor solve on the 1-row aggregated frame → new β. */
  private[graft] def lrSolve(a: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = Seq("g0", "g1", "g2", "h00", "h01", "h02", "h11", "h12", "h22")
      .foldLeft(a)((df, c) => df.withColumn(c, col(c).cast("double")))
      .withColumn("c00", col("h11") * col("h22") - col("h12") * col("h12"))
      .withColumn("c01", col("h02") * col("h12") - col("h01") * col("h22"))
      .withColumn("c02", col("h01") * col("h12") - col("h02") * col("h11"))
      .withColumn("c11", col("h00") * col("h22") - col("h02") * col("h02"))
      .withColumn("c12", col("h01") * col("h02") - col("h00") * col("h12"))
      .withColumn("c22", col("h00") * col("h11") - col("h01") * col("h01"))
      .withColumn("det",
        col("h00") * col("c00") + col("h01") * col("c01") + col("h02") * col("c02"))
    d.select(
      round(col("b0") + (col("c00") * col("g0") + col("c01") * col("g1")
        + col("c02") * col("g2")) / col("det"), 9).as("b0"),
      round(col("b1") + (col("c01") * col("g0") + col("c11") * col("g1")
        + col("c12") * col("g2")) / col("det"), 9).as("b1"),
      round(col("b2") + (col("c02") * col("g0") + col("c12") * col("g1")
        + col("c22") * col("g2")) / col("det"), 9).as("b2"))
      .localCheckpoint()
  }

  private[graft] def lrStep(feats: org.apache.spark.sql.DataFrame,
                            beta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lrSolve(lrPartials(feats, beta))

  /** The mergeable half of the scoring pass at a frozen β: counts,
    * the 12-dp-quantized log-loss decimal sum, and the correct-
    * prediction count — all additive, so per-micro-batch partials
    * merged per β equal the one-pass scoring aggregation.
    */
  private[graft] def lrScorePartials(feats: org.apache.spark.sql.DataFrame,
                                     beta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lrRowChain(feats.crossJoin(broadcast(beta)))
      .groupBy(col("b0"), col("b1"), col("b2")).agg(
        count(lit(1)).as("n_c"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("np"),
        sum(q12(when(col("y") === 1, log(col("p")))
          .otherwise(log(lit(1.0) - col("p"))))).as("lls"),
        sum(when((col("z") > 0) === (col("y") === 1), 1L).otherwise(0L))
          .as("accs"))

  private[graft] def lrScoreFinish(sc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sc.select(
      col("n_c").as("n"),
      col("np").as("n_pos"),
      round(col("b0"), 6).as("b0_r"),
      round(col("b1"), 6).as("b1_r"),
      round(col("b2"), 6).as("b2_r"),
      round(-col("lls").cast("double") / col("n_c"), 6).as("ll_r"),
      round(col("accs").cast("double") / col("n_c"), 6).as("acc_r"))

  /** Reliability diagram at a frozen β: p-decile buckets → (count,
    * 12-dp-quantized mean predicted p, observed positive rate).
    */
  private[graft] def lrCalibration(feats: org.apache.spark.sql.DataFrame,
                                   beta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lrRowChain(feats.crossJoin(broadcast(beta)))
      .withColumn("bucket",
        least(floor(col("p") * 10).cast("long"), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"),
           sum(q12(col("p"))).as("ps"),
           sum(when(col("y") === 1, 1L).otherwise(0L)).as("pos"))
      .select(col("bucket"), col("n_b"),
        round(col("ps").cast("double") / col("n_b"), 6).as("avg_p_r"),
        round(col("pos").cast("double") / col("n_b"), 6).as("pos_rate_r"))

  /** Murphy (Brier-score) decomposition over the SAME decile bucket
    * state [[lrCalibration]] reads, widened with Σp² and Σp·y — the
    * third reading on the quality classifier's scoring pass:
    * brier = (Σp² − 2Σ_{y=1}p + #pos)/N exactly (the algebraic
    * expansion of (p − y)², so no per-row residual column is needed),
    * reliability = Σ n_b(p̄_b − ō_b)²/N, resolution = Σ n_b(ō_b − ō)²/N,
    * uncertainty = ō(1 − ō). p is 12-dp-quantized to DECIMAL(14,12)
    * (so p² is an EXACT scale-24 decimal on both engines — squaring
    * the house (38,12) type would silently lose scale under Spark's
    * precision-loss rule); the per-bucket decomposition terms are
    * 9-dp-quantized before the 10-term sum, and the final arithmetic
    * is fixed-order IEEE on identical exact-decimal casts.
    */
  private[graft] def lrBrier(feats: org.apache.spark.sql.DataFrame,
                             beta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cells = lrRowChain(feats.crossJoin(broadcast(beta)))
      .withColumn("bucket",
        least(floor(col("p") * 10).cast("long"), lit(9L)))
      .withColumn("pq", round(col("p"), 12).cast("decimal(14,12)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"),
        sum(col("pq")).as("ps"),
        sum(col("pq") * col("pq")).as("ps2"),
        sum(when(col("y") === 1, col("pq"))
          .otherwise(lit(0).cast("decimal(14,12)"))).as("pspos"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("pos"))
    val tot = cells.agg(sum(col("n_b")).as("n"), sum(col("pos")).as("pos_t"),
      sum(col("ps2")).as("ps2_t"), sum(col("pspos")).as("pspos_t"))
    val terms = cells.crossJoin(broadcast(tot))
      .withColumn("pb", asDouble(col("ps")) / col("n_b").cast("double"))
      .withColumn("ob", col("pos").cast("double") / col("n_b").cast("double"))
      .withColumn("obar", col("pos_t").cast("double") / col("n").cast("double"))
      .withColumn("rel_t",
        round(col("n_b").cast("double")
          * (col("pb") - col("ob")) * (col("pb") - col("ob")), 9)
          .cast("decimal(24,9)"))
      .withColumn("res_t",
        round(col("n_b").cast("double")
          * (col("ob") - col("obar")) * (col("ob") - col("obar")), 9)
          .cast("decimal(24,9)"))
    terms
      .agg(max(col("n")).as("n"), max(col("pos_t")).as("pos_t"),
        max(col("ps2_t")).as("ps2_t"), max(col("pspos_t")).as("pspos_t"),
        sum(col("rel_t")).as("rel_s"), sum(col("res_t")).as("res_s"))
      .withColumn("obar", col("pos_t").cast("double") / col("n").cast("double"))
      .select(col("n"),
        round((asDouble(col("ps2_t")) - lit(2.0) * asDouble(col("pspos_t"))
          + col("pos_t").cast("double")) / col("n").cast("double"), 6)
          .as("brier_r"),
        round(asDouble(col("rel_s")) / col("n").cast("double"), 6)
          .as("reliability_r"),
        round(asDouble(col("res_s")) / col("n").cast("double"), 6)
          .as("resolution_r"),
        round(col("obar") * (lit(1.0) - col("obar")), 6)
          .as("uncertainty_r"))
  }

  /** Absolute discount for `text_kneser_ney` (the standard 0.75). */
  private val KnDiscount = 0.75

  /** Ceiling below which PLAIN lineage stays sane for a bounded-round
    * text chain (recompute breadth ~2^rounds before ReuseExchange).
    * text_bpe_train/text_bpe_encode guard their 3-round plain chains
    * on it. Deeper trainers do NOT graduate to a corpus-sized
    * checkpoint cadence — the r17 probe showed even one corpus-sized
    * localCheckpoint draws the r16 stall band (a fresh-JVM rep paid
    * 101 s on a single cadence write; BENCH_NOTES r17). They shrink
    * state instead: train on the distinct-word count table and
    * checkpoint THAT per round (vocab-sized — the CC/BFS frame class,
    * probed clean), as text_bpe_train10 does.
    */
  private[queries] val BpeCheckpointEvery = 5

  /** 10 distinct single-char merge placeholders for the many-round
    * trainer — all outside the fixture corpus's [a-z0-9 ] alphabet
    * (so merges never collide with real text), all ASCII (binary
    * collation ties order identically on both engines).
    */
  private val Bpe10Placeholders =
    Seq("#", "@", "~", "^", "*", "+", "=", "<", ">", "/")

  /** The mergeable half of `text_kneser_ney`: per-(w1,w2) bigram
    * counts — additive, so per-micro-batch partials re-summed per
    * bigram equal the one-pass batch counts (`stream_kneser_ney`'s
    * hash proof). Crucially, EVERY other Kneser-Ney input (c1, the
    * continuation counts N1+(w1·), N1+(·w2), N1+(··)) is derivable
    * from the merged c12 table — c1 = Σ_w2 c12, N1+ = row counts —
    * so the non-additive-looking countDistinct state never needs to
    * be streamed at all.
    */
  private[graft] def knBigramCounts(docs: org.apache.spark.sql.DataFrame) =
    docs.select(TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), " +
        "i -> struct(element_at(t, i + 1) AS w1, element_at(t, i + 2) AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  /** Kneser-Ney finish over a merged (w1, w2, c12) table — see
    * `text_kneser_ney`'s scaladoc for the formula.
    */
  private[graft] def knFinish(c12In: org.apache.spark.sql.DataFrame) = {
    val c12 = c12In
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val right = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val nAll = c12.agg(count(lit(1)).as("n_all"))
    c12
      .join(left, "w1")
      .join(right, "w2")
      .crossJoin(broadcast(nAll))
      .withColumn("pkn_r", round(
        greatest(col("c12").cast("double") - lit(KnDiscount), lit(0.0))
          / col("c1").cast("double")
        + (lit(KnDiscount) * col("n1f").cast("double")
            / col("c1").cast("double"))
          * (col("n1b").cast("double") / col("n_all").cast("double")), 9))
      // distributed top-20 (TakeOrderedAndProject), then a TinyOrder
      // rank over the 20-row result — no unpartitioned window
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
      .transform(df => graft.operators.TinyOrder.rank(df, "rank",
        Seq(negate(col("c12")), col("w1"), col("w2"))))
      .select(col("rank"), col("w1"), col("w2"),
              col("c12"), col("c1").cast("long").as("c1"),
              col("n1f"), col("n1b"), col("pkn_r"))
  }

  val queries: Map[String, Q] = Map(

    // CCNET-STYLE PERPLEXITY BUCKETS — the curation split the CCNet
    // pipeline (Wenzek et al. 2020, public) made standard: score every
    // doc with the in-engine bigram LM (text_bigram_lm's avg log-prob
    // — higher = more fluent), rank, and cut the corpus into
    // head/middle/tail THIRDS; training recipes then mix buckets
    // deliberately (head-heavy pretraining, tail for diversity
    // ablations). The rank is a GlobalOrder row number over
    // (−score, doc_id) — no single-task sort at any corpus size — and
    // the thirds are integer boundary arithmetic (grn·3 vs n), exact
    // on both engines. Docs with < 2 tokens have no bigram score and
    // are out of scope (both engines drop them identically).
    "pipeline_ccnet_buckets" -> ((s, dir) => {
      // r18 (VERDICT r17 item 8, decided): the per-doc bigram-LM score
      // table is a cross-query materialized artifact (the Artifacts
      // posture dedup labels and ANN assignments already follow — a
      // curation pipeline scores the corpus once and both the LM
      // report and the bucket cut read that table). Declared in
      // OPTIMIZATION_r18.md's Artifacts list.
      val lm = bigramLmScores(s, dir)
        .select(col("doc_id"), col("avg_logprob_r"))
      val ranked = graft.operators.GlobalOrder.withRowNumber(lm, "grn",
        Seq(negate(col("avg_logprob_r")), col("doc_id")))
      val n = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .select(col("doc_id"), col("avg_logprob_r"),
          when(col("grn") * 3 <= col("n"), lit("head"))
            .when(col("grn") * 3 <= col("n") * 2, lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
    }),

    // N-GRAM NOVELTY / MEMORIZATION PROBE — what fraction of each
    // held-out doc's distinct bigrams NEVER appear in the train split
    // (the memorization-vs-generalization eval an LLM-data pipeline
    // runs on its own corpus before trusting held-out perplexity:
    // low novelty = the "held-out" set rehashes training text). The
    // 80/20 split is the domain-separated '#novel' md5 hash — a doc's
    // side is rerun-stable and partition-independent. Shape: one
    // bigram explode (the data-sized pass), a distinct hash agg for
    // the train gram set, one shuffle hash join on the gram key + a
    // per-doc count agg — all partial-aggregable, no windows. At
    // 100 TB the join key becomes a ShingleHashes 31-bit gram hash
    // (compact longs, same topology); strings are kept here for
    // oracle-parity clarity.
    // JENSEN-SHANNON DRIFT — distributional distance between the
    // token (unigram) distributions of a deterministic md5 corpus
    // split: the train-vs-val "did my two corpus slices come from the
    // same language distribution" gate (PSI/KS watch a VALUE column;
    // JSD watches the VOCABULARY — the drift axis that matters for
    // text). JSD = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, over the union
    // vocabulary; a token absent from one half contributes only its
    // present side (0·ln 0 = 0, guarded in both engines). Per-token
    // terms are 12-dp-quantized DECIMAL(28,12) before the
    // (order-sensitive) sum — the entropy_mi convention; the output
    // also reports JSD/ln 2 against the [0,1] bound (frozen ln 2
    // literal, libm-free). Shape: one token explode + one vocab hash
    // agg; the finish is one decimal sum — no windows, no driver math.
    "text_jsd_drift" -> ((s, dir) =>
      jsdFinish(jsdCells(Tables.documents(s, dir)))),

    // HEAPS'-LAW VOCABULARY GROWTH — V(T) ≈ K·T^β fitted over 10
    // deterministic corpus checkpoints (docs in md5 '#heaps' order):
    // the companion corpus law to text_zipf, and the planning number
    // a tokenizer/dedup budget needs (β near 1 ⇒ vocabulary still
    // exploding ⇒ more dedup headroom; β ≪ 1 ⇒ saturating). Each
    // token's FIRST-occurrence position is one min-agg; checkpoint
    // vocab sizes come from the position histogram (doc-count-sized,
    // 10-way replicated — never token-replicated); the doc order and
    // cumulative token axis run through GlobalOrder (row number +
    // two-phase prefix sum — no unpartitioned window); the ln-ln OLS
    // runs over 10 points with 9-dp-quantized logs and
    // 12-dp-quantized products (the entropy_mi convention). Output:
    // the 10 checkpoints with β and ln K attached as broadcast
    // scalars.
    "text_heaps_law" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit("#heaps"))).as("hk"),
          TextOps.tokens(col("text")).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
      val withRn = GlobalOrder.withRowNumber(base, "rn",
        Seq(col("hk"), col("doc_id")))
      val withCum = GlobalOrder.withPrefixSum(
        withRn.select(col("rn"), col("n_toks")),
        col("n_toks"), "cumtok", Seq(col("rn")))
      val cps = withCum.agg(max(col("rn")).as("nd"))
        .select(explode(sequence(lit(1), lit(10))).as("ki"), col("nd"))
        .select(col("ki").cast("long").as("k"),
          expr("CAST((nd * ki + 9) DIV 10 AS BIGINT)").as("dk"))
      val foh = withRn.select(col("rn"), explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(min(col("rn")).as("frn"))
        .groupBy(col("frn")).agg(count(lit(1)).as("cnt"))
      val pts = foh.crossJoin(broadcast(cps))
        .filter(col("frn") <= col("dk"))
        .groupBy(col("k"), col("dk")).agg(sum(col("cnt")).as("vocab"))
        .join(withCum.join(broadcast(cps), col("rn") === col("dk"))
          .select(col("k"), col("cumtok").as("tokens")), "k")
        .withColumn("x", round(log(col("tokens").cast("double")), 9))
        .withColumn("y", round(log(col("vocab").cast("double")), 9))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fit = pts.agg(count(lit(1)).as("np"),
        sum(col("x").cast("decimal(28,9)")).as("sx"),
        sum(col("y").cast("decimal(28,9)")).as("sy"),
        sum(round(col("x") * col("y"), 12).cast("decimal(28,12)")).as("sxy"),
        sum(round(col("x") * col("x"), 12).cast("decimal(28,12)")).as("sxx"))
      val beta = (asDouble(col("sxy")) -
          asDouble(col("sx")) * asDouble(col("sy")) / col("np").cast("double")) /
        (asDouble(col("sxx")) -
          asDouble(col("sx")) * asDouble(col("sx")) / col("np").cast("double"))
      val scalars = fit.select(round(beta, 6).as("beta_r"),
        round(asDouble(col("sy")) / col("np").cast("double") -
          beta * (asDouble(col("sx")) / col("np").cast("double")), 6)
          .as("lnk_r"))
      pts.select(col("k"), col("dk").as("docs"), col("tokens"), col("vocab"))
        .crossJoin(broadcast(scalars))
    }),

    "text_ngram_novelty" -> ((s, dir) =>
      novelFinish(novelBigrams(Tables.documents(s, dir)))),

    // LEXICAL DIVERSITY per source — corpus-level type-token ratio and
    // hapax-legomenon share, the vocabulary-health readout a curation
    // dashboard pairs with text_zipf/text_heaps_law (a source whose
    // TTR collapses is template spam; a hapax share near 1 is OCR
    // noise or ID soup — both are mixture red flags before training).
    // ONE additive (source, token) count agg (the twin's sum-merged
    // state, the jsdCells shape); the finish is a per-source hash agg
    // over the vocabulary-sized cell table — integer counts, two IEEE
    // divisions at the end.
    "text_lexical_diversity" -> ((s, dir) =>
      lexdivFinish(lexdivCells(Tables.documents(s, dir)))),

    // SIMPSON DIVERSITY — the concentration complement of
    // text_lexical_diversity's richness readings (TTR counts kinds;
    // Simpson weights by repetition — the probability two random
    // tokens from a source coincide, the events_hhi of vocabularies):
    // D = Σ nᵢ(nᵢ−1) / (N(N−1)) per source, inverse Simpson = the
    // effective vocabulary size. A SECOND finish on the same
    // (source, token, cnt) cells — exact DECIMAL(38,0) pair counts
    // (the ARI convention), one double division, no logarithm.
    "text_simpson_diversity" -> ((s, dir) =>
      simpsonFinish(lexdivCells(Tables.documents(s, dir)))),

    // BLEU-2 OVER CANDIDATE PAIRS — clipped n-gram precision scoring
    // on the LSH blocking pairs (the dedup chain's candidates): for
    // each (candidate = doc_a, reference = doc_b) edge, modified
    // unigram/bigram precision p_n = Σ_g min(c_a(g), c_b(g)) / Σ_g
    // c_a(g), brevity penalty min(1, e^(1−len_b/len_a)), BLEU-2 =
    // BP·√(p1·p2) — the surface-overlap score that separates
    // paraphrase-level near-dups from topical neighbors Jaccard
    // lumps together. Work is bounded by |edges|·doc-length (the
    // banding guarantee — never all-pairs); per-gram clipping is two
    // shuffle hash joins keyed (doc, gram) + one partial-aggregable
    // pair agg. Transcendental BP and the √ geometric mean are each
    // 9-dp-quantized BEFORE their product (1-ulp libm/JDK guard).
    "text_bleu_pairs" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val uni = toks.select(col("doc_id"), explode(col("t")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      val big = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2), " +
          "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
          .as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      val lens = toks.select(col("doc_id"), size(col("t")).cast("long").as("n"))
      val edges = DedupQueries.lshEdges(s, dir)
      def clipped(grams: org.apache.spark.sql.DataFrame,
                  mCol: String, tCol: String) =
        edges
          .join(grams.select(col("doc_id").as("doc_a"), col("g"),
            col("c").as("ca")), "doc_a")
          .join(grams.select(col("doc_id").as("doc_b"), col("g"),
            col("c").as("cb")), Seq("doc_b", "g"), "left")
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(sum(least(col("ca"), coalesce(col("cb"), lit(0L)))).as(mCol),
               sum(col("ca")).as(tCol))
      clipped(uni, "m1", "t1")
        .join(clipped(big, "m2", "t2"), Seq("doc_a", "doc_b"), "left")
        .join(lens.select(col("doc_id").as("doc_a"), col("n").as("len_a")),
          "doc_a")
        .join(lens.select(col("doc_id").as("doc_b"), col("n").as("len_b")),
          "doc_b")
        .withColumn("p1_d",
          col("m1").cast("double") / col("t1").cast("double"))
        .withColumn("p2_d", when(col("t2").isNotNull && col("t2") > 0,
          col("m2").cast("double") / col("t2").cast("double"))
          .otherwise(lit(0.0)))
        .withColumn("bp_q", round(
          when(col("len_a") >= col("len_b"), lit(1.0))
            .otherwise(exp(lit(1.0)
              - col("len_b").cast("double") / col("len_a").cast("double"))),
          9))
        .withColumn("g_q", round(sqrt(col("p1_d") * col("p2_d")), 9))
        .select(col("doc_a"), col("doc_b"),
          round(col("p1_d"), 6).as("p1_r"),
          round(col("p2_d"), 6).as("p2_r"),
          round(col("bp_q") * col("g_q"), 6).as("bleu2_r"))
    }),

    // ROUGE-2 OVER CANDIDATE PAIRS — the RECALL-oriented reading of
    // text_bleu_pairs' clipped-bigram state (BLEU asks "how much of
    // the candidate is in the reference", ROUGE asks the reverse —
    // summarization/dedup triage wants both): on the same LSH
    // blocking edges, recall = Σ_g min(c_a, c_b)/(len_b − 1),
    // precision ≡ BLEU's p2, F1 = their harmonic mean. The clipped
    // numerator and Σc_a denominator are the identical two-join
    // chain; the only new column is the reference length. Work stays
    // bounded by |edges|·doc-length (the banding guarantee).
    "text_rouge_pairs" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val big = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2), " +
          "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
          .as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      val lens = toks.select(col("doc_id"), size(col("t")).cast("long").as("n"))
      DedupQueries.lshEdges(s, dir)
        .join(big.select(col("doc_id").as("doc_a"), col("g"),
          col("c").as("ca")), "doc_a")
        .join(big.select(col("doc_id").as("doc_b"), col("g"),
          col("c").as("cb")), Seq("doc_b", "g"), "left")
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(least(col("ca"), coalesce(col("cb"), lit(0L)))).as("m2"),
             sum(col("ca")).as("t2"))
        .join(lens.select(col("doc_id").as("doc_b"), col("n").as("len_b")),
          "doc_b")
        .withColumn("prec_d", when(col("t2") > 0,
          asDouble(col("m2")) / asDouble(col("t2"))).otherwise(lit(0.0)))
        .withColumn("rec_d", when(col("len_b") > 1,
          asDouble(col("m2")) / asDouble(col("len_b") - 1)).otherwise(lit(0.0)))
        .select(col("doc_a"), col("doc_b"),
          round(col("prec_d"), 6).as("p2_r"),
          round(col("rec_d"), 6).as("rec2_r"),
          when(col("prec_d") + col("rec_d") > 0.0,
            round(lit(2.0) * col("prec_d") * col("rec_d")
              / (col("prec_d") + col("rec_d")), 6))
            .otherwise(lit(0.0)).as("f2_r"))
    }),

    // GOOD-TURING FREQUENCY ESTIMATES — the THIRD finish on
    // text_lexical_diversity's (source, token, cnt) cells (TTR/hapax
    // count kinds, Simpson weights repetition; Good-Turing asks what
    // the counts PREDICT): count-of-counts N_r for r = 1..5, the
    // smoothed estimate r* = (r+1)·N_{r+1}/N_r, and the missing-mass
    // estimate p₀ = N₁/N — the quantities Kneser-Ney discounting and
    // "how much vocabulary haven't we seen" coverage audits start
    // from. The r-grid is densified to 1..5 per source (the Benford
    // frozen-grid convention) so the row set is scale-stable; all
    // counts integer, two double divisions at the end.
    "text_good_turing" -> ((s, dir) =>
      goodTuringFinish(lexdivCells(Tables.documents(s, dir)))),

    // TOKEN BURSTINESS — which words arrive in bursts (topical) vs
    // uniformly (functional): per-token variance-to-mean over
    // per-doc counts, zeros included, top-30 by VMR. Exact
    // sufficient statistics; one partial-aggregable (token, doc)
    // pass.
    "text_burstiness" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val docTok = d.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      burstinessFinish(docTok, d.agg(count(lit(1)).as("n_docs")))
    }),

    // CHAO1 RICHNESS — the FOURTH finish on the same (source, token,
    // cnt) cells (TTR counts observed kinds; Chao1 estimates the
    // kinds NOT yet observed from the singleton/doubleton ratio —
    // the "how much more vocabulary would 10× more data surface"
    // answer next to Good-Turing's missing MASS p₀). Bias-corrected
    // V + f₁(f₁−1)/(2(f₂+1)); integer counts, one tie-safe division.
    "text_chao1" -> ((s, dir) =>
      chao1Finish(lexdivCells(Tables.documents(s, dir)))),

    // QUALITY-CLASSIFIER TRAINING — logistic regression distilling
    // the rule-based quality gate (y = text_quality ≥ 0.6) into a
    // 2-feature model, trained IN THE ENGINE by two unrolled
    // Newton/IRLS steps (≈0.94 train accuracy vs 0.50 base rate on
    // the fixture — informative, not separable). This is the
    // events_regression argument carried from closed-form to
    // ITERATIVE second-order optimization: each step's corpus pass is
    // one partial-aggregable hash agg of 9 decimal sums — the
    // gradient Xᵀ(y−p) and the Hessian XᵀWX ARE mergeable
    // aggregations, the 3×3 solve touches a 1-row frame, and the
    // state between rounds is three numbers. At 100 TB each training
    // round costs exactly one scan + one 9-column reduce (the
    // data-parallel/parameter-server shape); no per-row UDF, no
    // driver-side math, no gradient-descent hyperparameters.
    // Exactness: per-row sigmoid terms are 12-dp-quantized and
    // decimal-summed (the bigram-LM convention — LrSpec pins the
    // boundary margins ≫ the engines' exp ulp divergence), the
    // cofactor solve is fixed-order IEEE on identical sums, and β is
    // 9-dp-requantized per round so both engines walk an identical
    // trajectory. Output: coefficients + training log-loss +
    // accuracy off a final scoring pass.
    "text_quality_lr" -> ((s, dir) => {
      val feats = lrFeatures(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val beta0 = s.range(1).select(
        lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
      val betaF = (1 to LrRounds).foldLeft(beta0)((b, _) => lrStep(feats, b))
      lrScoreFinish(lrScorePartials(feats, betaF))
    }),

    // NAIVE BAYES — the GENERATIVE counterpart to text_quality_lr's
    // discriminative fit, and the other classical "training is an
    // aggregation" shape: the multinomial model IS one hash agg of
    // per-(token, class) occurrence counts (trivially mergeable — a
    // second corpus folds in by addition, the LM/sketch law), priors
    // are two numbers, and scoring is a posting join + per-doc decimal
    // sum of Laplace-smoothed log-likelihoods. Exactness: each
    // per-token log-prob ln((c+1)/(T+V)) is quantized ONCE at 9 dp
    // into the model table — the per-doc score is then an EXACT
    // decimal sum, so the argmax decision s₁ > s₀ is an exact decimal
    // comparison: unlike almost every scored operator here, the
    // decision boundary itself has NO float in it (NbSpec pins the
    // model-entry margins and the decision gaps). Trained and scored
    // in-sample on the quality gate like the LR, so the two
    // classifiers' accuracies are directly comparable.
    "text_quality_nb" -> ((s, dir) => {
      val toks = lrLabeledTokens(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docs = toks.select(col("doc_id"), col("y")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = toks.groupBy(col("tok"))
        .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("c1"),
             sum(when(col("y") === 0, 1L).otherwise(0L)).as("c0"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val consts = model.agg(
          sum(col("c1")).as("t1"), sum(col("c0")).as("t0"),
          count(lit(1)).as("v"))
        .crossJoin(docs.agg(
          sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0")))
        .select(col("t1"), col("t0"), col("v"), col("n1"), col("n0"),
          round(log(col("n1").cast("double")
            / (col("n1") + col("n0")).cast("double")), 9)
            .cast("decimal(18,9)").as("prior1"),
          round(log(col("n0").cast("double")
            / (col("n1") + col("n0")).cast("double")), 9)
            .cast("decimal(18,9)").as("prior0"))
      val lp = model.crossJoin(broadcast(consts))
        .select(col("tok"),
          round(log((col("c1") + 1).cast("double")
            / (col("t1") + col("v")).cast("double")), 9)
            .cast("decimal(18,9)").as("lp1"),
          round(log((col("c0") + 1).cast("double")
            / (col("t0") + col("v")).cast("double")), 9)
            .cast("decimal(18,9)").as("lp0"))
      val scored = toks.join(lp, "tok")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("lp1")).as("s1"), sum(col("lp0")).as("s0"))
        .crossJoin(broadcast(consts.select(col("prior1"), col("prior0"))))
        .withColumn("pred",
          when(col("s1") + col("prior1") > col("s0") + col("prior0"), 1L)
            .otherwise(0L))
      scored.agg(
        count(lit(1)).as("n"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        round(sum(when(col("pred") === col("y"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("acc_r"))
        .crossJoin(broadcast(consts.select(col("v").as("v_size"))))
        .select(col("n"), col("n_pos"), col("v_size"), col("acc_r"))
    }),

    // K-FOLD CROSS-VALIDATION — the held-out evaluation the training
    // op owes its accuracy claim: 3 md5-disjoint folds, each fold's
    // model trained on the OTHER two (the full 2-round Newton chain)
    // and scored only on the held-out fold. In-engine CV is just the
    // training machinery composed k times over filtered frames — each
    // fold costs 2 aggregation passes over ⅔ of the corpus + 1 over
    // ⅓, all partial-aggregable, and the folds' chains are
    // independent (a real deployment runs them concurrently). The
    // held-out accuracies (0.92-0.95 on the fixture) certifying the
    // in-sample 0.94 was not memorization is exactly what this query
    // exists to show.
    "text_quality_lr_cv" -> ((s, dir) => {
      val feats = lrFeatures(s, dir)
        .withColumn("fold",
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("#fold"))), 1, 14), 16, 10).cast("long") % LrCvFolds)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val beta0 = s.range(1).select(
        lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
      (0L until LrCvFolds).map { f =>
        val train = feats.filter(col("fold") =!= f)
        val test = feats.filter(col("fold") === f)
        val bf = (1 to LrRounds).foldLeft(beta0)((b, _) => lrStep(train, b))
        lrScoreFinish(lrScorePartials(test, bf))
          .select(lit(f).as("fold"), col("n").as("n_test"),
            col("b0_r"), col("b1_r"), col("b2_r"), col("ll_r"), col("acc_r"))
      }.reduce(_ unionByName _)
    }),

    // MODEL CALIBRATION — the reliability diagram for the distilled
    // quality classifier: p-decile buckets × (mean predicted p vs
    // observed positive rate). Deployment gates on calibration, not
    // just accuracy (a threshold chosen on p is only meaningful if p
    // means what it says); a well-calibrated model has avg_p ≈
    // pos_rate per bucket. One extra scoring-shaped pass at the final
    // β — a projection + one tiny hash agg, all partial-aggregable.
    // The decile cut uses floor(p·10), so LrSpec pins every p·10
    // clear of an integer boundary (the bucket must not flip on a
    // 1-ulp exp divergence).
    "text_quality_lr_calibration" -> ((s, dir) => {
      val feats = lrFeatures(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val beta0 = s.range(1).select(
        lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
      val betaF = (1 to LrRounds).foldLeft(beta0)((b, _) => lrStep(feats, b))
      lrCalibration(feats, betaF)
    }),

    // BRIER / MURPHY DECOMPOSITION — is the quality classifier's
    // probability OUTPUT trustworthy, split into the three readings
    // reviewers actually act on: reliability (calibration error —
    // retrain the calibrator), resolution (discrimination — the
    // model's real skill), uncertainty (the data's irreducible base
    // rate). A third finish on the lrCalibration scoring pass; see
    // lrBrier for the exact-decimal argument.
    "text_quality_brier" -> ((s, dir) => {
      val feats = lrFeatures(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val beta0 = s.range(1).select(
        lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
      val betaF = (1 to LrRounds).foldLeft(beta0)((b, _) => lrStep(feats, b))
      lrBrier(feats, betaF)
    }),

    // Document CHUNKING — the context-window prep step every RAG /
    // embedding / training pipeline runs before vectorizing or
    // packing: fixed-size character windows with overlap, emitted
    // with stable (doc_id, chunk_idx) identity so downstream
    // embedding and packing stages key on the chunk. One generator
    // projection (explode over an arithmetic sequence) — zero
    // exchanges, no UDF; at 100 TB this is a map-only pass whose
    // output feeds the ANN index build.
    "text_chunk" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), (length(col("text")) - 1).cast("int"),
            lit(ChunkStride))).as("start_pos"))
        .select(col("doc_id"),
          (col("start_pos") / ChunkStride).cast("long").as("chunk_idx"),
          col("start_pos").cast("long").as("start_pos"),
          expr(s"substring(text, start_pos + 1, $ChunkSize)").as("chunk_text"))
        .withColumn("chunk_len", length(col("chunk_text")).cast("long"))),

    // Per-document token statistics (pure projection — no shuffle).
    "text_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(
          col("doc_id"),
          col("n_chars"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          (size(array_distinct(col("toks"))) / size(col("toks"))).as("ttr"),
          round((length(col("text")) - (size(col("toks")) - 1)) / size(col("toks")), 6).as("mean_token_len"))),

    // Quality scoring: type-token ratio, stopword ratio, mean token
    // length folded into one bounded score.
    // Two-level let: tokenize once, then compute the count bundle once
    // — ratios and the composite score all derive from the same struct
    // instead of re-running filters per output column.
    "text_quality" -> ((s, dir) => qualityOf(Tables.documents(s, dir))),

    // FILTER CALIBRATION — the eval step a curation pipeline owes its
    // quality score: does `quality` actually separate the class it
    // gates on? AUC computed exactly by the rank-sum (Mann-Whitney)
    // identity over per-SCORE aggregates: group docs by (rounded)
    // score into an |distinct-scores|-sized frame, then
    // 2U = Σ_s np_s·(2·cum_nn_below + nn_s) — all integers, so the
    // only float op is the final division. The cumulative window
    // runs over the sketch-sized score frame, never over docs (the
    // same tiny-frame top-k convention as events_paths); the
    // doc-sized work is one partial-aggregable count pass. Plus the
    // confusion matrix and P/R/F1 at the pipeline_select gate
    // (quality ≥ 0.6) — each a single IEEE division of integer
    // counts.
    "text_quality_auc" -> ((s, dir) => {
      val scored = queries("text_quality")(s, dir)
        .select(col("doc_id"), col("quality"))
        .join(Tables.documents(s, dir)
          .select(col("doc_id"), (col("lang") === "en").as("is_pos")), "doc_id")
      val sg = scored.groupBy(col("quality"))
        .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("np"),
             sum(when(!col("is_pos"), 1L).otherwise(0L)).as("nn"))
      // exclusive negative-count prefix over the distinct-score grid
      // (bounded by the 6-dp quality domain, but ~corpus-sized in the
      // worst case → GlobalOrder, not a global window / TinyOrder)
      val auc = graft.operators.GlobalOrder.withPrefixSum(
          sg, col("nn"), "cum_nn", Seq(col("quality")), inclusive = false)
        .agg(sum(col("np") * (lit(2L) * col("cum_nn") + col("nn"))).as("u2"),
             sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      val conf = scored.agg(
        sum(when(col("is_pos") && col("quality") >= 0.6, 1L).otherwise(0L)).as("tp"),
        sum(when(!col("is_pos") && col("quality") >= 0.6, 1L).otherwise(0L)).as("fp"),
        sum(when(col("is_pos") && col("quality") < 0.6, 1L).otherwise(0L)).as("fn"),
        sum(when(!col("is_pos") && col("quality") < 0.6, 1L).otherwise(0L)).as("tn"))
      auc.crossJoin(conf).select(
        col("n_pos"), col("n_neg"),
        round(col("u2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 9).as("auc_r"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"), 6)
          .as("precision_r"),
        round(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"), 6)
          .as("recall_r"),
        round((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"), 6)
          .as("f1_r"))
    }),

    // Language-ID heuristic vs the labeled `lang` column: marker-token
    // argmax + agreement matrix (lang × lang_pred counts).
    "text_langid" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
      val (en, es, de) = (
        TextOps.tokenCount(col("toks"), "the"),
        TextOps.tokenCount(col("toks"), "a"),
        TextOps.tokenCount(col("toks"), "data"))
      base
        .withColumn("lang_pred", TextOps.langPredict(en, es, de))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // KEYWORD EXTRACTION — top-3 tf-idf terms per document, the
    // doc-tagging projection (search facets, topic labels, index
    // keys) the ranked-retrieval family doesn't emit: BM25 ranks
    // docs for a query; this ranks TERMS for a doc. The idf is the
    // BM25 idf quantized to 6 dp BEFORE the integer tf multiply —
    // the product is then an exact scale-6 decimal needing no second
    // rounding, so there is no half-grid for the engines' ln ulp
    // difference to straddle (round-9-then-round-6 DID mismatch on
    // one sf0.01 row); the per-doc top-3 is a rank filter that compiles to
    // WindowGroupLimit — each map task emits ≤3 rows per doc BEFORE
    // the shuffle, the per-group-top-k shape that survives scale.
    "text_keywords" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = Tables.documents(s, dir)
        .agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(broadcast(df), "token").crossJoin(broadcast(nDocs))
        .withColumn("idf_dec",
          round(log(lit(1.0) +
            ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))), 6).cast("decimal(18,6)"))
        // idf quantized BEFORE the integer multiply: the product is an
        // exact scale-6 decimal, so the emitted score needs no second
        // rounding — no half-grid for the engines' ln ulp to straddle
        .withColumn("score", col("idf_dec") * col("tf"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("token"), col("tf"), col("df"),
          col("score").cast("double").as("score_r"))
    }),

    // Global token frequency via explode (generator path) —
    // deterministic top-20 with token tiebreak.
    "text_token_freq" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)),

    // PII/unsafe-span redaction (VERDICT r3 item 7) — the remaining
    // standard curation stage: per-class regexp detectors emit the
    // redacted text plus per-class match counts, all in ONE projection
    // (zero exchanges — CI-asserted in PlanShapeSpec). The fixture
    // corpus contains no PII by construction, so deterministic
    // doc_id-derived spans (an email, a phone, an id tag, on
    // interleaved thirds/quarters/fifths of the corpus) are appended
    // on BOTH engines — the detectors run against real positive AND
    // negative rows, not vacuously.
    "text_redact" -> ((s, dir) => {
      val (nEmail, nPhone, nId) = TextOps.piiCounts(col("aug"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" reach user"), col("doc_id").cast("string"),
                     lit("@mail.example.com"))).otherwise(lit("")),
            when(col("doc_id") % 4 === 0,
              concat(lit(" call 555-01"),
                     lpad((col("doc_id") % 100).cast("string"), 2, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" ref ID-"), (col("doc_id") * 7).cast("string")))
              .otherwise(lit(""))).as("aug"))
        .select(col("doc_id"),
          nEmail.as("n_email"), nPhone.as("n_phone"), nId.as("n_id"),
          (nEmail + nPhone + nId === 0).as("clean"),
          TextOps.redact(col("aug")).as("redacted"))
    }),

    // Intra-document repetition signals (the Gopher-rule family): the
    // fraction of k-gram occurrences that are repeats of an earlier
    // k-gram in the SAME document, for k = 2, 3, 5. Cross-doc span
    // sharing is dedup_substring's job; these flag the
    // degenerate-generation / boilerplate-loop documents a quality
    // filter drops (high dup fraction at k=5 ≈ verbatim looping).
    // Pure projection — array HOFs per row, zero exchanges
    // (CI-asserted in PlanShapeSpec); no 6-dp rounding tie risk:
    // fractions are m/n with n ≤ doc token count ≪ 128, and a
    // HALF_UP-vs-binary tie needs a denominator divisible by 2^7·5^6.
    "text_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          let1(TextOps.tokens(col("text"))) { t =>
            def dupFrac(k: Int) =
              let1(greatest(size(t) - (k - 1), lit(0))) { n =>
                when(n === 0, lit(0.0)).otherwise(
                  round(lit(1.0) -
                    size(TextOps.shingles(t, k)) / n.cast("double"), 6))
              }
            struct(
              size(t).cast("long").as("n_tokens"),
              dupFrac(2).as("dup_2gram_frac"),
              dupFrac(3).as("dup_3gram_frac"),
              dupFrac(5).as("dup_5gram_frac"))
          }.as("r"))
        .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
                col("r.dup_2gram_frac").as("dup_2gram_frac"),
                col("r.dup_3gram_frac").as("dup_3gram_frac"),
                col("r.dup_5gram_frac").as("dup_5gram_frac"))),

    // The pair-count primitive of BPE VOCAB TRAINING (the statistics
    // step of the merge loop): global counts of adjacent character
    // pairs within words, deterministic top-20. Each merge iteration
    // of a tokenizer build is exactly this agg (over the current
    // symbol sequences) + applying the winning merge — iterating it
    // would reuse the bounded-fixpoint pattern of kmeans_train /
    // ConnectedComponents. Generator path: one explode over tokens,
    // one over in-token positions, one partial-aggregable agg.
    "text_bpe_pairs" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)),

    // The C4/Gopher RULE-FILTER family (public recipes: Raffel et al.
    // 2020 §2.2, Rae et al. 2021 A1.1) — the per-document boolean gate
    // every web-corpus pipeline runs before any model-based scoring:
    // word-count bounds, mean-word-length bounds, minimum stopword
    // evidence, symbol-ratio cap, terminal-punctuation check,
    // boilerplate markers ("lorem ipsum", curly braces), and a
    // repeated-2-gram cap (the fixture's bigram-dup spread peaks at
    // ~0.13, so the 0.1 knob splits it naturally; longer-gram caps
    // are the same expression at a different k). The fixture corpus is
    // punctuation-free word soup, so (same device as text_redact)
    // deterministic doc_id-keyed suffixes are appended on BOTH
    // engines — every rule then has real positive AND negative rows,
    // including sub-3-char mean word length via the short-token run.
    // ONE projection, zero exchanges
    // (CI-asserted in PlanShapeSpec); at 100 TB this is a scan-speed
    // gate that drops ~half the corpus before anything expensive runs.
    "text_c4_filters" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 9 === 0,
              lit(" a b c d e f g h i j k l m n o p q r s t u v w x y z" +
                  " 1 2 3 4 5 6 7 8 9 0")).otherwise(lit("")),
            when(col("doc_id") % 7 === 0, lit(" lorem ipsum dolor"))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0, lit(" function() { return 0; }"))
              .otherwise(lit("")),
            when(col("doc_id") % 2 === 0, lit(".")).otherwise(lit("")))
            .as("aug"))
        .select(col("doc_id"),
          let1(TextOps.tokens(col("aug"))) { t =>
            let1(struct(
                size(t).cast("long").as("n_words"),
                length(col("aug")).cast("long").as("n_chars"),
                (TextOps.tokenCount(t, "the") + TextOps.tokenCount(t, "a"))
                  .as("n_stop"),
                length(regexp_replace(col("aug"), "[^#{}();]", ""))
                  .cast("long").as("n_sym"),
                greatest(size(t) - 1, lit(0)).cast("long").as("n_2gram"),
                size(TextOps.shingles(t, 2)).cast("long").as("n_2distinct"))) { st =>
              val nW = st.getField("n_words")
              val meanLen = (st.getField("n_chars") - (nW - 1)) / nW
              val dup2 = when(st.getField("n_2gram") === 0, lit(0.0))
                .otherwise(round(lit(1.0) -
                  st.getField("n_2distinct") / st.getField("n_2gram").cast("double"), 6))
              struct(
                nW.as("n_words"),
                (nW >= 50 && nW <= 100000).as("ok_n_words"),
                (meanLen >= 3.0 && meanLen <= 10.0).as("ok_mean_word_len"),
                (st.getField("n_stop") >= 2).as("ok_stopwords"),
                (st.getField("n_sym") / st.getField("n_chars").cast("double") <= 0.01)
                  .as("ok_symbol_ratio"),
                substring(col("aug"), -1, 1).isin(".", "!", "?").as("ok_terminal_punct"),
                (!col("aug").contains("lorem ipsum")).as("ok_no_lorem"),
                (!col("aug").contains("{")).as("ok_no_braces"),
                (dup2 <= 0.1).as("ok_dup_2gram"))
            }
          }.as("f"))
        .select(col("doc_id"), col("f.n_words").as("n_words"),
                col("f.ok_n_words").as("ok_n_words"),
                col("f.ok_mean_word_len").as("ok_mean_word_len"),
                col("f.ok_stopwords").as("ok_stopwords"),
                col("f.ok_symbol_ratio").as("ok_symbol_ratio"),
                col("f.ok_terminal_punct").as("ok_terminal_punct"),
                col("f.ok_no_lorem").as("ok_no_lorem"),
                col("f.ok_no_braces").as("ok_no_braces"),
                col("f.ok_dup_2gram").as("ok_dup_2gram"))
        .withColumn("keep",
          col("ok_n_words") && col("ok_mean_word_len") && col("ok_stopwords") &&
          col("ok_symbol_ratio") && col("ok_terminal_punct") &&
          col("ok_no_lorem") && col("ok_no_braces") && col("ok_dup_2gram"))),

    // UNICODE NORMALIZATION / ENCODING REPAIR (VERDICT r15 item 4) —
    // the text-cleaning stage real web-corpus pipelines run BEFORE
    // tokenization and the one the ladder lacked: (1) mojibake repair
    // for the UTF-8-read-as-cp1252 double-encoding class (the fixed
    // MojibakeRepairs table folded into one chain of plain non-regex
    // replaces — both engines fold the SAME Scala constants, so the
    // chains are identical by construction), then (2) Unicode NFC
    // canonical composition (the codegen NfcNormalize expression;
    // DuckDB's nfc_normalize is the oracle leg). Planted suffixes
    // (doc_id % 5: every repair entry; doc_id % 4: NFD-decomposed
    // accents) give both rules positive AND negative rows. ONE
    // projection, zero exchanges — at 100 TB this is a scan-speed
    // stage ahead of the tokenizer, and NfcNormalize's isNormalized
    // fast path returns already-clean rows (the overwhelming case)
    // with no allocation.
    "text_normalize" -> ((s, dir) => {
      val aug = concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(MojiSuffix)).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(NfdSuffix)).otherwise(lit("")))
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("raw"))
        .withColumn("repaired", MojibakeRepairs.foldLeft(col("raw")) {
          case (c, (bad, good)) => replace(c, lit(bad), lit(good))
        })
        .withColumn("norm", graft.functions.NfcNormalize(col("repaired")))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("n_chars_raw"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          (col("repaired") =!= col("raw")).as("fixed_mojibake"),
          (col("norm") =!= col("repaired")).as("fixed_nfc"),
          md5(col("norm")).as("norm_fp"))
    }),

    // ONE FULL BPE MERGE ITERATION — closes the loop text_bpe_pairs
    // opens: pick the globally winning pair (count desc, pair asc),
    // APPLY it to every word (greedy left-to-right non-overlapping
    // replacement — the BPE convention, and exactly what literal
    // `replace()` does in both engines; the merged symbol becomes '#',
    // absent from the corpus alphabet), and emit the NEXT iteration's
    // statistics: the post-merge top-20 adjacent-symbol pair counts
    // (pairs may now contain '#' — merged-symbol adjacency, the real
    // BPE state). A tokenizer build is this query iterated with the
    // growing merge table as the symbol map — the bounded-fixpoint
    // pattern of kmeans_train. Shape: the winner is a 1-row broadcast;
    // the apply+recount is one generator projection + one
    // partial-aggregable agg — linear at any corpus size.
    "text_bpe_merge" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      val winner = toks
        .filter(length(col("tok")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("p")).limit(1)
        .select(col("p").as("winner"))
      toks.crossJoin(broadcast(winner))
        .select(expr("replace(tok, winner, '#')").as("sym"))
        .filter(length(col("sym")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("sym")) - 1),
          i => col("sym").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    }),

    // Deterministic COUNT-MIN sketch (Cormode & Muthukrishnan 2005) —
    // the bounded-memory heavy-hitter counter: d=4 hash rows × w=64
    // counters, each row keyed by a domain-separated md5 hash (the
    // cross-engine route), estimate = min over rows of the collided
    // counter — an OVER-estimate by construction, never under. The
    // query audits the sketch against exact truth on the global top-10
    // tokens: one generator projection (4 rows per token occurrence) +
    // one 256-group partial agg for the sketch, one exact agg for the
    // truth, one tiny join for the audit. All-integer math — the hash
    // check is exact. At 100 TB the 4×64 counter table is the
    // mergeable fixed-size state that replaces a billion-row exact
    // count when only the heavy tail matters.
    "sketch_cms_tokens" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      cmsAudit(
        cmsBuckets(toks).groupBy(col("r"), col("bucket"))
          .agg(count(lit(1)).as("counter")),
        toks)
    }),

    // BPE VOCAB TRAINING to a bounded number of merges — the
    // text_bpe_merge step iterated with the growing merge table, the
    // same bounded-fixpoint pattern as kmeans_train / connected
    // components (per-round localCheckpoint truncates the lineage so
    // round N's plan doesn't embed rounds 1..N−1). Each round: global
    // pair statistics over the CURRENT symbol sequences → winning pair
    // (count desc, pair asc) → greedy non-overlapping apply (merged
    // pair becomes a fresh single placeholder symbol, so later rounds
    // can merge INTO it — real BPE state). Output = the merge table
    // (round, winning pair, application count): exactly what a
    // tokenizer build persists. Each round is one generator projection
    // + one partial-aggregable agg + a 1-row broadcast — O(rounds·n)
    // at any corpus size, and the unrolled-round DuckDB twin proves
    // every round end to end.
    "text_bpe_train" -> ((s, dir) => {
      val placeholders = Seq("#", "@", "~")
      // ADVICE r16 guard: the plain-lineage choice below is TIED to
      // this small round count — recompute breadth doubles per round
      // (~2^rounds bounded subtrees before ReuseExchange) — though
      // since the r17 weighted-vocab rewrite each subtree is
      // vocabulary-sized, so the guard protects plan size, not data.
      require(placeholders.length <= BpeCheckpointEvery,
        s"plain-lineage BPE chain is only sane up to $BpeCheckpointEvery " +
          "rounds; checkpoint per round on the vocab table like " +
          "text_bpe_train10")
      // r17 state-shrink (the real fix for the r16 stall class): BPE
      // statistics are exact on the DISTINCT-WORD COUNT table — every
      // occurrence of the same word contributes the same pairs and the
      // same merge, so pair counts and n_applied are the per-word
      // values × cnt (how SentencePiece/HF trainers actually train).
      // ONE corpus-wide agg here; every round after is vocab-sized.
      var syms = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("sym"))
        .groupBy(col("sym")).agg(count(lit(1)).cast("long").as("cnt"))
      val perRound = placeholders.zipWithIndex.map { case (ph, r) =>
        val winner = syms.filter(length(col("sym")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("sym")) - 1),
            i => col("sym").substr(i, lit(2)))).as("p"), col("cnt"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1)
          .select(col("p").as("winner"))
        val merged = syms.crossJoin(broadcast(winner))
          .select(col("winner"), col("sym"), col("cnt"),
            expr(s"replace(sym, winner, '$ph')").as("sym2"))
        val stats = merged.groupBy(col("winner"))
          .agg(sum((length(col("sym")) - length(col("sym2"))).cast("long") *
            col("cnt")).as("n_applied"))
          .select(lit(r + 1L).as("round"), col("winner").as("pair"),
                  col("n_applied"))
        // plain lineage, NOT localCheckpoint: at 3 rounds the
        // recompute is ~8 bounded subtrees (ReuseExchange dedupes the
        // repeated winner aggregations), all vocab-sized since the r17
        // weighted rewrite. History: checkpointing the CORPUS-sized
        // symbol table per round was the suite's largest storage-block
        // writer — the r16 stall forensics traced a one-in-N ~45 s
        // non-GC stall to those writes, and the r17 probe showed even
        // a single such write draws the band (BENCH_NOTES r17) — hence
        // the state shrink, which removes the corpus-sized write class
        // from this chain entirely. Two words merging to one string
        // re-aggregate below (sum of their counts).
        syms = merged.select(col("sym2").as("sym"), col("cnt"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("cnt"))
        stats
      }
      perRound.reduce(_.unionByName(_))
    }),

    // MANY-ROUND BPE TRAINING — the deep-trainer lineage question
    // settled by measurement (VERDICT r16 items 3+6). Same per-round
    // step as text_bpe_train, 10 merges instead of 3. The naive deep
    // trainer has no good lineage policy over a corpus-sized symbol
    // table: plain lineage doubles recompute breadth per round (~2^10
    // subtrees at 10 rounds), per-round localCheckpoint was the r16
    // one-in-N 45-90 s stall class, and the r16-prescribed CADENCE
    // compromise (checkpoint every 5 rounds) was probed this round and
    // STILL drew the band — a fresh-JVM rep paid 101 s on the single
    // cadence write (BENCH_NOTES r17). The measured answer is a STATE
    // SHRINK: train on the distinct-word count table (one corpus agg
    // up front; pair counts and n_applied are per-word values × cnt —
    // exact, and how production BPE trainers work), making every round
    // vocab-sized, where per-round checkpoints are the clean CC/BFS
    // frame class (0/27 probe draws). At 100 TB: the corpus is read
    // ONCE; 10 rounds then run on a ≤10⁶-row weighted vocab.
    // Unrolled 10-round DuckDB twin proves every round end to end.
    "text_bpe_train10" -> ((s, dir) => {
      val placeholders = Bpe10Placeholders
      var syms = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("sym"))
        .groupBy(col("sym")).agg(count(lit(1)).cast("long").as("cnt"))
      val perRound = placeholders.zipWithIndex.map { case (ph, r) =>
        val winner = syms.filter(length(col("sym")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("sym")) - 1),
            i => col("sym").substr(i, lit(2)))).as("p"), col("cnt"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1)
          .select(col("p").as("winner"))
        val merged = syms.crossJoin(broadcast(winner))
          .select(col("winner"), col("sym"), col("cnt"),
            expr(s"replace(sym, winner, '$ph')").as("sym2"))
        val stats = merged.groupBy(col("winner"))
          .agg(sum((length(col("sym")) - length(col("sym2"))).cast("long") *
            col("cnt")).as("n_applied"))
          .select(lit(r + 1L).as("round"), col("winner").as("pair"),
                  col("n_applied"))
        // per-round localCheckpoint of the VOCAB-sized weighted table —
        // the CC/BFS frame class the r17 probe measured clean (0/27
        // band draws), keeping the round-10 plan flat. The earlier
        // cadence variant (checkpoint the corpus-sized symbol table
        // every 5 rounds) still drew the r16 stall band — fresh-JVM
        // probe caught a 101 s rep on the single cadence write
        // (BENCH_NOTES r17) — which is what forced the state shrink.
        syms = merged.select(col("sym2").as("sym"), col("cnt"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint()
        stats
      }
      perRound.reduce(_.unionByName(_))
    }),

    // BPE ENCODE — the APPLY side of the tokenizer loop
    // (text_bpe_train learns the merges; this runs them over the
    // corpus): re-derive the 3 trained merges with the identical
    // winner chain, then apply them in training order to every word
    // of every document and account tokens per doc — the token-budget
    // bookkeeping (n_bpe_tokens, compression vs raw chars) a training
    // pipeline runs with its OWN trained vocab, not a generic
    // whitespace count. The merges ride in a 1-row broadcast; the
    // encode itself is a projection + one partial-aggregable per-doc
    // agg — O(rounds·n) total, no pair recount at encode time.
    "text_bpe_encode" -> ((s, dir) => {
      val placeholders = Seq("#", "@", "~")
      // same plain-lineage-only-while-small guard as text_bpe_train
      require(placeholders.length <= BpeCheckpointEvery,
        s"plain-lineage BPE chain is only sane up to $BpeCheckpointEvery " +
          "rounds; checkpoint per round on the vocab table like " +
          "text_bpe_train10")
      // weighted-vocab winner chain (see text_bpe_train) — the corpus
      // is scanned once here and once in the encode pass below; the 3
      // training rounds run on the distinct-word count table
      var syms = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("sym"))
        .groupBy(col("sym")).agg(count(lit(1)).cast("long").as("cnt"))
      val winners = placeholders.map { ph =>
        val w = syms.filter(length(col("sym")) >= 2)
          .select(explode(transform(
            sequence(lit(1), length(col("sym")) - 1),
            i => col("sym").substr(i, lit(2)))).as("p"), col("cnt"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1)
          .select(col("p"))
        syms = syms.crossJoin(broadcast(w.select(col("p").as("w"))))
          .select(expr(s"replace(sym, w, '$ph')").as("sym"), col("cnt"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("cnt"))
        w
      }
      val wFrame = broadcast(winners(0).select(col("p").as("w1"))
        .crossJoin(winners(1).select(col("p").as("w2")))
        .crossJoin(winners(2).select(col("p").as("w3"))))
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("sym"))
        .crossJoin(wFrame)
        .select(col("doc_id"), col("sym"),
          expr("replace(replace(replace(sym, w1, '#'), w2, '@'), w3, '~')").as("m"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_words"),
             sum(length(col("sym"))).cast("long").as("n_chars"),
             sum(length(col("m"))).cast("long").as("n_bpe_tokens"),
             round(sum(length(col("m"))).cast("double") /
                   sum(length(col("sym"))).cast("double"), 6).as("compression"))
    }),

    // Zipf rank-frequency profile of the corpus vocabulary — the
    // distribution diagnostic every corpus report includes: tokens
    // ranked by frequency with each rank's share of the top-1 count
    // (a Zipfian corpus shows ratio ≈ 1/rank). One agg + one global
    // top-20 sort; the max is a 1-row broadcast.
    "text_zipf" -> ((s, dir) => {
      val freq = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val top1 = freq.agg(max(col("cnt")).as("cmax"))
      freq.orderBy(col("cnt").desc, col("token")).limit(20)
        .crossJoin(broadcast(top1))
        .transform(df => graft.operators.TinyOrder.rank(df, "rank",
          Seq(negate(col("cnt")), col("token"))))
        .select(col("rank"), col("token"), col("cnt"),
                round(col("cnt") / col("cmax").cast("double"), 6).as("ratio_to_top"))
    }),

    // BM25 RANKED RETRIEVAL (Robertson et al., Okapi; Lucene's
    // positive log(1 + (N−df+0.5)/(df+0.5)) idf form) — the relevance
    // scorer a corpus-curation pipeline uses to pull topic-targeted
    // training subsets. Query = one rare + two common terms (df 25
    // vs ~385 per 500 docs at every sf), so the idf spread is real.
    // Shape: one token explode, two partial-aggregable aggs (per-doc
    // length, per-(doc,term) tf), a 3-row df/stats broadcast, one
    // scoring projection, and a distributed top-20
    // (TakeOrderedAndProject — no global sort materialized).
    // Determinism: each term contribution is quantized to 9 dp and
    // decimal-summed (order-free), ranking compares the EXACT decimal
    // score with doc_id tiebreak, and the one libm call (ln) has a
    // 3-value argument domain per sf — cross-checked by the 3-sf
    // oracle verify, the HLL enumeration discipline.
    "text_bm25" -> ((s, dir) =>
      bm25Agg(s, dir)
        .orderBy(col("score_d").desc, col("doc_id"))
        .limit(20)
        .transform(df => graft.operators.TinyOrder.rank(df, "rank",
          Seq(negate(col("score_d")), col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("n_terms_hit"),
                round(col("score_d").cast("double"), 6).as("score_r"))),

    // INVERTED INDEX build — the posting-list table behind BM25 at
    // interactive latency (score only the union of the query terms'
    // postings instead of exploding the corpus per query). Output:
    // per-token df, corpus frequency, and the first 10 posting
    // doc_ids, for the top-20 tokens by df. The rank-head filter
    // (row_number ≤ 10 per token) is Spark's WindowGroupLimit shape:
    // each map task emits at most 10 rows per token BEFORE the
    // shuffle, so a stop-word token with a billion postings ships 10
    // rows per partition, not a collected list — the reason this is
    // a window + filter and not a collect_list over raw postings.
    "text_inverted_index" -> ((s, dir) =>
      invertedIndexTop20(s, dir)
        .transform(df => graft.operators.TinyOrder.rank(df, "rank",
          Seq(negate(col("df")), col("token"))))
        .select(col("rank"), col("token"), col("df"), col("cf"),
                col("postings_head"))),

    // SPARSE TF-IDF COSINE RETRIEVAL — the vector-space twin of
    // text_bm25 and the SPARSE leg of hybrid search (dense ANN covers
    // the other): docs and query are tf-idf vectors over the full
    // vocabulary, score = cos(q, d) = Σ w(t,q)·w(t,d) / (|q|·|d|).
    // Unlike BM25's per-term contributions, cosine needs DOC NORMS
    // over every term in the doc — |d|² is one partial-aggregable agg
    // over the whole (doc, token) table and is exactly the kind of
    // per-doc artifact a 100 TB pipeline precomputes once per index
    // build; the per-query retrieval cost is then bounded by the
    // postings of the query terms (token-filter pushdown), never a
    // corpus scan. Exactness: idf = ln((N+1)/(df+1)) + 1 quantized at
    // 9 dp (the BM25 ln convention); weights tf·idf are EXACT scale-9
    // decimals (integer × 9-dp), squares/products exact scale-18
    // decimals, sums decimal-exact, and the final
    // dot/(√nq²·√nd²) runs in fixed-order IEEE double both engines
    // share (sqrt is correctly-rounded — no transcendental gap).
    "search_tfidf_cosine" -> ((s, dir) =>
      tfidfScored(s, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .transform(df => graft.operators.TinyOrder.rank(df, "rank",
          Seq(negate(col("score")), col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("n_terms_hit"),
                round(col("score"), 6).as("score_r"))),

    // RANKING QUALITY — NDCG@10 of the BM25 ranking against graded
    // relevance derived from the tf-idf cosine scorer (the two
    // retrieval legs judging each other — the offline eval harness a
    // search pipeline runs on every ranker change; swap a real
    // judgment table in for `rel` and the query IS the evaluator).
    // Engine-exact core: rank discounts 1/log2(r+1) are PRE-ROUNDED
    // 9-dp constants (the SPRT-constants pattern — no runtime log2),
    // grades are integer cuts of the already-quantized cosine, so
    // DCG and ideal-DCG are exact decimal sums and only the final
    // ratio is a rounded double. Everything is top-10-sized after the
    // two scoring chains, which are shared with text_bm25 /
    // search_tfidf_cosine.
    "search_ndcg" -> ((s, dir) => {
      val top = bm25Agg(s, dir)
        .orderBy(col("score_d").desc, col("doc_id"))
        .limit(NdcgK)
        .transform(df => graft.operators.TinyOrder.rank(df, "rank",
          Seq(negate(col("score_d")), col("doc_id"))))
        .select(col("rank"), col("doc_id"))
      val rel = tfidfScored(s, dir)
        .select(col("doc_id"),
          least(lit(4L), greatest(lit(0L),
            floor(round(col("score"), 6) * 10).cast("long"))).as("grade"))
      ndcgOf(s, top, rel)
    }),

    // BIGRAM LANGUAGE-MODEL SCORING — the "LM perplexity filter" stage
    // of CCNet/Gopher-style curation pipelines (docs whose token
    // sequences the corpus LM finds improbable are boilerplate/noise),
    // with the 5-gram KenLM swapped for an exactly-computable add-1
    // bigram model: p(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V). Per doc,
    // the mean log-probability of its bigrams — low = anomalous
    // sequencing. Shape: one bigram explode (compiled transform over
    // token positions), two partial-aggregable count tables, one
    // shuffle join of doc bigrams against the model (at 100 TB the
    // bigram table is itself big data — this is a join, deliberately
    // not a broadcast), per-bigram log-probs quantized to 9 dp and
    // decimal-summed so the per-doc mean is order-free.
    // CURRICULUM ORDERING — the data-ordering step curriculum-learning
    // training runs consume: every document gets a GLOBAL training
    // position such that (a) within each language, easier documents
    // (higher quality composite) come first, and (b) the languages
    // stay proportionally interleaved at every prefix — epoch 1 of a
    // curriculum must not be all-English. Mechanics: within-stratum
    // rank srn via one distributed global order
    // ([[graft.operators.GlobalOrder]] over (lang, −quality, doc_id)
    // minus broadcast per-lang offsets — the stratified_split shape),
    // the canonical interleave key frac = (2·srn−1)/(2·cnt) (each
    // stratum's k-th doc sits at its proportional position), then a
    // second GlobalOrder pass over (frac, lang, doc_id) for the final
    // position and its 4-stage ntile. No single-task sort anywhere at
    // any corpus size; frac is one IEEE division over integers,
    // identical on both engines.
    "pipeline_curriculum" -> ((s, dir) => {
      import graft.operators.GlobalOrder
      import org.apache.spark.sql.expressions.Window
      val q = qualityOf(Tables.documents(s, dir))
        .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
              "doc_id")
        .select(col("doc_id"), col("lang"), col("quality"))
      val ranked = GlobalOrder.withRowNumber(q, "grn",
        Seq(col("lang"), negate(col("quality")), col("doc_id")))
      val offs = graft.operators.TinyOrder.exclusivePrefixSum(
        ranked.groupBy(col("lang")).agg(count(lit(1)).as("cnt")),
        col("cnt"), "off", Seq(col("lang")))
      val tot = q.agg(count(lit(1)).as("n_total"))
      val fr = ranked.join(broadcast(offs), "lang")
        .withColumn("srn", col("grn") - col("off"))
        .withColumn("frac",
          (lit(2.0) * col("srn").cast("double") - lit(1.0)) /
            (lit(2.0) * col("cnt").cast("double")))
        .select(col("doc_id"), col("lang"), col("frac"))
      GlobalOrder.withRowNumber(fr, "curriculum_rank",
          Seq(col("frac"), col("lang"), col("doc_id")))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("lang"), col("curriculum_rank"),
          GlobalOrder.ntileOf(col("curriculum_rank"), col("n_total"), 4)
            .cast("long").as("stage"))
    }),

    // KNESER-NEY BIGRAM LM — the smoothing production n-gram LMs
    // (KenLM, the CCNet filter's scorer) actually use, upgrading
    // text_bigram_lm's add-one: interpolated absolute discounting,
    //   P_KN(w2|w1) = max(c12 − D, 0)/c1
    //               + (D·N1+(w1·)/c1) · N1+(·w2)/N1+(··)
    // where the continuation counts N1+ ask "how many distinct
    // contexts" — the insight that makes 'Francisco' (frequent but
    // only after 'San') score low as a continuation. EVERY input is a
    // distributed count or count-distinct (mergeable hash aggs over
    // the bigram frame — the data-sized pass is the one explode);
    // the finish is fixed-order IEEE per surviving bigram row. Output:
    // the top-20 bigrams by count with their smoothed probabilities.
    "text_kneser_ney" -> ((s, dir) =>
      knFinish(knBigramCounts(Tables.documents(s, dir)))),

    "text_bigram_lm" -> ((s, dir) => bigramLmScores(s, dir)),

    // HELD-OUT PERPLEXITY — the production CCNet/LLaMA configuration
    // of the LM quality filter: the scoring model is trained on a
    // DIFFERENT corpus than the one being scored (CCNet trains KenLM
    // on Wikipedia and scores Common Crawl), so unseen bigrams and
    // unseen histories are the NORMAL case, not an edge case. Here the
    // doc_id-parity split is the deterministic stand-in for "a
    // reference corpus": train the add-1 bigram model on even doc_ids,
    // score odd doc_ids. Unseen (w1,w2) backs off to (0+1)/(c1+V);
    // unseen history w1 to 1/V — both via LEFT joins + coalesce (the
    // in-corpus variant above can inner-join because every scored
    // bigram is by construction in the model; this one cannot). Output
    // is the per-doc mean log-prob AND the perplexity exp(−avg) — the
    // number the filter thresholds on. Same scale shape: two
    // partial-aggregable count tables from the train half, one shuffle
    // join of test bigrams against the model (at 100 TB the model
    // table is big data — deliberately not a broadcast), 9-dp
    // quantized decimal-summed log-probs; the single per-doc exp runs
    // in fixed order on an engine-identical double (PerplexitySpec
    // pins the 4-dp rounding margin).
    "text_perplexity_heldout" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val train = toks.filter(col("doc_id") % 2 === 0)
      val c12 = bigramsOf(train)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val vocab = train.select(explode(col("t")).as("w")).distinct()
        .agg(count(lit(1)).as("v"))
      perplexityFinish(c12, vocab,
        bigramsOf(toks.filter(col("doc_id") % 2 === 1)))
    }),

    // Order-sensitive rolling-hash fingerprint per document (exact-dup
    // detection that, unlike a bag-of-words hash, respects word order).
    "text_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          TextOps.fingerprint(TextOps.tokens(col("text"))).as("fp"))),

    // BPE-ish sub-word token counting: a GPT-2-style pre-tokenizer
    // regex (contractions | letter runs | digit runs | punctuation
    // runs, each with optional leading space; no lookahead, so Java
    // regex and RE2 agree) — the token-budget estimator of a training
    // pipeline. Pure projection, one regex pass per doc.
    "text_bpe_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          let1(regexp_extract_all(col("text"), lit(BpePattern), lit(0))) { bt =>
            let1(TextOps.tokens(col("text"))) { ws =>
              struct(
                size(bt).cast("long").as("n_bpe"),
                size(array_distinct(bt)).cast("long").as("n_bpe_distinct"),
                size(ws).cast("long").as("n_words"),
                round(size(bt) / size(ws).cast("double"), 6).as("bpe_per_word"))
            }
          }.as("t"))
        .select(col("doc_id"), col("t.n_bpe").as("n_bpe"),
                col("t.n_bpe_distinct").as("n_bpe_distinct"),
                col("t.n_words").as("n_words"),
                col("t.bpe_per_word").as("bpe_per_word")))
  )

  /** Per-occurrence CMS bucket projection: (r, bucket) for each of the
    * d=4 hash rows — the mergeable half of the sketch (counters merge
    * by SUM, the additive complement to HLL's max-merge).
    * private[graft]: the streaming twin builds per-batch partial
    * counter tables from the same projection.
    */
  private[graft] def cmsBuckets(toks: org.apache.spark.sql.DataFrame) =
    toks
      .select(col("token"), explode(sequence(lit(0), lit(3))).as("r"))
      .select(col("r"),
        (TextOps.tokenHash31(concat(col("token"), lit("#cms"),
          col("r").cast("string"))) % 64).as("bucket"))

  /** The heavy-hitter audit over a merged (r, bucket, counter) table:
    * exact global top-10 tokens probed against the sketch,
    * estimate = min over rows.
    */
  private[graft] def cmsAudit(cms: org.apache.spark.sql.DataFrame,
                              toks: org.apache.spark.sql.DataFrame) = {
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt_true"))
      .orderBy(col("cnt_true").desc, col("token"))
      .limit(10)
    top
      .select(col("token"), col("cnt_true"),
        explode(sequence(lit(0), lit(3))).as("r"))
      .select(col("token"), col("cnt_true"), col("r"),
        (TextOps.tokenHash31(concat(col("token"), lit("#cms"),
          col("r").cast("string"))) % 64).as("bucket"))
      .join(broadcast(cms), Seq("r", "bucket"))
      .groupBy(col("token"), col("cnt_true"))
      .agg(min(col("counter")).as("cnt_cms"))
      .select(col("token"), col("cnt_true"), col("cnt_cms"),
              (col("cnt_cms") - col("cnt_true")).as("overcount"))
  }

  /** GPT-2-style pre-tokenizer pattern, restricted to constructs with
    * identical semantics in Java regex (Spark) and RE2 (DuckDB) —
    * alternation is leftmost-first in both, no lookahead/unicode
    * classes.
    */
  private val BpePattern =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  private val toksCte =
    """WITH d AS (
      |  SELECT doc_id, text, lang, n_chars,
      |         string_split(text, ' ') AS toks
      |  FROM documents
      |)""".stripMargin

  /** text_bigram_lm's oracle — a named val so pipeline_ccnet_buckets
    * can embed the identical LM chain as a subquery (referencing
    * oracleSql during its own Map construction would NPE).
    */
  private lazy val bigramLmSql: String =
    s"""$toksCte, bi AS (
       |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
       |  FROM d, unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS t(b)
       |  WHERE len(toks) >= 2
       |), c12 AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY 1
       |), vocab AS (
       |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
       |  FROM d, unnest(toks) AS u(token)
       |), lp AS (
       |  SELECT bi.doc_id,
       |    CAST(round(ln(CAST(c12.c12 + 1 AS DOUBLE) /
       |                  CAST(c1.c1 + vocab.v AS DOUBLE)), 9)
       |         AS DECIMAL(28,9)) AS lp
       |  FROM bi
       |  JOIN c12 ON c12.w1 = bi.w1 AND c12.w2 = bi.w2
       |  JOIN c1 ON c1.w1 = bi.w1
       |  CROSS JOIN vocab
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob_r
       |FROM lp GROUP BY 1""".stripMargin

  /** BM25 query terms: one rare (df ≈ 5% of docs) + two common. */
  private val Bm25Terms = Seq("dup", "spark", "vector")

  /** NDCG cutoff and the 1/log2(r+1) rank discounts for r = 1..10,
    * pre-rounded at 9 dp (computed once offline — no runtime log2, so
    * DCG sums are exact decimal on both engines; the SPRT-constants
    * pattern).
    */
  private[graft] val NdcgK = 10
  private[graft] val DcgDiscounts = Seq(
    "1.000000000", "0.630929754", "0.500000000", "0.430676558",
    "0.386852807", "0.356207187", "0.333333333", "0.315464877",
    "0.301029996", "0.289064826")

  private def discountFrame(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    DcgDiscounts.zipWithIndex
      .map { case (d, i) => ((i + 1).toLong, BigDecimal(d)) }
      .toDF("r", "disc")
      .select(col("r"), col("disc").cast("decimal(12,9)").as("disc"))
  }

  /** NDCG core over a (rank, doc_id) ranking and a (doc_id, grade)
    * relevance table — exposed so the spec can assert the identity
    * (self-consistent ranking → 1.0) and order sensitivity.
    */
  private[graft] def ndcgOf(s: org.apache.spark.sql.SparkSession,
                            top: org.apache.spark.sql.DataFrame,
                            rel: org.apache.spark.sql.DataFrame) = {
    val disc = discountFrame(s)
    val graded = top
      .join(rel, Seq("doc_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0L)))
      .transform(df => graft.operators.TinyOrder.rank(df, "irank",
        Seq(negate(col("grade")), col("doc_id"))))
    graded
      .join(broadcast(disc.select(col("r").as("rank"), col("disc"))), "rank")
      .join(broadcast(disc.select(col("r").as("irank"),
        col("disc").as("idisc"))), "irank")
      .agg(count(lit(1)).as("n"),
        sum(col("grade").cast("decimal(10,0)") * col("disc")).as("dcg"),
        sum(col("grade").cast("decimal(10,0)") * col("idisc")).as("idcg"))
      .select(col("n"),
        round(col("dcg").cast("double"), 6).as("dcg_r"),
        round(col("idcg").cast("double"), 6).as("idcg_r"),
        when(col("idcg") > 0,
          round(col("dcg").cast("double") / col("idcg").cast("double"), 6))
          .as("ndcg_r"))
  }

  /** The inverted-index top-20 chain UP TO (and excluding) the final
    * TinyOrder rank — exposed because the rank's eager localCheckpoint
    * truncates the executed plan to a checkpoint scan, so Bm25Spec's
    * WindowGroupLimit assertion must read THIS frame's plan (the
    * shipped chain, not a replica) to see the rn ≤ 10 group limit.
    */
  private[graft] def invertedIndexTop20(s: org.apache.spark.sql.SparkSession,
                                        dir: String): org.apache.spark.sql.DataFrame = {
    val perDoc = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val heads = perDoc.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("token")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 10)
      .groupBy(col("token"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("token"),
        expr("concat_ws(',', transform(ids, x -> CAST(x AS STRING)))")
          .as("postings_head"))
    stats.join(heads, "token")
      .orderBy(col("df").desc, col("token"))
      .limit(20)
  }

  /** BM25-scored per-doc aggregate (doc_id, n_terms_hit, score_d) for
    * the fixed query terms — the chain text_bm25 ranks and search_ndcg
    * evaluates.
    */
  private def bm25Agg(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val hits = toks.filter(col("token").isin(Bm25Terms: _*))
    val tf = hits.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = hits.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf
      .join(dl, "doc_id")
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", log(lit(1.0) +
        ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))))
      .withColumn("tfn",
        col("tf").cast("double") * lit(2.2) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(1.0) - lit(0.75) +
             lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("contrib_q",
        round(col("idf") * col("tfn"), 9).cast("decimal(28,9)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib_q")).as("score_d"))
  }

  /** Tf-idf cosine scores (doc_id, n_terms_hit, score) for the same
    * query terms — shared by search_tfidf_cosine and search_ndcg's
    * relevance grades.
    */
  private def tfidfScored(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val idf = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_q", round(
        log((col("n_docs") + 1).cast("double") /
            (col("df") + 1).cast("double")) + lit(1.0), 9)
        .cast("decimal(18,9)"))
      .select(col("token"), col("idf_q"))
    val w = tf.join(idf, "token")
      .withColumn("w",
        (col("tf").cast("decimal(9,0)") * col("idf_q")).cast("decimal(18,9)"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("nd2"))
    val qTerms = idf.filter(col("token").isin(Bm25Terms: _*))
      .select(col("token"), col("idf_q").as("qw"))
    val qNorm = qTerms.agg(sum(col("qw") * col("qw")).as("nq2"))
    w.join(broadcast(qTerms), "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("qw") * col("w")).as("dot_d"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qNorm))
      .withColumn("score", col("dot_d").cast("double") /
        (sqrt(col("nq2").cast("double")) * sqrt(col("nd2").cast("double"))))
  }

  /** Adjacent-token bigrams of a (doc_id, t: tokens) frame — shared
    * by the held-out perplexity pair.
    */
  private[graft] def bigramsOf(df: org.apache.spark.sql.DataFrame) = df
    .filter(size(col("t")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(t) - 2), " +
      "i -> struct(element_at(t, i + 1) AS w1, element_at(t, i + 2) AS w2))")).as("b"))
    .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** The held-out scoring half over a merged model: c1 is re-derived
    * FROM c12 (Σ_w2 c12(w1, w2) ≡ the direct head count — this is
    * what makes the model state mergeable with ONE count table), then
    * the LEFT-join backoff scoring. Shared verbatim by
    * `text_perplexity_heldout` and its streaming twin.
    */
  private[graft] def perplexityFinish(c12: org.apache.spark.sql.DataFrame,
                                      vocab: org.apache.spark.sql.DataFrame,
                                      testBi: org.apache.spark.sql.DataFrame) = {
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    testBi
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(log(
        (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 9)
        .cast("decimal(28,9)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("slp").cast("double") / col("n_bigrams"), 6)
          .as("avg_logprob_r"),
        round(exp(-col("slp").cast("double") / col("n_bigrams")), 4)
          .as("ppl_r"))
  }

  /** One unrolled Newton round of the `text_quality_lr` oracle —
    * term-for-term the Spark `lrStep` chain (12-dp quantized sums,
    * fixed-order cofactor solve, 9-dp β requantization). MATERIALIZED
    * is load-bearing: DuckDB inlines CTEs and the multiply-referenced
    * round chain re-evaluates exponentially without it (the
    * emb_pca_power lesson).
    */
  private def lrRoundSql(t: Int, sfx: String = "", featCte: String = "f"): String = {
    // every chain starts from the shared β₀ CTE
    val prev = if (t == 1) "bt0" else s"bt$sfx${t - 1}"
    s"""r$sfx$t AS MATERIALIZED (
       |  SELECT *, 1.0 / (1.0 + exp(-((b0 + b1 * x1) + b2 * x2))) AS p
       |  FROM (
       |    SELECT f.y, f.x1q, f.x2q, CAST(f.x1q AS DOUBLE) AS x1,
       |      CAST(f.x2q AS DOUBLE) AS x2, b.b0, b.b1, b.b2
       |    FROM $featCte f CROSS JOIN $prev b)
       |), w$sfx$t AS (
       |  SELECT *, y - pq AS ymp,
       |    CAST(round(pq * (CAST(1 AS DECIMAL(10,9)) - pq), 9)
       |      AS DECIMAL(11,9)) AS w9
       |  FROM (SELECT *, CAST(round(p, 9) AS DECIMAL(11,9)) AS pq FROM r$sfx$t)
       |), a$sfx$t AS (
       |  SELECT b0, b1, b2,
       |    sum(ymp) AS g0,
       |    sum(x1q * ymp) AS g1,
       |    sum(x2q * ymp) AS g2,
       |    sum(w9) AS h00,
       |    sum(x1q * w9) AS h01,
       |    sum(x2q * w9) AS h02,
       |    sum((x1q * x1q) * w9) AS h11,
       |    sum((x1q * x2q) * w9) AS h12,
       |    sum((x2q * x2q) * w9) AS h22
       |  FROM w$sfx$t GROUP BY 1, 2, 3
       |), c$sfx$t AS (
       |  SELECT b0, b1, b2,
       |    CAST(g0 AS DOUBLE) AS g0, CAST(g1 AS DOUBLE) AS g1,
       |    CAST(g2 AS DOUBLE) AS g2, CAST(h00 AS DOUBLE) AS h00,
       |    CAST(h01 AS DOUBLE) AS h01, CAST(h02 AS DOUBLE) AS h02,
       |    CAST(h11 AS DOUBLE) AS h11, CAST(h12 AS DOUBLE) AS h12,
       |    CAST(h22 AS DOUBLE) AS h22
       |  FROM a$sfx$t
       |), d$sfx$t AS (
       |  SELECT *,
       |    h11 * h22 - h12 * h12 AS c00,
       |    h02 * h12 - h01 * h22 AS c01,
       |    h01 * h12 - h02 * h11 AS c02,
       |    h00 * h22 - h02 * h02 AS c11,
       |    h01 * h02 - h00 * h12 AS c12,
       |    h00 * h11 - h01 * h01 AS c22
       |  FROM c$sfx$t
       |), e$sfx$t AS (
       |  SELECT *, h00 * c00 + h01 * c01 + h02 * c02 AS det FROM d$sfx$t
       |), bt$sfx$t AS MATERIALIZED (
       |  SELECT
       |    round(b0 + (c00 * g0 + c01 * g1 + c02 * g2) / det, 9) AS b0,
       |    round(b1 + (c01 * g0 + c11 * g1 + c12 * g2) / det, 9) AS b1,
       |    round(b2 + (c02 * g0 + c12 * g1 + c22 * g2) / det, 9) AS b2
       |  FROM e$sfx$t
       |)""".stripMargin
  }

  /** Shared oracle prefix: the feature CTE + β₀ + the unrolled Newton
    * rounds — reused by the training and calibration oracles.
    */
  private lazy val lrChainPrefixSql: String =
    s"""WITH tq AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
       |), f AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(CASE WHEN CAST(round(CAST(round(
       |        (len(list_distinct(toks)) / len(toks)) * 0.4
       |        + (1.0 - (len(list_filter(toks, t -> t = 'the'))
       |                  + len(list_filter(toks, t -> t = 'a'))) / len(toks))
       |          * 0.3
       |        + least(((length(text) - (len(toks) - 1)) / len(toks)) / 10.0,
       |                1.0) * 0.3, 9) AS DECIMAL(18,9)), 6) AS DOUBLE) >= 0.6
       |      THEN 1 ELSE 0 END AS DECIMAL(1,0)) AS y,
       |    CAST(round(CAST(len(list_filter(toks, t -> t = 'the')) * 10
       |      AS DOUBLE) / len(toks), 6) AS DECIMAL(8,6)) AS x1q,
       |    CAST(len(toks) AS DECIMAL(6,0)) * CAST(0.01 AS DECIMAL(3,2)) AS x2q
       |  FROM tq
       |), bt0 AS (
       |  SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1,
       |         CAST(0.0 AS DOUBLE) AS b2
       |), ${(1 to LrRounds).map(t => lrRoundSql(t)).mkString(", ")}""".stripMargin

  /** The additive half of `text_lexical_diversity`: per-(source,
    * token) counts — sum-mergeable (`stream_lexical_diversity`'s hash
    * proof); zero rows on empty input (key-grouped).
    */
  private[graft] def lexdivCells(d: org.apache.spark.sql.DataFrame) =
    d.select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))

  /** The diversity finish over merged (source, token, cnt) cells —
    * TTR and hapax share per source; shared by the batch query and
    * the streaming twin.
    */
  private[graft] def lexdivFinish(cells: org.apache.spark.sql.DataFrame) =
    cells.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
           count(lit(1)).as("vocab"),
           sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        round(col("vocab").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr_r"),
        round(col("hapax").cast("double") / col("vocab").cast("double"), 6)
          .as("hapax_ratio_r"))

  /** Simpson-diversity finish over merged (source, token, cnt) cells —
    * exposed so the spec can plant monopoly/all-distinct vocabularies;
    * shared cell frame with [[lexdivFinish]].
    */
  private[graft] def simpsonFinish(cells: org.apache.spark.sql.DataFrame) =
    cells.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
           count(lit(1)).as("vocab"),
           sum(col("cnt").cast("decimal(38,0)") * (col("cnt") - lit(1)))
             .as("pairs2"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        when(col("n_tokens") > 1,
          round(col("pairs2").cast("double") /
            (col("n_tokens").cast("double") *
              (col("n_tokens") - 1).cast("double")), 6)).as("simpson_r"))
      .withColumn("inv_simpson_r",
        when(col("simpson_r") > 0.0,
          round(lit(1.0) / col("simpson_r"), 6)))

  /** Good-Turing finish over merged (source, token, cnt) cells — the
    * count-of-counts table N_r (r = 1..5, densified per source so the
    * row set is scale-stable), the smoothed estimate
    * r* = (r+1)·N_{r+1}/N_r, and the missing-mass estimate
    * p₀ = N₁/N. Counts stay integer end to end; the only doubles are
    * the two output divisions. Shared cell frame with
    * [[lexdivFinish]]/[[simpsonFinish]] — a third finish, one state.
    */
  private[graft] def goodTuringFinish(cells: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = cells.sparkSession
    val cc = cells.groupBy(col("source"), col("cnt").as("r"))
      .agg(count(lit(1)).as("n_r"))
    val tot = cells.groupBy(col("source")).agg(sum(col("cnt")).as("n_tokens"))
    val rs = s.range(1L, 6L).select(col("id").as("r"))
    cc.select(col("source")).distinct()
      .crossJoin(broadcast(rs))
      .join(cc, Seq("source", "r"), "left")
      .withColumn("n_r", coalesce(col("n_r"), lit(0L)))
      .join(cc.select(col("source"), (col("r") - 1).as("r"),
        col("n_r").as("n_r1")), Seq("source", "r"), "left")
      .withColumn("n_r1", coalesce(col("n_r1"), lit(0L)))
      .join(cc.filter(col("r") === 1)
        .select(col("source"), col("n_r").as("n_1")), Seq("source"), "left")
      .join(tot, "source")
      .select(col("source"), col("r"), col("n_r"), col("n_r1"),
        when(col("n_r") > 0,
          round((col("r") + 1).cast("double") * col("n_r1").cast("double")
            / col("n_r").cast("double"), 6)).as("r_star_r"),
        round(coalesce(col("n_1"), lit(0L)).cast("double")
          / col("n_tokens").cast("double"), 6).as("p0_r"))
  }

  /** Chao1 vocabulary-richness estimate over the SAME (source,
    * token, cnt) cells — a FOURTH finish, one state: how many types
    * does the corpus REALLY have, observed + the unseen mass the
    * singleton/doubleton ratio implies. Bias-corrected form
    * V + f₁(f₁−1)/(2(f₂+1)) (defined even when f₂ = 0), plus the
    * Chao1-variance-free coverage deficit (chao1 − vocab). Integer
    * counts end to end, one tie-safe division.
    */
  private[graft] def chao1Finish(cells: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def tieSafe(c: org.apache.spark.sql.Column, dp: Int) =
      round(round(c, 12).cast("decimal(24,12)"), dp).cast("double")
    cells.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("vocab"), col("f1"), col("f2"),
        tieSafe(col("vocab").cast("double")
          + col("f1").cast("double") * (col("f1") - 1).cast("double")
            / (lit(2.0) * (col("f2") + 1).cast("double")), 6)
          .as("chao1_r"),
        tieSafe(col("f1").cast("double") * (col("f1") - 1).cast("double")
          / (lit(2.0) * (col("f2") + 1).cast("double")), 6)
          .as("unseen_r"))
  }

  /** Burstiness panel bounds: tokens must appear in ≥ MinDf docs;
    * top-K by variance-to-mean ratio.
    */
  private[graft] val BurstMinDf = 5L
  private[graft] val BurstTopK = 30

  /** Church-Gale burstiness over per-(token, doc) counts: VMR =
    * Σc²/tf − tf/N (variance-to-mean with zeros included — a Poisson
    * word scores ~1, a bursty topic word ≫ 1). The content/function
    * word diagnostic next to Zipf (rank-frequency) and Heaps
    * (vocabulary growth): bursty high-VMR tokens are topical, and a
    * dedup or quality stage weighting them differently needs this
    * table. Exact integer/decimal sufficient statistics per token;
    * one tie-safe rational final; top-K ordered on the rounded score
    * with the token tiebreak.
    */
  private[graft] def burstinessFinish(docTok: org.apache.spark.sql.DataFrame,
                                      nDocs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def tieSafe(c: org.apache.spark.sql.Column, dp: Int) =
      round(round(c, 12).cast("decimal(24,12)"), dp).cast("double")
    docTok.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tf"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"))
      .filter(col("df") >= BurstMinDf)
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("df"), col("tf").cast("long").as("tf"),
        tieSafe(col("sc2").cast("double") / col("tf").cast("double")
          - col("tf").cast("double") / col("n_docs").cast("double"), 6)
          .as("vmr_r"))
      .orderBy(col("vmr_r").desc, col("tok"))
      .limit(BurstTopK)
  }

  /** Per-doc exploded bigrams with the md5 '#novel' train/test flag —
    * the UNION-mergeable half of `text_ngram_novelty` (the streaming
    * twin appends per-batch distinct (doc_id, g, is_test) rows and
    * re-distincts; the flag is a pure doc_id hash, so every engine and
    * every micro-batch splits identically).
    */
  private[graft] def novelBigrams(d: org.apache.spark.sql.DataFrame) =
    d.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
        "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
        .as("g"))
      .withColumn("is_test",
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#novel"))), 1, 14), 16, 10).cast("long") % 5 === 4)

  /** The novelty finish over (doc_id, g, is_test) bigram rows —
    * distinct-train-set anti-membership per test doc; shared by the
    * batch query and the streaming twin (both distinct internally, so
    * duplicate bigram rows in the input are harmless).
    */
  private[graft] def novelFinish(bi: org.apache.spark.sql.DataFrame) = {
    val train = bi.filter(col("is_test") === false)
      .select(col("g")).distinct().withColumn("seen", lit(true))
    bi.filter(col("is_test"))
      .select(col("doc_id"), col("g")).distinct()
      .join(train, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_bigrams"),
           sum(when(col("seen").isNull, 1L).otherwise(0L))
             .as("novel_bigrams"))
      .select(col("doc_id"), col("n_distinct_bigrams"),
        col("novel_bigrams"),
        round(col("novel_bigrams").cast("double")
          / col("n_distinct_bigrams").cast("double"), 6).as("novelty_r"))
  }

  /** Per-token (half-A count, half-B count) cells over the md5 '#jsd'
    * corpus split — the additive half of the JSD drift gate (the
    * streaming twin sum-merges these). Zero rows on empty input
    * (key-grouped), per the partialsOf contract.
    */
  private[graft] def jsdCells(d: org.apache.spark.sql.DataFrame) =
    d.select(
        ((conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#jsd"))), 1, 14), 16, 10).cast("long") % 2) === 0)
          .as("is_a"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
           sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))

  /** The JSD finish over merged token cells — see `text_jsd_drift`'s
    * scaladoc; shared verbatim by the streaming twin.
    */
  private[graft] def jsdFinish(cells: org.apache.spark.sql.DataFrame) = {
    val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    val m = (p + q) / lit(2.0)
    val term = lit(0.5) * when(col("ca") > 0, p * log(p / m))
        .otherwise(lit(0.0)) +
      lit(0.5) * when(col("cb") > 0, q * log(q / m)).otherwise(lit(0.0))
    cells.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("vocab"),
        max(col("na")).as("n_tokens_a"), max(col("nb")).as("n_tokens_b"),
        sum(round(term, 12).cast("decimal(28,12)")).as("jsd_sum"))
      .select(col("vocab"), col("n_tokens_a"), col("n_tokens_b"),
        round(col("jsd_sum").cast("double"), 6).as("jsd_r"),
        round(col("jsd_sum").cast("double") / lit(0.693147181), 6)
          .as("jsd_norm_r"))
  }

  val oracleSql: Map[String, String] = Map(

    // the LM chain is text_bigram_lm's oracle verbatim (as a
    // subquery); the rank may use the single-partition window the
    // engine avoids, the thirds are the same integer arithmetic
    "pipeline_ccnet_buckets" ->
      s"""WITH lm AS (
         |  SELECT doc_id, avg_logprob_r
         |  FROM ($bigramLmSql) t0
         |), n AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM lm
         |), r AS (
         |  SELECT doc_id, avg_logprob_r,
         |    row_number() OVER (ORDER BY avg_logprob_r DESC, doc_id) AS grn
         |  FROM lm
         |)
         |SELECT r.doc_id, r.avg_logprob_r,
         |  CASE WHEN r.grn * 3 <= n.n THEN 'head'
         |       WHEN r.grn * 3 <= n.n * 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM r CROSS JOIN n""".stripMargin,

    // same '#novel' hash split, same distinct-bigram sets, same
    // anti-membership left join
    // same md5 doc order (a plain global window here — the oracle may
    // use what the engine must not), same first-occurrence histogram,
    // same integer checkpoints, same 9-dp logs / 12-dp products and
    // fixed-order OLS — term-for-term
    "text_heaps_law" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    md5(concat(CAST(doc_id AS VARCHAR), '#heaps')) AS hk,
        |    string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, toks,
        |    CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT) AS rn,
        |    CAST(sum(n_toks) OVER (ORDER BY hk, doc_id) AS BIGINT) AS cumtok
        |  FROM d
        |), nd AS (SELECT max(rn) AS nd FROM o
        |), cps AS (
        |  SELECT CAST(k AS BIGINT) AS k,
        |    CAST((nd.nd * k + 9) // 10 AS BIGINT) AS dk
        |  FROM nd, generate_series(1, 10) t(k)
        |), fo AS (
        |  SELECT tok, min(rn) AS frn
        |  FROM o, unnest(toks) AS u(tok) GROUP BY 1
        |), foh AS (
        |  SELECT frn, CAST(count(*) AS BIGINT) AS cnt FROM fo GROUP BY 1
        |), vk AS (
        |  SELECT c.k, c.dk, CAST(sum(f.cnt) AS BIGINT) AS vocab
        |  FROM foh f JOIN cps c ON f.frn <= c.dk GROUP BY 1, 2
        |), pts AS (
        |  SELECT vk.k, vk.dk AS docs, o.cumtok AS tokens, vk.vocab,
        |    round(ln(CAST(o.cumtok AS DOUBLE)), 9) AS x,
        |    round(ln(CAST(vk.vocab AS DOUBLE)), 9) AS y
        |  FROM vk JOIN o ON o.rn = vk.dk
        |), fit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np,
        |    sum(CAST(x AS DECIMAL(28,9))) AS sx,
        |    sum(CAST(y AS DECIMAL(28,9))) AS sy,
        |    sum(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS sxy,
        |    sum(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS sxx
        |  FROM pts
        |), b AS (
        |  SELECT np, sx, sy,
        |    (CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(np AS DOUBLE))
        |    / (CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(np AS DOUBLE))
        |      AS beta
        |  FROM fit
        |)
        |SELECT pts.k, pts.docs, pts.tokens, pts.vocab,
        |  round(b.beta, 6) AS beta_r,
        |  round(CAST(b.sy AS DOUBLE) / CAST(b.np AS DOUBLE)
        |    - b.beta * (CAST(b.sx AS DOUBLE) / CAST(b.np AS DOUBLE)), 6)
        |    AS lnk_r
        |FROM pts CROSS JOIN b""".stripMargin,

    // same md5 split, same union-vocabulary cells, same guarded
    // ½p·ln(p/m) terms 12-dp-quantized before the decimal sum, same
    // frozen ln 2 — term-for-term
    "text_jsd_drift" ->
      """WITH tk AS (
        |  SELECT
        |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
        |      '#jsd')), 1, 14)) AS BIGINT) % 2 = 0 AS is_a,
        |    tok
        |  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
        |), cells AS (
        |  SELECT tok,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM tk GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM cells
        |), tm AS (
        |  SELECT
        |    CAST(round(
        |      0.5 * (CASE WHEN ca > 0 THEN
        |        (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) *
        |        ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) /
        |           ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |             + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
        |        ELSE 0.0 END)
        |      + 0.5 * (CASE WHEN cb > 0 THEN
        |        (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) *
        |        ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) /
        |           ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |             + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
        |        ELSE 0.0 END), 12) AS DECIMAL(28,12)) AS term,
        |    na, nb
        |  FROM cells CROSS JOIN tot
        |)
        |SELECT CAST(count(*) AS BIGINT) AS vocab,
        |  max(na) AS n_tokens_a, max(nb) AS n_tokens_b,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS jsd_r,
        |  round(CAST(sum(term) AS DOUBLE) / 0.693147181, 6) AS jsd_norm_r
        |FROM tm""".stripMargin,

    "text_ngram_novelty" ->
      s"""$toksCte, bi AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
         |      '#novel')), 1, 14)) AS BIGINT) % 5 = 4 AS is_test,
         |    g
         |  FROM d, unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS u(g)
         |  WHERE len(toks) >= 2
         |), train AS (
         |  SELECT DISTINCT g FROM bi WHERE NOT is_test
         |), test AS (
         |  SELECT DISTINCT doc_id, g FROM bi WHERE is_test
         |)
         |SELECT te.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         |  CAST(sum(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS novel_bigrams,
         |  round(CAST(sum(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 6) AS novelty_r
         |FROM test te LEFT JOIN train tr ON te.g = tr.g
         |GROUP BY 1""".stripMargin,

    // same LSH edge chain (DedupQueries.lshEdgeCtes — the artifact's
    // SQL twin), same clipped-count joins, same 9-dp BP/√ quantization
    // before the product; doubles CAST explicitly (DuckDB parses bare
    // literals as DECIMAL)
    "text_bleu_pairs" ->
      s"""WITH ${DedupQueries.lshEdgeCtes}, tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), uni AS (
         |  SELECT doc_id, token AS g, CAST(count(*) AS BIGINT) AS c
         |  FROM tk, unnest(t) AS u(token) GROUP BY 1, 2
         |), big AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
         |  FROM tk, unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i + 1])) AS u(g)
         |  WHERE len(t) >= 2 GROUP BY 1, 2
         |), lens AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM tk
         |), p1 AS (
         |  SELECT e.doc_a, e.doc_b,
         |    CAST(sum(least(a.c, coalesce(b.c, 0))) AS BIGINT) AS m1,
         |    CAST(sum(a.c) AS BIGINT) AS t1
         |  FROM edges e
         |  JOIN uni a ON a.doc_id = e.doc_a
         |  LEFT JOIN uni b ON b.doc_id = e.doc_b AND b.g = a.g
         |  GROUP BY 1, 2
         |), p2 AS (
         |  SELECT e.doc_a, e.doc_b,
         |    CAST(sum(least(a.c, coalesce(b.c, 0))) AS BIGINT) AS m2,
         |    CAST(sum(a.c) AS BIGINT) AS t2
         |  FROM edges e
         |  JOIN big a ON a.doc_id = e.doc_a
         |  LEFT JOIN big b ON b.doc_id = e.doc_b AND b.g = a.g
         |  GROUP BY 1, 2
         |), f AS (
         |  SELECT p1.doc_a, p1.doc_b,
         |    CAST(p1.m1 AS DOUBLE) / CAST(p1.t1 AS DOUBLE) AS p1_d,
         |    CASE WHEN p2.t2 IS NOT NULL AND p2.t2 > 0
         |      THEN CAST(p2.m2 AS DOUBLE) / CAST(p2.t2 AS DOUBLE)
         |      ELSE CAST(0.0 AS DOUBLE) END AS p2_d,
         |    la.n AS len_a, lb.n AS len_b
         |  FROM p1
         |  LEFT JOIN p2 ON p2.doc_a = p1.doc_a AND p2.doc_b = p1.doc_b
         |  JOIN lens la ON la.doc_id = p1.doc_a
         |  JOIN lens lb ON lb.doc_id = p1.doc_b
         |)
         |SELECT doc_a, doc_b,
         |  round(p1_d, 6) AS p1_r, round(p2_d, 6) AS p2_r,
         |  round(round(CASE WHEN len_a >= len_b THEN CAST(1.0 AS DOUBLE)
         |      ELSE exp(CAST(1.0 AS DOUBLE)
         |        - CAST(len_b AS DOUBLE) / CAST(len_a AS DOUBLE)) END, 9)
         |    * round(sqrt(p1_d * p2_d), 9), 6) AS bleu2_r
         |FROM f""".stripMargin,

    // same LSH edge chain and clipped-bigram joins as the BLEU
    // oracle, read recall-side against the reference length
    "text_rouge_pairs" ->
      s"""WITH ${DedupQueries.lshEdgeCtes}, tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), big AS (
         |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
         |  FROM tk, unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i + 1])) AS u(g)
         |  WHERE len(t) >= 2 GROUP BY 1, 2
         |), lens AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM tk
         |), p2 AS (
         |  SELECT e.doc_a, e.doc_b,
         |    CAST(sum(least(a.c, coalesce(b.c, 0))) AS BIGINT) AS m2,
         |    CAST(sum(a.c) AS BIGINT) AS t2
         |  FROM edges e
         |  JOIN big a ON a.doc_id = e.doc_a
         |  LEFT JOIN big b ON b.doc_id = e.doc_b AND b.g = a.g
         |  GROUP BY 1, 2
         |), f AS (
         |  SELECT p2.doc_a, p2.doc_b,
         |    CASE WHEN p2.t2 > 0
         |      THEN CAST(p2.m2 AS DOUBLE) / CAST(p2.t2 AS DOUBLE)
         |      ELSE CAST(0.0 AS DOUBLE) END AS prec_d,
         |    CASE WHEN lb.n > 1
         |      THEN CAST(p2.m2 AS DOUBLE) / CAST(lb.n - 1 AS DOUBLE)
         |      ELSE CAST(0.0 AS DOUBLE) END AS rec_d
         |  FROM p2 JOIN lens lb ON lb.doc_id = p2.doc_b
         |)
         |SELECT doc_a, doc_b,
         |  round(prec_d, 6) AS p2_r, round(rec_d, 6) AS rec2_r,
         |  CASE WHEN prec_d + rec_d > 0.0
         |    THEN round(2.0 * prec_d * rec_d / (prec_d + rec_d), 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS f2_r
         |FROM f""".stripMargin,

    // the same (source, token, cnt) cells, count-of-counts finish on
    // the densified 1..5 r-grid
    "text_good_turing" ->
      """WITH c AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents, unnest(string_split(text, ' ')) AS u(token)
        |  GROUP BY 1, 2
        |), cc AS (
        |  SELECT source, cnt AS r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM c GROUP BY 1, 2
        |), tot AS (
        |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens
        |  FROM c GROUP BY 1
        |), grid AS (
        |  SELECT s.source, g.r
        |  FROM (SELECT DISTINCT source FROM c) s
        |  CROSS JOIN (SELECT CAST(unnest([1,2,3,4,5]) AS BIGINT) AS r) g
        |), f AS (
        |  SELECT grid.source, grid.r,
        |    CAST(coalesce(a.n_r, 0) AS BIGINT) AS n_r,
        |    CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r1
        |  FROM grid
        |  LEFT JOIN cc a ON a.source = grid.source AND a.r = grid.r
        |  LEFT JOIN cc b ON b.source = grid.source AND b.r = grid.r + 1
        |)
        |SELECT f.source, f.r, f.n_r, f.n_r1,
        |  CASE WHEN f.n_r > 0 THEN
        |    round(CAST(f.r + 1 AS DOUBLE) * CAST(f.n_r1 AS DOUBLE)
        |      / CAST(f.n_r AS DOUBLE), 6) END AS r_star_r,
        |  round(CAST(coalesce(s1.n_1, 0) AS DOUBLE)
        |    / CAST(tot.n_tokens AS DOUBLE), 6) AS p0_r
        |FROM f
        |JOIN tot ON tot.source = f.source
        |LEFT JOIN (SELECT source, n_r AS n_1 FROM cc WHERE r = 1) s1
        |  ON s1.source = f.source""".stripMargin,

    // same per-(token, doc) counts, same exact moments, same
    // HAVING-df gate, same tie-safe VMR and (score, token) order
    "text_burstiness" ->
      """WITH dt AS (
        |  SELECT token AS tok, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM documents, unnest(string_split(text, ' ')) AS u(token)
        |  GROUP BY 1, 2
        |), nd AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
        |), per AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c) AS BIGINT) AS tf,
        |    sum(CAST(c AS HUGEINT) * c) AS sc2
        |  FROM dt GROUP BY 1 HAVING count(*) >= 5
        |)
        |SELECT tok, df, tf,
        |  CAST(round(CAST(round(CAST(sc2 AS DOUBLE) / CAST(tf AS DOUBLE)
        |    - CAST(tf AS DOUBLE) / CAST(nd.n_docs AS DOUBLE), 12)
        |    AS DECIMAL(24,12)), 6) AS DOUBLE) AS vmr_r
        |FROM per CROSS JOIN nd
        |ORDER BY vmr_r DESC, tok
        |LIMIT 30""".stripMargin,

    // the same (source, token, cnt) cells, the bias-corrected
    // singleton/doubleton estimator, same tie-safe division
    "text_chao1" ->
      """WITH c AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents, unnest(string_split(text, ' ')) AS u(token)
        |  GROUP BY 1, 2
        |), a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM c GROUP BY 1
        |)
        |SELECT source, vocab, f1, f2,
        |  CAST(round(CAST(round(CAST(vocab AS DOUBLE)
        |    + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
        |      / (2.0 * CAST(f2 + 1 AS DOUBLE)), 12)
        |    AS DECIMAL(24,12)), 6) AS DOUBLE) AS chao1_r,
        |  CAST(round(CAST(round(
        |    CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
        |      / (2.0 * CAST(f2 + 1 AS DOUBLE)), 12)
        |    AS DECIMAL(24,12)), 6) AS DOUBLE) AS unseen_r
        |FROM a""".stripMargin,

    // the quality chain is text_quality's oracle verbatim; the
    // interleave key and both ranks are plain window SQL (the oracle
    // may use the single-partition windows the engine avoids)
    "pipeline_curriculum" ->
      s"""$toksCte, q AS (
         |  SELECT doc_id, lang,
         |    len(list_distinct(toks)) / len(toks) AS ttr,
         |    (len(list_filter(toks, t -> t = 'the')) + len(list_filter(toks, t -> t = 'a'))) / len(toks) AS stop_ratio,
         |    (length(text) - (len(toks) - 1)) / len(toks) AS mean_len
         |  FROM d
         |), ql AS (
         |  SELECT doc_id, lang,
         |    CAST(round(CAST(round(ttr * 0.4 + (1.0 - stop_ratio) * 0.3
         |          + least(mean_len / 10.0, 1.0) * 0.3, 9)
         |        AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality
         |  FROM q
         |), st AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY quality DESC, doc_id) AS srn,
         |    count(*) OVER (PARTITION BY lang) AS cnt
         |  FROM ql
         |), fr AS (
         |  SELECT doc_id, lang,
         |    (2.0 * CAST(srn AS DOUBLE) - 1.0)
         |      / (2.0 * CAST(cnt AS DOUBLE)) AS frac
         |  FROM st
         |)
         |SELECT doc_id, lang,
         |  CAST(row_number() OVER w AS BIGINT) AS curriculum_rank,
         |  CAST(ntile(4) OVER w AS BIGINT) AS stage
         |FROM fr WINDOW w AS (ORDER BY frac, lang, doc_id)""".stripMargin,

    // the P_KN finish is the same fixed-order IEEE chain over the
    // same integer counts; round(…, 9) quantizes identically
    "text_kneser_ney" ->
      s"""$toksCte, bi AS (
         |  SELECT b.w1 AS w1, b.w2 AS w2
         |  FROM d, unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS t(b)
         |  WHERE len(toks) >= 2
         |), c12 AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY 1, 2
         |), lft AS (
         |  SELECT w1, CAST(count(*) AS BIGINT) AS c1,
         |    CAST(count(DISTINCT w2) AS BIGINT) AS n1f
         |  FROM bi GROUP BY 1
         |), rgt AS (
         |  SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS n1b
         |  FROM bi GROUP BY 1
         |), na AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_all FROM c12
         |), scored AS (
         |  SELECT c12.w1, c12.w2, c12.c12, lft.c1, lft.n1f, rgt.n1b,
         |    round(
         |      greatest(CAST(c12.c12 AS DOUBLE) - $KnDiscount, 0.0)
         |        / CAST(lft.c1 AS DOUBLE)
         |      + ($KnDiscount * CAST(lft.n1f AS DOUBLE)
         |          / CAST(lft.c1 AS DOUBLE))
         |        * (CAST(rgt.n1b AS DOUBLE) / CAST(na.n_all AS DOUBLE)),
         |      9) AS pkn_r,
         |    row_number() OVER (ORDER BY c12.c12 DESC, c12.w1, c12.w2)
         |      AS rank
         |  FROM c12 JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN na
         |)
         |SELECT CAST(rank AS BIGINT) AS rank, w1, w2, c12, c1, n1f, n1b,
         |  pkn_r
         |FROM scored WHERE rank <= 20""".stripMargin,

    // same design matrix, same 9-dp sigmoid quantization + exact
    // decimal Newton partials, same cofactor solve and 9-dp β
    // trajectory, same scoring pass
    "text_quality_lr" -> (lrChainPrefixSql +
      s""",
         |sc AS (
         |  SELECT *, ((b0 + b1 * x1) + b2 * x2) AS z,
         |    1.0 / (1.0 + exp(-((b0 + b1 * x1) + b2 * x2))) AS p
         |  FROM (
         |    SELECT f.y, CAST(f.x1q AS DOUBLE) AS x1,
         |      CAST(f.x2q AS DOUBLE) AS x2, b.b0, b.b1, b.b2
         |    FROM f CROSS JOIN bt$LrRounds b)
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  round(max(b0), 6) AS b0_r, round(max(b1), 6) AS b1_r,
         |  round(max(b2), 6) AS b2_r,
         |  round(-CAST(sum(CAST(round(CASE WHEN y = 1 THEN ln(p)
         |    ELSE ln(1.0 - p) END, 12) AS DECIMAL(38,12))) AS DOUBLE)
         |    / count(*), 6) AS ll_r,
         |  round(CAST(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS acc_r
         |FROM sc""".stripMargin),

    // same per-(token, class) counts, same 9-dp-quantized Laplace
    // log-probs, same exact decimal score sums and decision compare
    "text_quality_nb" ->
      """WITH tq AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
        |), lab AS (
        |  SELECT doc_id,
        |    CASE WHEN CAST(round(CAST(round(
        |        (len(list_distinct(toks)) / len(toks)) * 0.4
        |        + (1.0 - (len(list_filter(toks, t -> t = 'the'))
        |                  + len(list_filter(toks, t -> t = 'a'))) / len(toks))
        |          * 0.3
        |        + least(((length(text) - (len(toks) - 1)) / len(toks)) / 10.0,
        |                1.0) * 0.3, 9) AS DECIMAL(18,9)), 6) AS DOUBLE) >= 0.6
        |      THEN 1 ELSE 0 END AS y
        |  FROM tq
        |), lt AS (
        |  SELECT tq.doc_id, lab.y, unnest(tq.toks) AS tok
        |  FROM tq JOIN lab USING (doc_id)
        |), docs AS (
        |  SELECT DISTINCT doc_id, y FROM lt
        |), model AS (
        |  SELECT tok, sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS c0
        |  FROM lt GROUP BY 1
        |), consts AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c0) AS BIGINT) AS t0,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM model
        |), pri AS (
        |  SELECT CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        |  FROM docs
        |), pr AS (
        |  SELECT
        |    CAST(round(ln(CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)), 9)
        |      AS DECIMAL(18,9)) AS prior1,
        |    CAST(round(ln(CAST(n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)), 9)
        |      AS DECIMAL(18,9)) AS prior0
        |  FROM pri
        |), lp AS (
        |  SELECT tok,
        |    CAST(round(ln(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE)), 9)
        |      AS DECIMAL(18,9)) AS lp1,
        |    CAST(round(ln(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + v AS DOUBLE)), 9)
        |      AS DECIMAL(18,9)) AS lp0
        |  FROM model CROSS JOIN consts
        |), sc AS (
        |  SELECT lt.doc_id, lt.y, sum(lp.lp1) AS s1, sum(lp.lp0) AS s0
        |  FROM lt JOIN lp USING (tok) GROUP BY 1, 2
        |), p2 AS (
        |  SELECT y, CASE WHEN s1 + pr.prior1 > s0 + pr.prior0
        |    THEN 1 ELSE 0 END AS pred
        |  FROM sc CROSS JOIN pr
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  (SELECT v FROM consts) AS v_size,
        |  round(CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS acc_r
        |FROM p2""".stripMargin,

    // per fold: the same round chains over the md5-fold-filtered
    // train CTE, the same scoring pass over the held-out CTE
    "text_quality_lr_cv" -> {
      val folds = (0L until LrCvFolds).map { k =>
        val trainTest =
          s"""ftr_$k AS MATERIALIZED (
             |  SELECT * FROM fb WHERE fold <> $k
             |), fte_$k AS (
             |  SELECT * FROM fb WHERE fold = $k
             |)""".stripMargin
        val rounds = (1 to LrRounds.toInt)
          .map(t => lrRoundSql(t, s"_${k}_", s"ftr_$k")).mkString(", ")
        val score =
          s"""sc_$k AS (
             |  SELECT *, ((b0 + b1 * x1) + b2 * x2) AS z,
             |    1.0 / (1.0 + exp(-((b0 + b1 * x1) + b2 * x2))) AS p
             |  FROM (
             |    SELECT f.y, CAST(f.x1q AS DOUBLE) AS x1,
             |      CAST(f.x2q AS DOUBLE) AS x2, b.b0, b.b1, b.b2
             |    FROM fte_$k f CROSS JOIN bt_${k}_$LrRounds b)
             |), out_$k AS (
             |  SELECT CAST($k AS BIGINT) AS fold,
             |    CAST(count(*) AS BIGINT) AS n_test,
             |    round(max(b0), 6) AS b0_r, round(max(b1), 6) AS b1_r,
             |    round(max(b2), 6) AS b2_r,
             |    round(-CAST(sum(CAST(round(CASE WHEN y = 1 THEN ln(p)
             |      ELSE ln(1.0 - p) END, 12) AS DECIMAL(38,12))) AS DOUBLE)
             |      / count(*), 6) AS ll_r,
             |    round(CAST(sum(CASE WHEN (z > 0) = (y = 1) THEN 1 ELSE 0 END)
             |      AS DOUBLE) / count(*), 6) AS acc_r
             |  FROM sc_$k
             |)""".stripMargin
        s"$trainTest, $rounds, $score"
      }.mkString(", ")
      val unioned = (0L until LrCvFolds)
        .map(k => s"SELECT * FROM out_$k").mkString("\nUNION ALL\n")
      lrChainPrefixSql +
        s""",
           |fb AS MATERIALIZED (
           |  SELECT *,
           |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
           |      '#fold')), 1, 14)) AS BIGINT) % $LrCvFolds AS fold
           |  FROM f
           |), """.stripMargin + folds + "\n" + unioned
    },

    // same chain to the final β, same decile cut and 12-dp quantized
    // mean-p sums
    "text_quality_lr_calibration" -> (lrChainPrefixSql +
      s""",
         |cal AS (
         |  SELECT *, 1.0 / (1.0 + exp(-((b0 + b1 * x1) + b2 * x2))) AS p
         |  FROM (
         |    SELECT f.y, CAST(f.x1q AS DOUBLE) AS x1,
         |      CAST(f.x2q AS DOUBLE) AS x2, b.b0, b.b1, b.b2
         |    FROM f CROSS JOIN bt$LrRounds b)
         |), buck AS (
         |  SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bucket, p, y
         |  FROM cal
         |)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_b,
         |  round(CAST(sum(CAST(round(p, 12) AS DECIMAL(38,12))) AS DOUBLE)
         |    / count(*), 6) AS avg_p_r,
         |  round(CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS pos_rate_r
         |FROM buck GROUP BY 1""".stripMargin),

    // same chain to the final β, same decile buckets, the widened
    // (Σp, Σp², Σp·y, pos) cells and the 9-dp-quantized Murphy terms
    "text_quality_brier" -> (lrChainPrefixSql +
      s""",
         |cal AS (
         |  SELECT *, 1.0 / (1.0 + exp(-((b0 + b1 * x1) + b2 * x2))) AS p
         |  FROM (
         |    SELECT f.y, CAST(f.x1q AS DOUBLE) AS x1,
         |      CAST(f.x2q AS DOUBLE) AS x2, b.b0, b.b1, b.b2
         |    FROM f CROSS JOIN bt$LrRounds b)
         |), b2 AS (
         |  SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bucket,
         |    CAST(round(p, 12) AS DECIMAL(14,12)) AS pq, y
         |  FROM cal
         |), cells AS (
         |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_b,
         |    sum(pq) AS ps, sum(pq * pq) AS ps2,
         |    sum(CASE WHEN y = 1 THEN pq
         |        ELSE CAST(0 AS DECIMAL(14,12)) END) AS pspos,
         |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos
         |  FROM b2 GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(n_b) AS BIGINT) AS n,
         |    CAST(sum(pos) AS BIGINT) AS pos_t,
         |    sum(ps2) AS ps2_t, sum(pspos) AS pspos_t
         |  FROM cells
         |), terms AS (
         |  SELECT c.n_b, t.n, t.pos_t, t.ps2_t, t.pspos_t,
         |    CAST(round(CAST(c.n_b AS DOUBLE)
         |      * (CAST(c.ps AS DOUBLE) / c.n_b - CAST(c.pos AS DOUBLE) / c.n_b)
         |      * (CAST(c.ps AS DOUBLE) / c.n_b - CAST(c.pos AS DOUBLE) / c.n_b)
         |      , 9) AS DECIMAL(24,9)) AS rel_t,
         |    CAST(round(CAST(c.n_b AS DOUBLE)
         |      * (CAST(c.pos AS DOUBLE) / c.n_b
         |          - CAST(t.pos_t AS DOUBLE) / t.n)
         |      * (CAST(c.pos AS DOUBLE) / c.n_b
         |          - CAST(t.pos_t AS DOUBLE) / t.n)
         |      , 9) AS DECIMAL(24,9)) AS res_t
         |  FROM cells c CROSS JOIN tot t
         |)
         |SELECT max(n) AS n,
         |  round((CAST(max(ps2_t) AS DOUBLE) - 2.0 * CAST(max(pspos_t) AS DOUBLE)
         |    + CAST(max(pos_t) AS DOUBLE)) / CAST(max(n) AS DOUBLE), 6)
         |    AS brier_r,
         |  round(CAST(sum(rel_t) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
         |    AS reliability_r,
         |  round(CAST(sum(res_t) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
         |    AS resolution_r,
         |  round((CAST(max(pos_t) AS DOUBLE) / CAST(max(n) AS DOUBLE))
         |    * (1.0 - CAST(max(pos_t) AS DOUBLE) / CAST(max(n) AS DOUBLE)), 6)
         |    AS uncertainty_r
         |FROM terms""".stripMargin),

    "text_chunk" ->
      s"""SELECT d.doc_id,
         |  CAST(g.s // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(g.s AS BIGINT) AS start_pos,
         |  substr(d.text, CAST(g.s AS INT) + 1, $ChunkSize) AS chunk_text,
         |  CAST(length(substr(d.text, CAST(g.s AS INT) + 1, $ChunkSize)) AS BIGINT) AS chunk_len
         |FROM documents d,
         |  unnest(generate_series(0, length(d.text) - 1, $ChunkStride)) g(s)
         |WHERE length(d.text) > 0""".stripMargin,

    "text_stats" ->
      s"""$toksCte
         |SELECT doc_id, n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  len(list_distinct(toks)) / len(toks) AS ttr,
         |  round((length(text) - (len(toks) - 1)) / len(toks), 6) AS mean_token_len
         |FROM d""".stripMargin,

    "text_quality" ->
      s"""$toksCte, q AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    len(list_distinct(toks)) / len(toks) AS ttr,
         |    (len(list_filter(toks, t -> t = 'the')) + len(list_filter(toks, t -> t = 'a'))) / len(toks) AS stop_ratio,
         |    (length(text) - (len(toks) - 1)) / len(toks) AS mean_len
         |  FROM d
         |)
         |SELECT doc_id, round(ttr, 6) AS ttr, round(stop_ratio, 6) AS stop_ratio,
         |  CAST(round(CAST(round(ttr * 0.4 + (1.0 - stop_ratio) * 0.3 + least(mean_len / 10.0, 1.0) * 0.3, 9) AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality
         |FROM q""".stripMargin,

    // the text_quality chain + the rank-sum identity over per-score
    // integer aggregates; every division is a single IEEE double op
    // over integers
    "text_quality_auc" ->
      s"""$toksCte, q AS (
         |  SELECT doc_id, lang,
         |    len(list_distinct(toks)) / len(toks) AS ttr,
         |    (len(list_filter(toks, t -> t = 'the')) + len(list_filter(toks, t -> t = 'a'))) / len(toks) AS stop_ratio,
         |    (length(text) - (len(toks) - 1)) / len(toks) AS mean_len
         |  FROM d
         |), qual AS (
         |  SELECT doc_id,
         |    CAST(round(CAST(round(ttr * 0.4 + (1.0 - stop_ratio) * 0.3 + least(mean_len / 10.0, 1.0) * 0.3, 9) AS DECIMAL(18,9)), 6) AS DOUBLE) AS quality,
         |    (lang = 'en') AS is_pos
         |  FROM q
         |), sg AS (
         |  SELECT quality,
         |    CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         |    CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
         |  FROM qual GROUP BY 1
         |), cum AS (
         |  SELECT *, CAST(coalesce(sum(nn) OVER (ORDER BY quality
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_nn
         |  FROM sg
         |), agg AS (
         |  SELECT CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
         |    CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg
         |  FROM cum
         |), conf AS (
         |  SELECT
         |    CAST(sum(CASE WHEN is_pos AND quality >= CAST(0.6 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN NOT is_pos AND quality >= CAST(0.6 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN is_pos AND quality < CAST(0.6 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN NOT is_pos AND quality < CAST(0.6 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM qual
         |)
         |SELECT a.n_pos, a.n_neg,
         |  round(CAST(a.u2 AS DOUBLE) / CAST(2 * a.n_pos * a.n_neg AS DOUBLE), 9)
         |    AS auc_r,
         |  c.tp, c.fp, c.fn, c.tn,
         |  round(CAST(c.tp AS DOUBLE) / CAST(c.tp + c.fp AS DOUBLE), 6) AS precision_r,
         |  round(CAST(c.tp AS DOUBLE) / CAST(c.tp + c.fn AS DOUBLE), 6) AS recall_r,
         |  round(CAST(2 * c.tp AS DOUBLE) / CAST(2 * c.tp + c.fp + c.fn AS DOUBLE), 6)
         |    AS f1_r
         |FROM agg a, conf c""".stripMargin,

    // same tf/df tables, the BM25 idf with the same 9-dp round
    // lifted to decimal × integer tf, same (score DESC, token) rank
    "text_keywords" ->
      s"""$toksCte, tok AS (
         |  SELECT doc_id, token FROM d, unnest(toks) AS u(token)
         |), tf AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2
         |), df AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
         |), nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
         |), scored AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |    CAST(round(
         |      ln(CAST(1.0 AS DOUBLE) +
         |         (CAST(nd.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
         |         (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |    , 6) AS DECIMAL(18,6)) * tf.tf AS score
         |  FROM tf JOIN df USING (token) CROSS JOIN nd
         |), ranked AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, token) AS BIGINT) AS rank
         |  FROM scored
         |)
         |SELECT doc_id, rank, token, tf, df,
         |  CAST(score AS DOUBLE) AS score_r
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "text_langid" ->
      s"""$toksCte, scored AS (
         |  SELECT lang,
         |    CAST(len(list_filter(toks, t -> t = 'the')) AS BIGINT) AS cnt_en,
         |    CAST(len(list_filter(toks, t -> t = 'a')) AS BIGINT) AS cnt_es,
         |    CAST(len(list_filter(toks, t -> t = 'data')) AS BIGINT) AS cnt_de
         |  FROM d
         |)
         |SELECT lang,
         |  CASE WHEN cnt_en >= cnt_es AND cnt_en >= cnt_de THEN 'en'
         |       WHEN cnt_es >= cnt_de THEN 'es'
         |       ELSE 'de' END AS lang_pred,
         |  count(*) AS cnt
         |FROM scored
         |GROUP BY 1, 2""".stripMargin,

    // identical double expression tree (every literal CAST AS DOUBLE —
    // bare decimals would route through DuckDB DECIMAL arithmetic),
    // 9-dp-quantized decimal-summed contributions, ranking on the
    // exact decimal score
    "search_ndcg" ->
      s"""$toksCte, tok AS (
         |  SELECT doc_id, token FROM d, unnest(toks) AS u(token)
         |), dl AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
         |), st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
         |), hits AS (
         |  SELECT doc_id, token FROM tok
         |  WHERE token IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |), btf AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM hits GROUP BY 1, 2
         |), bdf AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, token FROM hits) GROUP BY 1
         |), bscored AS (
         |  SELECT btf.doc_id,
         |    CAST(round(
         |      ln(CAST(1.0 AS DOUBLE) +
         |         (CAST(st.n_docs - bdf.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
         |         (CAST(bdf.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |      *
         |      (CAST(btf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE) /
         |       (CAST(btf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |        (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
         |         CAST(0.75 AS DOUBLE) *
         |          (CAST(dl.dl AS DOUBLE) /
         |           (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))))
         |    , 9) AS DECIMAL(28,9)) AS contrib_q
         |  FROM btf
         |  JOIN dl ON dl.doc_id = btf.doc_id
         |  JOIN bdf ON bdf.token = btf.token
         |  CROSS JOIN st
         |), bagg AS (
         |  SELECT doc_id, sum(contrib_q) AS score_d FROM bscored GROUP BY 1
         |), topd AS (
         |  SELECT CAST(row_number() OVER (ORDER BY score_d DESC, doc_id)
         |    AS BIGINT) AS rank, doc_id
         |  FROM bagg ORDER BY score_d DESC, doc_id LIMIT $NdcgK
         |), ttf AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2
         |), nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d
         |), tidf AS (
         |  SELECT token,
         |    CAST(round(ln(CAST(nd.n_docs + 1 AS DOUBLE) /
         |                  CAST(count(*) + 1 AS DOUBLE)) + 1.0, 9)
         |         AS DECIMAL(18,9)) AS idf_q
         |  FROM ttf, nd GROUP BY token, nd.n_docs
         |), tw AS (
         |  SELECT ttf.doc_id, ttf.token,
         |    CAST(CAST(ttf.tf AS DECIMAL(9,0)) * tidf.idf_q AS DECIMAL(18,9)) AS w
         |  FROM ttf JOIN tidf USING (token)
         |), tnorms AS (
         |  SELECT doc_id, sum(w * w) AS nd2 FROM tw GROUP BY 1
         |), tq AS (
         |  SELECT token, idf_q AS qw FROM tidf
         |  WHERE token IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |), tqn AS (
         |  SELECT sum(qw * qw) AS nq2 FROM tq
         |), tdot AS (
         |  SELECT tw.doc_id, sum(tq.qw * tw.w) AS dot_d
         |  FROM tw JOIN tq ON tq.token = tw.token GROUP BY 1
         |), rel AS (
         |  SELECT tdot.doc_id,
         |    least(4, greatest(0, CAST(floor(round(
         |      CAST(tdot.dot_d AS DOUBLE) /
         |        (sqrt(CAST(tqn.nq2 AS DOUBLE)) * sqrt(CAST(tnorms.nd2 AS DOUBLE)))
         |      , 6) * 10) AS BIGINT))) AS grade
         |  FROM tdot JOIN tnorms ON tnorms.doc_id = tdot.doc_id CROSS JOIN tqn
         |), g AS (
         |  SELECT topd.rank, topd.doc_id, coalesce(rel.grade, 0) AS grade
         |  FROM topd LEFT JOIN rel USING (doc_id)
         |), gi AS (
         |  SELECT rank, grade,
         |    CAST(row_number() OVER (ORDER BY grade DESC, doc_id) AS BIGINT)
         |      AS irank
         |  FROM g
         |), disc(r, dv) AS (
         |  VALUES ${DcgDiscounts.zipWithIndex.map { case (d, i) =>
                      s"(${i + 1}, CAST('$d' AS DECIMAL(12,9)))" }.mkString(", ")}
         |), j AS (
         |  SELECT gi.grade, d1.dv AS disc, d2.dv AS idisc
         |  FROM gi JOIN disc d1 ON d1.r = gi.rank JOIN disc d2 ON d2.r = gi.irank
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  round(CAST(sum(CAST(grade AS DECIMAL(10,0)) * disc) AS DOUBLE), 6)
         |    AS dcg_r,
         |  round(CAST(sum(CAST(grade AS DECIMAL(10,0)) * idisc) AS DOUBLE), 6)
         |    AS idcg_r,
         |  CASE WHEN sum(CAST(grade AS DECIMAL(10,0)) * idisc) > 0 THEN
         |    round(CAST(sum(CAST(grade AS DECIMAL(10,0)) * disc) AS DOUBLE)
         |      / CAST(sum(CAST(grade AS DECIMAL(10,0)) * idisc) AS DOUBLE), 6)
         |  END AS ndcg_r
         |FROM j""".stripMargin,

    "text_bm25" ->
      s"""$toksCte, tok AS (
         |  SELECT doc_id, token FROM d, unnest(toks) AS u(token)
         |), dl AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
         |), st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
         |), hits AS (
         |  SELECT doc_id, token FROM tok
         |  WHERE token IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |), tf AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM hits GROUP BY 1, 2
         |), df AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, token FROM hits) GROUP BY 1
         |), scored AS (
         |  SELECT tf.doc_id,
         |    CAST(round(
         |      ln(CAST(1.0 AS DOUBLE) +
         |         (CAST(st.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
         |         (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |      *
         |      (CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE) /
         |       (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |        (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) +
         |         CAST(0.75 AS DOUBLE) *
         |          (CAST(dl.dl AS DOUBLE) /
         |           (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))))
         |    , 9) AS DECIMAL(28,9)) AS contrib_q
         |  FROM tf
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  JOIN df ON df.token = tf.token
         |  CROSS JOIN st
         |), agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         |    sum(contrib_q) AS score_d
         |  FROM scored GROUP BY 1
         |)
         |SELECT CAST(row_number() OVER (ORDER BY score_d DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, n_terms_hit, round(CAST(score_d AS DOUBLE), 6) AS score_r
         |FROM agg
         |ORDER BY score_d DESC, doc_id
         |LIMIT 20""".stripMargin,

    // same add-1 bigram model, same 9-dp-quantized decimal-summed
    // log-probs (ln args are corpus-count rationals — finite domain,
    // 3-sf-verified like the BM25 idf)
    "text_bigram_lm" -> bigramLmSql,

    // same 9-dp idf quantization, same exact scale-9 weights and
    // scale-18 squares/products, same fixed-order double finish
    "search_tfidf_cosine" ->
      s"""$toksCte, tok AS (
         |  SELECT doc_id, token FROM d, unnest(toks) AS u(token)
         |), tf AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2
         |), nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d
         |), idf AS (
         |  SELECT token,
         |    CAST(round(ln(CAST(nd.n_docs + 1 AS DOUBLE) /
         |                  CAST(count(*) + 1 AS DOUBLE)) + 1.0, 9)
         |         AS DECIMAL(18,9)) AS idf_q
         |  FROM tf, nd GROUP BY token, nd.n_docs
         |), w AS (
         |  SELECT tf.doc_id, tf.token,
         |    CAST(CAST(tf.tf AS DECIMAL(9,0)) * idf.idf_q AS DECIMAL(18,9)) AS w
         |  FROM tf JOIN idf USING (token)
         |), norms AS (
         |  SELECT doc_id, sum(w * w) AS nd2 FROM w GROUP BY 1
         |), q AS (
         |  SELECT token, idf_q AS qw FROM idf
         |  WHERE token IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |), qn AS (
         |  SELECT sum(qw * qw) AS nq2 FROM q
         |), dot AS (
         |  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         |         sum(q.qw * w.w) AS dot_d
         |  FROM w JOIN q ON q.token = w.token GROUP BY 1
         |), sc AS (
         |  SELECT dot.doc_id, dot.n_terms_hit,
         |    CAST(dot.dot_d AS DOUBLE) /
         |      (sqrt(CAST(qn.nq2 AS DOUBLE)) * sqrt(CAST(norms.nd2 AS DOUBLE)))
         |      AS score
         |  FROM dot JOIN norms ON norms.doc_id = dot.doc_id CROSS JOIN qn
         |)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         |    AS rank,
         |  doc_id, n_terms_hit, round(score, 6) AS score_r
         |FROM sc
         |ORDER BY score DESC, doc_id
         |LIMIT 20""".stripMargin,

    // same parity split, same add-1 backoff via LEFT joins, same 9-dp
    // quantized decimal sums; the exp runs once per doc on the shared
    // double avg
    "text_perplexity_heldout" ->
      s"""$toksCte, train AS (
         |  SELECT doc_id, toks FROM d WHERE doc_id % 2 = 0
         |), train_bi AS (
         |  SELECT b.w1 AS w1, b.w2 AS w2
         |  FROM train, unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS t(b)
         |  WHERE len(toks) >= 2
         |), c12 AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM train_bi GROUP BY 1, 2
         |), c1 AS (
         |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM train_bi GROUP BY 1
         |), vocab AS (
         |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
         |  FROM train, unnest(toks) AS u(token)
         |), test_bi AS (
         |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
         |  FROM d, unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS t(b)
         |  WHERE len(toks) >= 2 AND doc_id % 2 = 1
         |), lp AS (
         |  SELECT test_bi.doc_id,
         |    CAST(round(ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE) /
         |                  CAST(coalesce(c1.c1, 0) + vocab.v AS DOUBLE)), 9)
         |         AS DECIMAL(28,9)) AS lp
         |  FROM test_bi
         |  LEFT JOIN c12 ON c12.w1 = test_bi.w1 AND c12.w2 = test_bi.w2
         |  LEFT JOIN c1 ON c1.w1 = test_bi.w1
         |  CROSS JOIN vocab
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob_r,
         |  round(exp(-(CAST(sum(lp) AS DOUBLE) / count(*))), 4) AS ppl_r
         |FROM lp GROUP BY 1""".stripMargin,

    // same (token, doc) grouping, same first-10 posting heads (the
    // ordered SET is engine-independent; only the selection mechanics
    // differ)
    "text_inverted_index" ->
      s"""$toksCte, tok AS (
         |  SELECT doc_id, token FROM d, unnest(toks) AS u(token)
         |), per_doc AS (
         |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2
         |), stats AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS df,
         |         CAST(sum(tf) AS BIGINT) AS cf
         |  FROM per_doc GROUP BY 1
         |), heads AS (
         |  SELECT token,
         |    array_to_string(
         |      list_transform(list(doc_id ORDER BY doc_id)[1:10],
         |                     x -> CAST(x AS VARCHAR)), ',') AS postings_head
         |  FROM per_doc GROUP BY 1
         |)
         |SELECT CAST(row_number() OVER (ORDER BY s.df DESC, s.token) AS BIGINT) AS rank,
         |  s.token, s.df, s.cf, h.postings_head
         |FROM stats s JOIN heads h ON h.token = s.token
         |ORDER BY s.df DESC, s.token
         |LIMIT 20""".stripMargin,

    "text_token_freq" ->
      s"""$toksCte
         |SELECT token, count(*) AS cnt
         |FROM d, unnest(toks) AS u(token)
         |GROUP BY token
         |ORDER BY cnt DESC, token
         |LIMIT 20""".stripMargin,

    // same (source, token) count cells, same integer hapax test, two
    // IEEE divisions
    "text_lexical_diversity" ->
      """WITH c AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents, unnest(string_split(text, ' ')) AS u(token)
        |  GROUP BY 1, 2
        |)
        |SELECT source,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  round(CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
        |    AS ttr_r,
        |  round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio_r
        |FROM c GROUP BY 1""".stripMargin,

    // the same (source, token, cnt) cells, pair-counting finish
    "text_simpson_diversity" ->
      """WITH c AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents, unnest(string_split(text, ' ')) AS u(token)
        |  GROUP BY 1, 2
        |), g AS (
        |  SELECT source,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab,
        |    sum(CAST(cnt AS DECIMAL(38,0)) * (cnt - 1)) AS pairs2
        |  FROM c GROUP BY 1
        |), d AS (
        |  SELECT source, n_tokens, vocab,
        |    CASE WHEN n_tokens > 1 THEN
        |      round(CAST(pairs2 AS DOUBLE)
        |        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)), 6)
        |    END AS simpson_r
        |  FROM g
        |)
        |SELECT source, n_tokens, vocab, simpson_r,
        |  CASE WHEN simpson_r > 0.0 THEN round(1.0 / simpson_r, 6) END
        |    AS inv_simpson_r
        |FROM d""".stripMargin,

    "text_redact" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0
         |         THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
         |         ELSE '' END
         |    || CASE WHEN doc_id % 4 = 0
         |         THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
         |         ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0
         |         THEN ' ref ID-' || CAST(doc_id * 7 AS VARCHAR)
         |         ELSE '' END AS aug
         |  FROM documents
         |), staged AS (
         |  -- counts come from the same sequential replacement pass as
         |  -- the redaction (phone counted on email-redacted text, id on
         |  -- phone-redacted) — mirrors TextOps.piiCounts
         |  SELECT doc_id, aug,
         |    regexp_replace(aug, '${TextOps.EmailPat}', '<EMAIL>', 'g') AS after_email
         |  FROM aug
         |), staged2 AS (
         |  SELECT *, regexp_replace(after_email, '${TextOps.PhonePat}', '<PHONE>', 'g') AS after_phone
         |  FROM staged
         |), counted AS (
         |  SELECT doc_id, aug,
         |    CAST(len(regexp_extract_all(aug, '${TextOps.EmailPat}')) AS BIGINT) AS n_email,
         |    CAST(len(regexp_extract_all(after_email, '${TextOps.PhonePat}')) AS BIGINT) AS n_phone,
         |    CAST(len(regexp_extract_all(after_phone, '${TextOps.IdPat}')) AS BIGINT) AS n_id
         |  FROM staged2
         |)
         |SELECT doc_id, n_email, n_phone, n_id,
         |  (n_email + n_phone + n_id = 0) AS clean,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '${TextOps.EmailPat}', '<EMAIL>', 'g'),
         |    '${TextOps.PhonePat}', '<PHONE>', 'g'),
         |    '${TextOps.IdPat}', '<ID>', 'g') AS redacted
         |FROM counted""".stripMargin,

    "text_repetition" ->
      s"""$toksCte
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(toks) < 2 THEN 0.0 ELSE
         |    round(1.0 - len(list_distinct(list_transform(
         |      generate_series(1, len(toks) - 1),
         |      i -> array_to_string(list_slice(toks, i, i + 1), ' '))))
         |      / CAST(len(toks) - 1 AS DOUBLE), 6) END AS dup_2gram_frac,
         |  CASE WHEN len(toks) < 3 THEN 0.0 ELSE
         |    round(1.0 - len(list_distinct(list_transform(
         |      generate_series(1, len(toks) - 2),
         |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))))
         |      / CAST(len(toks) - 2 AS DOUBLE), 6) END AS dup_3gram_frac,
         |  CASE WHEN len(toks) < 5 THEN 0.0 ELSE
         |    round(1.0 - len(list_distinct(list_transform(
         |      generate_series(1, len(toks) - 4),
         |      i -> array_to_string(list_slice(toks, i, i + 4), ' '))))
         |      / CAST(len(toks) - 4 AS DOUBLE), 6) END AS dup_5gram_frac
         |FROM d""".stripMargin,

    "text_c4_filters" ->
      """WITH aug AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 9 = 0 THEN ' a b c d e f g h i j k l m n o p q r s t u v w x y z 1 2 3 4 5 6 7 8 9 0' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum dolor' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' function() { return 0; }' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END AS aug
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, aug, string_split(aug, ' ') AS toks,
        |    CAST(length(aug) AS BIGINT) AS n_chars,
        |    CAST(length(regexp_replace(aug, '[^#{}();]', '', 'g')) AS BIGINT) AS n_sym
        |  FROM aug
        |), g AS (
        |  SELECT doc_id, aug, n_chars, n_sym,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(toks, t -> t = 'the'))
        |       + len(list_filter(toks, t -> t = 'a')) AS BIGINT) AS n_stop,
        |    CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_2gram,
        |    CAST(len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 1), ' ')))) AS BIGINT) AS n_2distinct
        |  FROM f
        |), flags AS (
        |  SELECT doc_id, n_words,
        |    (n_words >= 50 AND n_words <= 100000) AS ok_n_words,
        |    ((n_chars - (n_words - 1)) / n_words >= 3.0
        |     AND (n_chars - (n_words - 1)) / n_words <= 10.0) AS ok_mean_word_len,
        |    (n_stop >= 2) AS ok_stopwords,
        |    (n_sym / CAST(n_chars AS DOUBLE) <= 0.01) AS ok_symbol_ratio,
        |    (right(aug, 1) IN ('.', '!', '?')) AS ok_terminal_punct,
        |    (NOT contains(aug, 'lorem ipsum')) AS ok_no_lorem,
        |    (NOT contains(aug, '{')) AS ok_no_braces,
        |    (CASE WHEN n_2gram = 0 THEN 0.0
        |          ELSE round(1.0 - n_2distinct / CAST(n_2gram AS DOUBLE), 6) END
        |       <= 0.1) AS ok_dup_2gram
        |  FROM g
        |)
        |SELECT *,
        |  (ok_n_words AND ok_mean_word_len AND ok_stopwords AND ok_symbol_ratio
        |   AND ok_terminal_punct AND ok_no_lorem AND ok_no_braces
        |   AND ok_dup_2gram) AS keep
        |FROM flags""".stripMargin,

    // same planted suffixes, same fold of the SAME MojibakeRepairs
    // constants into nested replace()s, NFC via DuckDB's native
    // nfc_normalize — the oracle leg of the Spark NfcNormalize
    // expression (both implement UAX #15 canonical composition).
    "text_normalize" ->
      s"""WITH a AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 5 = 0 THEN ${sqlLit(MojiSuffix)} ELSE '' END
         |    || CASE WHEN doc_id % 4 = 0 THEN ${sqlLit(NfdSuffix)} ELSE '' END
         |      AS raw
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, raw, $mojibakeRepairSql AS repaired FROM a
         |), n AS (
         |  SELECT doc_id, raw, repaired, nfc_normalize(repaired) AS norm FROM r
         |)
         |SELECT doc_id,
         |  CAST(length(raw) AS BIGINT) AS n_chars_raw,
         |  CAST(length(norm) AS BIGINT) AS n_chars_norm,
         |  repaired <> raw AS fixed_mojibake,
         |  norm <> repaired AS fixed_nfc,
         |  md5(norm) AS norm_fp
         |FROM n""".stripMargin,

    // list_reduce seeds with the first element, so prepend the zero to
    // match aggregate(toks, 0, …); token hash = md5-prefix mod (2^31−1).
    "text_fingerprint" ->
      s"""$toksCte
         |SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(toks, t ->
         |        CAST(concat('0x', substr(md5(t), 1, 14)) AS BIGINT) % 2147483647)),
         |    (acc, h) -> (acc * 31 + h) % 2147483647) AS fp
         |FROM d""".stripMargin,

    "text_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |), p AS (
        |  SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
        |    i -> substr(tok, i, 2))) AS pair
        |  FROM toks WHERE length(tok) >= 2
        |)
        |SELECT pair, count(*) AS cnt FROM p
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "sketch_cms_tokens" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |), hashed AS (
        |  SELECT r, (CAST(concat('0x', substr(md5(concat(token, '#cms', CAST(r AS VARCHAR))), 1, 14)) AS BIGINT)
        |             % 2147483647) % 64 AS bucket
        |  FROM toks, generate_series(0, 3) t(r)
        |), cms AS (
        |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS counter
        |  FROM hashed GROUP BY 1, 2
        |), top AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cnt_true
        |  FROM toks GROUP BY 1
        |  ORDER BY cnt_true DESC, token LIMIT 10
        |), probes AS (
        |  SELECT t.token, t.cnt_true, g.r,
        |    (CAST(concat('0x', substr(md5(concat(t.token, '#cms', CAST(g.r AS VARCHAR))), 1, 14)) AS BIGINT)
        |     % 2147483647) % 64 AS bucket
        |  FROM top t, generate_series(0, 3) g(r)
        |)
        |SELECT p.token, p.cnt_true,
        |  CAST(min(c.counter) AS BIGINT) AS cnt_cms,
        |  CAST(min(c.counter) - p.cnt_true AS BIGINT) AS overcount
        |FROM probes p JOIN cms c USING (r, bucket)
        |GROUP BY 1, 2""".stripMargin,

    // Unrolled 3-round twin: each round recomputes the winner over the
    // previous round's replaced symbols.
    "text_bpe_train" -> {
      def winnerCte(src: String, w: String) =
        s"""$w AS (
           |  SELECT p AS winner FROM (
           |    SELECT unnest(list_transform(generate_series(1, length(sym) - 1),
           |      i -> substr(sym, i, 2))) AS p
           |    FROM $src WHERE length(sym) >= 2
           |  ) GROUP BY p ORDER BY count(*) DESC, p LIMIT 1
           |)""".stripMargin
      s"""WITH s0 AS (
         |  SELECT unnest(string_split(text, ' ')) AS sym FROM documents
         |), ${winnerCte("s0", "w1")}, m1 AS (
         |  SELECT s0.sym, replace(s0.sym, w1.winner, '#') AS sym2, w1.winner
         |  FROM s0, w1
         |), s1 AS (SELECT sym2 AS sym FROM m1),
         |${winnerCte("s1", "w2")}, m2 AS (
         |  SELECT s1.sym, replace(s1.sym, w2.winner, '@') AS sym2, w2.winner
         |  FROM s1, w2
         |), s2 AS (SELECT sym2 AS sym FROM m2),
         |${winnerCte("s2", "w3")}, m3 AS (
         |  SELECT s2.sym, replace(s2.sym, w3.winner, '~') AS sym2, w3.winner
         |  FROM s2, w3
         |)
         |SELECT CAST(1 AS BIGINT) AS round, winner AS pair,
         |  CAST(sum(length(sym) - length(sym2)) AS BIGINT) AS n_applied
         |FROM m1 GROUP BY 2
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), winner,
         |  CAST(sum(length(sym) - length(sym2)) AS BIGINT)
         |FROM m2 GROUP BY 2
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), winner,
         |  CAST(sum(length(sym) - length(sym2)) AS BIGINT)
         |FROM m3 GROUP BY 2""".stripMargin
    },

    // Unrolled 10-round twin of text_bpe_train10 — the same
    // winner/replace chain generated per round (the checkpoint is a
    // Spark-side lineage policy, invisible to the data contract).
    "text_bpe_train10" -> {
      def winnerCte(src: String, w: String) =
        s"""$w AS (
           |  SELECT p AS winner FROM (
           |    SELECT unnest(list_transform(generate_series(1, length(sym) - 1),
           |      i -> substr(sym, i, 2))) AS p
           |    FROM $src WHERE length(sym) >= 2
           |  ) GROUP BY p ORDER BY count(*) DESC, p LIMIT 1
           |)""".stripMargin
      val rounds = Bpe10Placeholders.indices.map { i =>
        val r = i + 1
        s"""${winnerCte(s"s$i", s"w$r")}, m$r AS (
           |  SELECT s$i.sym, replace(s$i.sym, w$r.winner, '${Bpe10Placeholders(i)}') AS sym2, w$r.winner
           |  FROM s$i, w$r
           |), s$r AS (SELECT sym2 AS sym FROM m$r)""".stripMargin
      }.mkString(",\n")
      val sel = Bpe10Placeholders.indices.map { i =>
        val r = i + 1
        val names = if (r == 1) " AS round, winner AS pair" else ", winner"
        val alias = if (r == 1) " AS n_applied" else ""
        s"""SELECT CAST($r AS BIGINT)$names,
           |  CAST(sum(length(sym) - length(sym2)) AS BIGINT)$alias
           |FROM m$r GROUP BY 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s0 AS (
         |  SELECT unnest(string_split(text, ' ')) AS sym FROM documents
         |),
         |$rounds
         |$sel""".stripMargin
    },

    // Same winner chain, then the merges applied per document word in
    // training order — the per-doc token accounting twin.
    "text_bpe_encode" -> {
      def winnerCte(src: String, w: String) =
        s"""$w AS (
           |  SELECT p AS winner FROM (
           |    SELECT unnest(list_transform(generate_series(1, length(sym) - 1),
           |      i -> substr(sym, i, 2))) AS p
           |    FROM $src WHERE length(sym) >= 2
           |  ) GROUP BY p ORDER BY count(*) DESC, p LIMIT 1
           |)""".stripMargin
      s"""WITH s0 AS (
         |  SELECT unnest(string_split(text, ' ')) AS sym FROM documents
         |), ${winnerCte("s0", "w1")}, s1 AS (
         |  SELECT replace(s0.sym, w1.winner, '#') AS sym FROM s0, w1
         |), ${winnerCte("s1", "w2")}, s2 AS (
         |  SELECT replace(s1.sym, w2.winner, '@') AS sym FROM s1, w2
         |), ${winnerCte("s2", "w3")}, enc AS (
         |  SELECT t.doc_id, t.sym,
         |    replace(replace(replace(t.sym, w1.winner, '#'), w2.winner, '@'),
         |            w3.winner, '~') AS m
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS sym
         |        FROM documents) t, w1, w2, w3
         |)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(length(sym)) AS BIGINT) AS n_chars,
         |  CAST(sum(length(m)) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(length(m)) AS DOUBLE) /
         |        CAST(sum(length(sym)) AS DOUBLE), 6) AS compression
         |FROM enc GROUP BY doc_id""".stripMargin
    },

    "text_zipf" ->
      """WITH f AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |  ) GROUP BY token
        |), top AS (
        |  SELECT token, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |  FROM f ORDER BY cnt DESC, token LIMIT 20
        |)
        |SELECT rank, token, cnt,
        |  round(cnt / CAST((SELECT max(cnt) FROM f) AS DOUBLE), 6) AS ratio_to_top
        |FROM top""".stripMargin,

    "text_bpe_merge" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |), w AS (
        |  SELECT p AS winner FROM (
        |    SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
        |      i -> substr(tok, i, 2))) AS p
        |    FROM toks WHERE length(tok) >= 2
        |  ) GROUP BY p ORDER BY count(*) DESC, p LIMIT 1
        |), merged AS (
        |  SELECT replace(tok, winner, '#') AS sym FROM toks, w
        |), p2 AS (
        |  SELECT unnest(list_transform(generate_series(1, length(sym) - 1),
        |    i -> substr(sym, i, 2))) AS pair
        |  FROM merged WHERE length(sym) >= 2
        |)
        |SELECT pair, count(*) AS cnt FROM p2
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "text_bpe_tokens" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    regexp_extract_all(text, '${BpePattern.replace("'", "''")}') AS bpe,
         |    string_split(text, ' ') AS toks
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(bpe) AS BIGINT) AS n_bpe,
         |  CAST(len(list_distinct(bpe)) AS BIGINT) AS n_bpe_distinct,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  round(len(bpe) / CAST(len(toks) AS DOUBLE), 6) AS bpe_per_word
         |FROM b""".stripMargin
  )
}
