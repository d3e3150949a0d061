package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps
import graft.tables.Tables

/** Multimodal extension queries (SURVEY.md §2.9) over a media fixture
  * of REAL PNG payloads: `MultimodalOps.mediaTable` encodes one
  * deterministic gradient PNG per document (synthesis parameters from
  * the md5 chain), and every decode-family query runs the actual JDK
  * `ImageIO` codec on the executors via `decodePngs`. The DuckDB twins
  * compute the expected decode output in closed form from the same
  * parameters — so a green hash match proves decode(encode(params))
  * reproduced the raster pixel-for-pixel, not that two stubs agree.
  *
  * Video stays metadata-only (`n_frames`): the JDK has no video codec,
  * so frame sampling reads the container field, as a demuxer would.
  */
object MultimodalQueries {

  /** The decoded media table — encode + REAL ImageIO decode run ONCE
    * per (session, dir) and shared by every mm_* consumer (the
    * media-lake posture: decoded dimensions/statistics are a stored
    * column written beside the blobs, not recomputed per query).
    */
  private def decodedMedia(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "media_decoded") {
      MultimodalOps.decodePngs(MultimodalOps.mediaTable(s, dir).drop("source"))
    }

  /** The perceptual-hash table — pattern encode + real decode + aHash
    * once per (session, dir), shared by mm_near_dup_perceptual and
    * mm_near_dup_eval (the media-lake posture again: the signature is
    * a stored column beside the blob). Payload dropped BEFORE the
    * checkpoint — the decodedAudio lesson: checkpointing bytes beside
    * four stat longs makes the artifact data-sized in the worst way.
    */
  private def perceptualHashed(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "perceptual_hashed") {
      MultimodalOps.ahashPngs(MultimodalOps.perceptualTable(s, dir))
        .select(col("media_id"), col("width"), col("height"),
                col("sum3"), col("ahash"))
    }

  /** The decoded audio table — WAV encode + real decode once per
    * (session, dir), shared by the mm_audio_* consumers.
    */
  private def decodedAudio(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "audio_decoded") {
      // project the payload AWAY before the checkpoint: decodeWavs
      // carries the input columns through, and checkpointing the WAV
      // bytes alongside the six stat longs made the artifact
      // data-sized in the worst way (measured 19-20× at 10× payloads;
      // dropping bytes makes it |docs|×7 scalars)
      MultimodalOps.decodeWavs(MultimodalOps.audioTable(s, dir))
        .select(col("media_id"), col("n_samples"), col("sample_rate"),
          col("sum_amp"), col("sum_sq"), col("min_amp"), col("max_amp"))
    }

  /** Candidate periods (in samples) for `mm_audio_pitch` — 256 is the
    * synth waveform's true period; the others are the decoys the
    * detector must reject.
    */
  private val PitchLags = Seq(100, 200, 256, 300)

  val queries: Map[String, Q] = Map(

    // PITCH / PERIODICITY DETECTION — real DSP over the real codec's
    // output: integer MEAN-REMOVED autocorrelation of the decoded PCM
    // at four candidate lags (division-free autocovariance cov(L) =
    // (n−L)·Σs·s' − Σw1·Σw2 — raw autocorrelation is dominated by the
    // DC term (n−L)·c², which grows with SHORTER lags and mispicks
    // the period on loud-offset signals; the spec caught exactly
    // this), best period = argmax cov (tiebreak smallest lag). The
    // synth waveform's true period is 256 samples, so the detector
    // must rank it above the 100/200/300 decoys from decoded bytes
    // alone. Everything is EXACT integer arithmetic end to end
    // (16-bit samples, Long sums — no floats anywhere), so the DuckDB
    // twin regenerates the sample stream from the synthesis params
    // and matches bit-for-bit. Executor-side decode+fold in the same
    // mapPartitions batch shape as the other mm ops; no shuffle
    // before the per-row projection.
    "mm_audio_pitch" -> ((s, dir) => {
      val acf = MultimodalOps.wavAutocovs(
        MultimodalOps.audioTable(s, dir), PitchLags)
      val lagArr = array(PitchLags.map(l => lit(l.toLong)): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id"))
        .orderBy(col("r").desc, col("lag"))
      acf
        .select(col("media_id"),
          explode(arrays_zip(lagArr.as("lag"), col("acf_arr").as("r"))).as("z"))
        .select(col("media_id"), col("z.lag").as("lag"), col("z.r").as("r"))
        .withColumn("best_lag", first(col("lag")).over(w))
    }),

    // REAL decode: dims from the decoded raster (ImageIO), container
    // metadata carried through — a narrow projection over blobs.
    "mm_decode_dims" -> ((s, dir) =>
      decodedMedia(s, dir)
        .select(col("media_id"), col("kind"),
                col("width"), col("height"), col("n_frames"),
                (col("width") * col("height")).as("n_pixels"))),

    // REAL pixel statistics: per-band sums from the decoded raster and
    // integer-exact per-mille band means (the 3-dim color signature a
    // vision pipeline hands to its embedding model).
    "mm_features" -> ((s, dir) =>
      decodedMedia(s, dir)
        .select(col("media_id"), col("width"), col("height"),
                col("sum_r"), col("sum_g"), col("sum_b"),
                expr("sum_r * 1000 div (width * height)").as("mean_r_milli"),
                expr("sum_g * 1000 div (width * height)").as("mean_g_milli"),
                expr("sum_b * 1000 div (width * height)").as("mean_b_milli"))),

    // aspect-preserving resize geometry to fit 224×224 (the vision
    // preprocessing step) — integer math over the REAL decoded dims.
    "mm_resize" -> ((s, dir) =>
      decodedMedia(s, dir)
        .withColumn("rs", MultimodalOps.resizeDims(col("width"), col("height"), 224))
        .select(col("media_id"), col("width"), col("height"),
                col("rs.out_w").as("out_w"), col("rs.out_h").as("out_h"))),

    // MEDIA DEDUP composition: payload → REAL decode → pixel-statistic
    // feature vector → sign-LSH bucket → duplicate groups. Exact-copy
    // payloads decode to identical statistics and land in the same
    // bucket, so the groups are true payload duplicates (plus
    // hash-coincidental bucket mates); a learned encoder drops into the
    // same array<double> column with the identical downstream plan.
    "mm_near_dup" -> ((s, dir) =>
      decodedMedia(s, dir)
        .select(col("media_id"),
          array(col("width"), col("height"),
                col("sum_r"), col("sum_g"), col("sum_b"),
                col("width") * col("height"),
                col("sum_r") + col("sum_g") + col("sum_b"),
                col("sum_r") - col("sum_b")).cast("array<double>").as("feat"))
        .withColumn("bucket",
          graft.functions.VectorOps.lshBucket(col("feat"), 8, 8))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_items"), min(col("media_id")).as("rep_id"))
        .filter(col("n_items") >= 2)),

    // PERCEPTUAL media near-dup — the tier mm_near_dup's global pixel
    // statistics cannot reach: a RESIZED/re-encoded duplicate has
    // different dimensions and band sums but the same block structure.
    // The fixture makes consecutive doc pairs true resized duplicates
    // (one pattern key per `media_id div 2`, per-doc sizes); the
    // 8×8 average-hash is computed from the REAL decoded raster in
    // the decode mapPartitions pass (integer cross-multiplied mean
    // comparison — engine-exact, no float resampling), then
    // Hamming-banded the dedup_simhash way: 4×16-bit bands, bucket =
    // (band, band_val), near-dup candidates = buckets with ≥2
    // members. Linear: one narrow decode projection + one hash agg —
    // never pair-shaped.
    "mm_near_dup_perceptual" -> ((s, dir) =>
      perceptualHashed(s, dir)
        .select(col("media_id"),
          explode(array((0 to 3).map(b =>
            struct(lit(b.toLong).as("band"),
              shiftright(col("ahash"), 16 * b).bitwiseAND(lit(65535L))
                .as("band_val"))): _*)).as("bv"))
        .select(col("media_id"), col("bv.band").as("band"),
                col("bv.band_val").as("band_val"))
        .groupBy(col("band"), col("band_val"))
        .agg(count(lit(1)).as("n_items"), min(col("media_id")).as("rep_id"))
        .filter(col("n_items") >= 2)),

    // Tier EVAL on the planted resized-duplicate pairs (the
    // dedup_lsh_eval pattern): docs 2k/2k+1 are ground-truth
    // duplicates by construction — how many does each tier catch?
    // The exact-statistic tier can at best group identical decoded
    // statistics (equal dims + band sums); the perceptual tier
    // groups equal aHashes. One self-join on pair_id (linear — each
    // doc joins exactly its twin) + one global agg.
    "mm_near_dup_eval" -> ((s, dir) => {
      val t = perceptualHashed(s, dir)
        .select(col("media_id"), floor(col("media_id") / 2).cast("long").as("pair_id"),
                col("width"), col("height"), col("sum3"), col("ahash"))
      val a = t.filter(col("media_id") % 2 === 0)
        .select(col("pair_id"), col("width").as("w_a"), col("height").as("h_a"),
                col("sum3").as("s_a"), col("ahash").as("p_a"))
      val b = t.filter(col("media_id") % 2 === 1)
        .select(col("pair_id"), col("width").as("w_b"), col("height").as("h_b"),
                col("sum3").as("s_b"), col("ahash").as("p_b"))
      a.join(b, "pair_id")
        .agg(count(lit(1)).as("n_pairs"),
             sum(when(col("w_a") === col("w_b") && col("h_a") === col("h_b")
                   && col("s_a") === col("s_b"), 1L).otherwise(0L))
               .as("caught_statistic"),
             sum(when(col("p_a") === col("p_b"), 1L).otherwise(0L))
               .as("caught_perceptual"))
        .select(col("n_pairs"), col("caught_statistic"), col("caught_perceptual"),
          round(col("caught_statistic") / col("n_pairs").cast("double"), 6)
            .as("recall_statistic_r"),
          round(col("caught_perceptual") / col("n_pairs").cast("double"), 6)
            .as("recall_perceptual_r"))
    }),

    // frame sampling for video payloads: every 12th frame index of the
    // container frame count, exploded.
    "mm_frame_sample" -> ((s, dir) =>
      decodedMedia(s, dir)
        .filter(col("kind") === "video")
        .select(col("media_id"),
                explode(MultimodalOps.sampleFrames(col("n_frames"), 12)).as("frame_idx"))),

    // REAL audio decode: container metadata (rate) + sample count +
    // amplitude range read from the decoded PCM frames (the JDK's
    // javax.sound.sampled WAV codec, run on the executors).
    "mm_audio_decode" -> ((s, dir) =>
      decodedAudio(s, dir)
        .select(col("media_id"), col("n_samples"), col("sample_rate"),
                expr("n_samples * 1000 div sample_rate").as("duration_ms"),
                col("min_amp"), col("max_amp"))),

    // REAL audio features: integer-exact energy statistics from the
    // decoded samples — the loudness/energy signature an audio
    // pipeline computes before segmentation or VAD.
    "mm_audio_features" -> ((s, dir) =>
      decodedAudio(s, dir)
        .select(col("media_id"), col("sum_amp"), col("sum_sq"),
                // FLOOR division (not `div`): sum_amp can be negative,
                // where Spark's div truncates toward zero but DuckDB's
                // // floors — floor on exact doubles matches // exactly
                // (numerator < 2^53; quotient ≥ 1/n from any integer)
                floor(col("sum_amp") * 1000 / col("n_samples")).cast("long")
                  .as("mean_amp_milli"),
                expr("sum_sq div n_samples").as("mean_sq")))
  )

  private val h31txt = "CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT) % 2147483647"

  private def hp(salt: String) =
    s"(CAST(concat('0x', substr(md5(concat(md5(text), '_$salt')), 1, 14)) AS BIGINT) % 2147483647)"

  /** Shared synthesis-parameter CTE: the same salted md5 chain
    * `MultimodalOps.mediaTable` uses to build the PNGs.
    */
  private val paramsCte =
    s"""params AS (
       |  SELECT doc_id AS media_id,
       |    ${hp("w")} % 97 + 16 AS w,
       |    ${hp("h")} % 97 + 16 AS h,
       |    ${hp("r")} % 144 AS cr,
       |    ${hp("g")} % 144 AS cg,
       |    ${hp("b")} % 256 AS cb
       |  FROM documents
       |), stats AS (
       |  -- closed-form decode expectation for the gradient image
       |  -- r=cr+x, g=cg+y, b=cb: what ImageIO must read back.
       |  SELECT media_id, w, h,
       |    h * (w*cr + (w*(w-1))//2) AS sum_r,
       |    w * (h*cg + (h*(h-1))//2) AS sum_g,
       |    w*h*cb AS sum_b
       |  FROM params
       |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "mm_decode_dims" ->
      s"""WITH $paramsCte, nf AS (
         |  SELECT doc_id, ($h31txt) % 216 + 24 AS n_frames FROM documents
         |)
         |SELECT p.media_id,
         |  ['image', 'audio', 'video'][CAST(p.media_id % 3 + 1 AS INT)] AS kind,
         |  p.w AS width, p.h AS height,
         |  nf.n_frames,
         |  p.w * p.h AS n_pixels
         |FROM params p JOIN nf ON nf.doc_id = p.media_id""".stripMargin,

    "mm_features" ->
      s"""WITH $paramsCte
         |SELECT media_id, w AS width, h AS height, sum_r, sum_g, sum_b,
         |  (sum_r * 1000) // (w*h) AS mean_r_milli,
         |  (sum_g * 1000) // (w*h) AS mean_g_milli,
         |  (sum_b * 1000) // (w*h) AS mean_b_milli
         |FROM stats""".stripMargin,

    "mm_resize" ->
      s"""WITH $paramsCte
         |SELECT media_id, w AS width, h AS height,
         |  greatest(1, (w * 224) // greatest(w, h)) AS out_w,
         |  greatest(1, (h * 224) // greatest(w, h)) AS out_h
         |FROM params""".stripMargin,

    "mm_near_dup" ->
      s"""WITH $paramsCte, f AS (
         |  SELECT media_id,
         |    [w, h, sum_r, sum_g, sum_b, w*h, sum_r+sum_g+sum_b, sum_r-sum_b] AS feat
         |  FROM stats
         |), planes AS (
         |  SELECT j, list_transform(generate_series(1, 8), i ->
         |    (CAST(concat('0x', substr(md5(concat(j, '_', i)), 1, 14)) AS BIGINT) % 2147483647)
         |      / 1073741823.5 - 1.0) AS plane
         |  FROM generate_series(0, 7) t(j)
         |), sig AS (
         |  SELECT f.media_id,
         |    CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, 8), i ->
         |      CAST(f.feat[i] * p.plane[i] AS DECIMAL(28,14)))) > 0
         |      THEN CAST(power(2, p.j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM f, planes p GROUP BY f.media_id
         |)
         |SELECT bucket, count(*) AS n_items, min(media_id) AS rep_id
         |FROM sig GROUP BY bucket HAVING count(*) >= 2""".stripMargin,

    // closed-form twin: for the block-pattern fixture the decoded
    // aHash provably equals the 60-bit pattern key (bright cells sit
    // strictly above the global mean because the four key-less cells
    // are always dark; dark cells strictly below unless all-dark,
    // where the bit is 0 anyway) — so the oracle derives the hash
    // from the same salted md5 chain and bands it with integer
    // shifts, and a green row proves the encode → PNG → decode →
    // block-mean pipeline reproduced every one of the 60 bits.
    "mm_near_dup_perceptual" ->
      """WITH k AS (
        |  SELECT doc_id AS media_id,
        |    CAST(concat('0x', substr(md5(concat(CAST(doc_id // 2 AS VARCHAR),
        |      '#pkey')), 1, 15)) AS BIGINT) AS ahash
        |  FROM documents
        |), b AS (
        |  SELECT media_id, CAST(t.b AS BIGINT) AS band,
        |    CAST((ahash >> (16 * t.b)) & 65535 AS BIGINT) AS band_val
        |  FROM k, generate_series(0, 3) t(b)
        |)
        |SELECT band, band_val, CAST(count(*) AS BIGINT) AS n_items,
        |  min(media_id) AS rep_id
        |FROM b GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // pair members share the pattern key by construction, so equal
    // aHash is certain (recall_perceptual ≡ 1) and equal statistics
    // reduce to equal (w, h) — equal dims + equal key determine every
    // band sum, and differing dims already break the feature vector.
    // The oracle states exactly that closed form; the Spark side
    // proves it from the DECODED rasters.
    "mm_near_dup_eval" ->
      s"""WITH p AS (
        |  SELECT doc_id AS media_id, doc_id // 2 AS pair_id,
        |    ${hp("pw")} % 97 + 16 AS w,
        |    ${hp("ph")} % 97 + 16 AS h
        |  FROM documents
        |), j AS (
        |  SELECT a.pair_id,
        |    CASE WHEN a.w = b.w AND a.h = b.h THEN 1 ELSE 0 END AS stat_hit
        |  FROM p a JOIN p b ON b.pair_id = a.pair_id
        |  WHERE a.media_id % 2 = 0 AND b.media_id % 2 = 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(stat_hit) AS BIGINT) AS caught_statistic,
        |  CAST(count(*) AS BIGINT) AS caught_perceptual,
        |  round(sum(stat_hit) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall_statistic_r,
        |  round(count(*) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall_perceptual_r
        |FROM j""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, ($h31txt) % 216 + 23 AS max_frame
         |  FROM documents WHERE doc_id % 3 = 2
         |)
         |SELECT media_id, unnest(generate_series(0, max_frame, 12)) AS frame_idx
         |FROM v""".stripMargin,

    // closed-form decode expectation for the ramp waveform
    // s(t) = c + (t mod 256) over nb 256-sample blocks:
    //   n = 256·nb, Σs = n·c + nb·32640, Σs² = n·c² + 2c·nb·32640
    //   + nb·5559680 (Σr = 32640, Σr² = 5559680 over r = 0..255)
    // exact integer regeneration of the sample stream from the synth
    // params; R(L) sums and the argmax rank identically
    "mm_audio_pitch" ->
      s"""WITH p AS (
         |  SELECT doc_id AS media_id,
         |    ${hp("an")} % 97 + 16 AS nb,
         |    ${hp("ac")} % 32001 - 16000 AS c
         |  FROM documents
         |), lag_list(l) AS (VALUES (100), (200), (256), (300)
         |), r AS (
         |  SELECT p.media_id, CAST(l.l AS BIGINT) AS lag,
         |    CAST(
         |      (p.nb * 256 - l.l) * list_sum(list_transform(
         |        generate_series(0, p.nb * 256 - 1 - l.l),
         |        t -> (p.c + (t % 256)) * (p.c + ((t + l.l) % 256))))
         |      - list_sum(list_transform(
         |          generate_series(0, p.nb * 256 - 1 - l.l),
         |          t -> p.c + (t % 256)))
         |        * list_sum(list_transform(
         |            generate_series(l.l, p.nb * 256 - 1),
         |            t -> p.c + (t % 256)))
         |      AS BIGINT) AS r
         |  FROM p, lag_list l
         |)
         |SELECT media_id, lag, r,
         |  first_value(lag) OVER (PARTITION BY media_id ORDER BY r DESC, lag)
         |    AS best_lag
         |FROM r""".stripMargin,

    "mm_audio_decode" ->
      s"""WITH p AS (
         |  SELECT doc_id AS media_id,
         |    ${hp("an")} % 97 + 16 AS nb,
         |    ${hp("ac")} % 32001 - 16000 AS c
         |  FROM documents
         |)
         |SELECT media_id, nb * 256 AS n_samples,
         |  CAST(16000 AS BIGINT) AS sample_rate,
         |  (nb * 256 * 1000) // 16000 AS duration_ms,
         |  c AS min_amp, c + 255 AS max_amp
         |FROM p""".stripMargin,

    "mm_audio_features" ->
      s"""WITH p AS (
         |  SELECT doc_id AS media_id,
         |    ${hp("an")} % 97 + 16 AS nb,
         |    ${hp("ac")} % 32001 - 16000 AS c
         |  FROM documents
         |), st AS (
         |  SELECT media_id, nb * 256 AS n,
         |    nb * 256 * c + nb * 32640 AS sum_amp,
         |    nb * 256 * c * c + 2 * c * nb * 32640 + nb * 5559680 AS sum_sq
         |  FROM p
         |)
         |SELECT media_id, sum_amp, sum_sq,
         |  (sum_amp * 1000) // n AS mean_amp_milli,
         |  sum_sq // n AS mean_sq
         |FROM st""".stripMargin
  )
}
