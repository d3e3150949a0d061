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

  /** The per-frame video perceptual-hash table — frame-sequence
    * encode + real decode + aHash once per (session, dir), shared by
    * mm_video_near_dup and mm_video_near_dup_eval. Payload dropped
    * BEFORE the checkpoint (the decodedAudio lesson); what persists
    * is |clips|·frames rows of five longs — the per-frame signature
    * column a video lake stores beside the demuxed frames.
    */
  private def videoHashed(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "video_hashed") {
      MultimodalOps.ahashPngs(MultimodalOps.videoFrameTable(s, dir))
        .select(col("media_id"), col("frame_idx"), col("width"),
                col("height"), col("sum3"), col("ahash"))
    }

  /** The audio fingerprint table — clip-pair WAV encode + real decode
    * + energy-delta-sign fingerprint once per (session, dir), shared
    * by mm_audio_near_dup and mm_audio_near_dup_eval. Payload dropped
    * BEFORE the checkpoint (the decodedAudio lesson): what persists
    * is |clips| rows of four longs — the stored signature column an
    * audio lake keeps beside the blobs.
    */
  private def audioFingered(s: org.apache.spark.sql.SparkSession, dir: String) =
    Artifacts.materialized(s, dir, "audio_afinger") {
      MultimodalOps.afingerWavs(MultimodalOps.audioClipTable(s, dir))
        .select(col("media_id"), col("n_samples"), col("sample_rate"),
                col("ss_total"), col("afp"))
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

    // VIDEO perceptual near-dup (VERDICT r15 item 3; offset-robust
    // per VERDICT r16 item 2) — frame-sequence aHash matching: per-
    // frame 8×8 aHashes from the REAL decoded frame rasters,
    // Hamming-banded on (band, band_val) ALONE with the frame index
    // carried as DATA (the r16 version put frame_idx in the bucket
    // key, so a head-truncated re-encode — the most common real
    // transformation — scored zero banded hits by construction).
    // Star edges to each bucket's min-id rep (never pair-shaped —
    // O(bucket memberships), the dedup_lsh topology); each banded
    // frame collision yields a candidate (clip, rep, delta =
    // frame_idx − rep_frame_idx); OFFSET VOTING picks the mode delta
    // per (clip, rep) — the sequence-alignment shape the funnel
    // operators use — and the ≥3/4 threshold applies to the index
    // OVERLAP at the voted offset (integer cross-multiplied, no
    // floats), with n_frame_hits ≥ 2 so a single random 16-bit band
    // collision can never certify a clip match. hits ≤ overlap by
    // construction (every hit pairs real frames of both clips), so
    // the overlap window needs no clamp. 100 TB note: at production
    // scale the 2^18 bucket space of 4×16-bit bands saturates —
    // widen the banding (e.g. 6×24 bits of a 144-bit pHash), same
    // plan shape.
    "mm_video_near_dup" -> ((s, dir) => {
      val vh = videoHashed(s, dir)
      val nf = vh.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
      val bands = vh.select(col("media_id"), col("frame_idx"),
          explode(array((0 to 3).map(b =>
            struct(lit(b.toLong).as("band"),
              shiftright(col("ahash"), 16 * b).bitwiseAND(lit(65535L))
                .as("band_val"))): _*)).as("bv"))
        .select(col("media_id"), col("frame_idx"),
                col("bv.band").as("band"), col("bv.band_val").as("band_val"))
      val reps = bands.groupBy(col("band"), col("band_val"))
        .agg(min(col("media_id")).as("rep_id"), count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select(col("band"), col("band_val"), col("rep_id"))
      val withRep = bands.join(reps, Seq("band", "band_val"))
      val repFrames = withRep.filter(col("media_id") === col("rep_id"))
        .select(col("band"), col("band_val"), col("rep_id"),
                col("frame_idx").as("rep_frame_idx"))
      val cand = withRep.filter(col("media_id") =!= col("rep_id"))
        .join(repFrames, Seq("band", "band_val", "rep_id"))
        .select(col("media_id"), col("rep_id"), col("frame_idx"),
                (col("frame_idx") - col("rep_frame_idx")).as("delta"))
        .distinct()
      val votes = cand.groupBy(col("media_id"), col("rep_id"), col("delta"))
        .agg(count(lit(1)).as("n_frame_hits"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id"), col("rep_id"))
        .orderBy(col("n_frame_hits").desc, col("delta").asc)
      val best = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      best
        .join(nf.select(col("media_id"), col("nf").as("nf_a")), "media_id")
        .join(nf.select(col("media_id").as("rep_id"), col("nf").as("nf_b")),
          "rep_id")
        .select(col("media_id"), col("rep_id"), col("delta"),
          col("n_frame_hits"),
          (least(col("nf_a"), col("nf_b") + col("delta"))
            - greatest(lit(0L), col("delta"))).as("overlap"),
          (col("n_frame_hits") >= 2 &&
           col("n_frame_hits") * 4 >=
             (least(col("nf_a"), col("nf_b") + col("delta"))
               - greatest(lit(0L), col("delta"))) * 3).as("is_dup"))
    }),

    // Tier EVAL on the planted clip pairs (the mm_near_dup_eval
    // pattern at video granularity): clips 2k/2k+1 are ground-truth
    // re-encodes by construction, and each pair is classed by its
    // TRANSFORMATION (VERDICT r16 item 2): head_trunc (voff > 0 —
    // the odd member lost its leading frames), tail_trunc (voff = 0,
    // frame counts differ), resize (voff = 0, same length, different
    // raster dims). The container-METADATA tier can at best group
    // equal (dims, frame count, total pixel sum); the perceptual
    // tier REPLAYS the mm_video_near_dup decision on each pair
    // (equal-aHash frame matches → delta votes → mode delta →
    // hits ≥ 2 ∧ hits·4 ≥ overlap·3 at the voted offset — ADVICE
    // r16: the predicate is evaluated, never stated as a closed
    // form). One self-join on pair_id (each clip joins exactly its
    // twin) + one per-class agg.
    "mm_video_near_dup_eval" -> ((s, dir) => {
      val vh = videoHashed(s, dir)
      val perClip = vh.groupBy(col("media_id"))
        .agg(count(lit(1)).as("nf"), max(col("width")).as("w"),
             max(col("height")).as("h"), sum(col("sum3")).as("sum3_total"))
        .withColumn("pair_id", floor(col("media_id") / 2).cast("long"))
      val ma = perClip.filter(col("media_id") % 2 === 0)
        .select(col("pair_id"), col("nf").as("nf_a"), col("w").as("w_a"),
                col("h").as("h_a"), col("sum3_total").as("s_a"))
      val mb = perClip.filter(col("media_id") % 2 === 1)
        .select(col("pair_id"), col("nf").as("nf_b"), col("w").as("w_b"),
                col("h").as("h_b"), col("sum3_total").as("s_b"))
      val fa = vh.filter(col("media_id") % 2 === 0)
        .select(floor(col("media_id") / 2).cast("long").as("pair_id"),
                col("frame_idx").as("fa_idx"), col("ahash").as("ah_a"))
      val fb = vh.filter(col("media_id") % 2 === 1)
        .select(floor(col("media_id") / 2).cast("long").as("pair_id"),
                col("frame_idx").as("fb_idx"), col("ahash").as("ah_b"))
      // member = odd clip, rep = even clip (the star-edge direction
      // the matcher would assign): delta = fb_idx − fa_idx
      val votes = fa.join(fb, Seq("pair_id"))
        .filter(col("ah_a") === col("ah_b"))
        .select(col("pair_id"), col("fb_idx"),
                (col("fb_idx") - col("fa_idx")).as("delta"))
        .distinct()
        .groupBy(col("pair_id"), col("delta"))
        .agg(count(lit(1)).as("n_frame_hits"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pair_id"))
        .orderBy(col("n_frame_hits").desc, col("delta").asc)
      val best = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("pair_id"), col("delta"), col("n_frame_hits"))
      ma.join(mb, "pair_id").join(best, Seq("pair_id"), "left")
        .select(col("pair_id"),
          when(MultimodalOps.voffOf(col("pair_id")) > 0, "head_trunc")
            .when(col("nf_a") =!= col("nf_b"), "tail_trunc")
            .otherwise("resize").as("transform_class"),
          when(col("nf_a") === col("nf_b") && col("w_a") === col("w_b")
              && col("h_a") === col("h_b") && col("s_a") === col("s_b"), 1L)
            .otherwise(0L).as("meta_hit"),
          when(col("n_frame_hits").isNotNull &&
               col("n_frame_hits") >= 2 &&
               col("n_frame_hits") * 4 >=
                 (least(col("nf_b"), col("nf_a") + col("delta"))
                   - greatest(lit(0L), col("delta"))) * 3, 1L)
            .otherwise(0L).as("perc_hit"))
        .groupBy(col("transform_class"))
        .agg(count(lit(1)).as("n_pairs"),
             sum(col("meta_hit")).as("caught_metadata"),
             sum(col("perc_hit")).as("caught_perceptual"))
        .select(col("transform_class"), col("n_pairs"),
          col("caught_metadata"), col("caught_perceptual"),
          round(col("caught_metadata") / col("n_pairs").cast("double"), 6)
            .as("recall_metadata_r"),
          round(col("caught_perceptual") / col("n_pairs").cast("double"), 6)
            .as("recall_perceptual_r"))
        .orderBy(col("transform_class"))
    }),

    // AUDIO perceptual near-dup (VERDICT r16 item 4 — completes the
    // image/video/audio media-dedup triad): energy-delta-sign
    // fingerprints (a chromaprint-style simplification) computed from
    // the REAL decoded PCM — 16 ms windows, bit w = [E(w+1) > E(w)] —
    // are invariant to the uniform-gain and resample re-encodes the
    // container/statistic tier misses (both scale every window's
    // energy by the same factor). Hamming-banded exactly like the
    // image tier: 4×16-bit bands, bucket = (band, band_val), star rep
    // per bucket — never pair-shaped, O(bucket memberships) at any
    // corpus size.
    "mm_audio_near_dup" -> ((s, dir) =>
      audioFingered(s, dir)
        .select(col("media_id"),
          explode(array((0 to 3).map(b =>
            struct(lit(b.toLong).as("band"),
              shiftright(col("afp"), 16 * b).bitwiseAND(lit(65535L))
                .as("band_val"))): _*)).as("bv"))
        .select(col("media_id"), col("bv.band").as("band"),
                col("bv.band_val").as("band_val"))
        .groupBy(col("band"), col("band_val"))
        .agg(count(lit(1)).as("n_items"), min(col("media_id")).as("rep_id"))
        .filter(col("n_items") >= 2)),

    // Tier EVAL on the planted clip pairs, per transformation class
    // (gain re-encode / resample): the statistic tier can at best
    // group equal (n_samples, sample_rate, Σ energy) — the gain class
    // keeps length and rate but scales energy, the resample class
    // keeps duration but halves the samples, so it misses both; the
    // perceptual tier compares the decoded fingerprints. One
    // self-join on pair_id + one per-class agg.
    "mm_audio_near_dup_eval" -> ((s, dir) => {
      val t = audioFingered(s, dir)
        .withColumn("pair_id", floor(col("media_id") / 2).cast("long"))
      val a = t.filter(col("media_id") % 2 === 0)
        .select(col("pair_id"), col("n_samples").as("n_a"),
                col("sample_rate").as("r_a"), col("ss_total").as("ss_a"),
                col("afp").as("fp_a"))
      val b = t.filter(col("media_id") % 2 === 1)
        .select(col("pair_id"), col("n_samples").as("n_b"),
                col("sample_rate").as("r_b"), col("ss_total").as("ss_b"),
                col("afp").as("fp_b"))
      a.join(b, "pair_id")
        .select(
          when(MultimodalOps.atrOf(col("pair_id")) === 0, "gain")
            .otherwise("resample").as("transform_class"),
          when(col("n_a") === col("n_b") && col("r_a") === col("r_b")
              && col("ss_a") === col("ss_b"), 1L).otherwise(0L)
            .as("stat_hit"),
          when(col("fp_a") === col("fp_b"), 1L).otherwise(0L)
            .as("perc_hit"))
        .groupBy(col("transform_class"))
        .agg(count(lit(1)).as("n_pairs"),
             sum(col("stat_hit")).as("caught_statistic"),
             sum(col("perc_hit")).as("caught_perceptual"))
        .select(col("transform_class"), col("n_pairs"),
          col("caught_statistic"), col("caught_perceptual"),
          round(col("caught_statistic") / col("n_pairs").cast("double"), 6)
            .as("recall_statistic_r"),
          round(col("caught_perceptual") / col("n_pairs").cast("double"), 6)
            .as("recall_perceptual_r"))
        .orderBy(col("transform_class"))
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

  /** SQL twin of [[MultimodalOps.voffOf]] — the per-pair video
    * head-truncation offset ∈ {0,1,2}.
    */
  private def voffSqlOf(ref: String) =
    s"(CAST(concat('0x', substr(md5(concat(CAST($ref AS VARCHAR), " +
      s"'#voff')), 1, 15)) AS BIGINT) % 3)"
  private val voffSql = voffSqlOf("pair_id")
  private val voffSqlA = voffSqlOf("a.pair_id")

  /** SQL twins of [[MultimodalOps.atrOf]] (audio transformation class
    * ∈ {0 = gain, 1 = resample}) and the gain index ∈ {0,1,2}.
    */
  private val atrSql =
    "(CAST(concat('0x', substr(md5(concat(CAST(pair_id AS VARCHAR), " +
      "'#atr')), 1, 1)) AS BIGINT) % 2)"
  private val agiSql =
    "CAST(concat('0x', substr(md5(concat(CAST(pair_id AS VARCHAR), " +
      "'#ag')), 1, 1)) AS BIGINT) % 3"

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
    // aHash is certain (recall_perceptual ≡ 1). The statistic tier's
    // predicate is equal (w, h, sum3); the oracle evaluates the SAME
    // three-way predicate by deriving sum3 in closed form from
    // (key, w, h) — cell (i,j) holds (⌈(i+1)h/8⌉−⌈ih/8⌉)·
    // (⌈(j+1)w/8⌉−⌈jw/8⌉) pixels of brightness 3·(200|40) — rather
    // than relying on "same key ⇒ equal dims imply equal sums"
    // (ADVICE r15: a fixture change like per-doc brightness jitter
    // would otherwise silently desynchronize the twins). The Spark
    // side proves the same numbers from the DECODED rasters.
    "mm_near_dup_eval" ->
      s"""WITH p AS (
        |  SELECT doc_id AS media_id, doc_id // 2 AS pair_id,
        |    ${hp("pw")} % 97 + 16 AS w,
        |    ${hp("ph")} % 97 + 16 AS h,
        |    CAST(concat('0x', substr(md5(concat(CAST(doc_id // 2 AS VARCHAR),
        |      '#pkey')), 1, 15)) AS BIGINT) AS key
        |  FROM documents
        |), ps AS (
        |  SELECT media_id, pair_id, w, h,
        |    CAST(3 * list_sum(list_transform(generate_series(0, 63), c ->
        |      (((c // 8 + 1) * h + 7) // 8 - ((c // 8) * h + 7) // 8)
        |      * (((c % 8 + 1) * w + 7) // 8 - ((c % 8) * w + 7) // 8)
        |      * (CASE WHEN c < 60 AND (key >> c) & 1 = 1
        |         THEN 200 ELSE 40 END))) AS BIGINT) AS sum3
        |  FROM p
        |), j AS (
        |  SELECT a.pair_id,
        |    CASE WHEN a.w = b.w AND a.h = b.h AND a.sum3 = b.sum3
        |      THEN 1 ELSE 0 END AS stat_hit
        |  FROM ps a JOIN ps b ON b.pair_id = a.pair_id
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

    // closed-form twin of the frame-sequence chain: each frame's
    // decoded aHash provably equals its 60-bit md5 pattern key (the
    // mm_near_dup_perceptual invariant, per frame), so the oracle
    // derives the per-frame hashes from the same salted chain —
    // including the odd member's head-truncation offset — and
    // replays the identical banding → star-edge → offset-voting →
    // overlap-threshold chain in SQL. A green row proves the whole
    // encode → PNG → decode → per-frame aHash → offset-voted
    // sequence matching pipeline.
    "mm_video_near_dup" ->
      s"""WITH p AS (
        |  SELECT doc_id AS media_id, doc_id // 2 AS pair_id,
        |    ${hp("vf")} % 3 + 4 AS nf
        |  FROM documents
        |), f AS (
        |  SELECT media_id, CAST(u.i - 1 AS BIGINT) AS frame_idx,
        |    CAST(concat('0x', substr(md5(concat(CAST(pair_id AS VARCHAR),
        |      '#vclip#', CAST(u.i - 1 + CASE WHEN media_id % 2 = 1
        |        THEN $voffSql ELSE 0 END AS VARCHAR))), 1, 15))
        |      AS BIGINT) AS ahash
        |  FROM p, unnest(generate_series(1, nf)) u(i)
        |), b AS (
        |  SELECT media_id, frame_idx, CAST(t.b AS BIGINT) AS band,
        |    CAST((ahash >> (16 * t.b)) & 65535 AS BIGINT) AS band_val
        |  FROM f, generate_series(0, 3) t(b)
        |), r AS (
        |  SELECT band, band_val, min(media_id) AS rep_id
        |  FROM b GROUP BY 1, 2 HAVING count(*) >= 2
        |), wr AS (
        |  SELECT b.media_id, b.frame_idx, b.band, b.band_val, r.rep_id
        |  FROM b JOIN r USING (band, band_val)
        |), cand AS (
        |  SELECT DISTINCT m.media_id, m.rep_id, m.frame_idx,
        |    m.frame_idx - rf.frame_idx AS delta
        |  FROM wr m JOIN wr rf ON rf.band = m.band
        |    AND rf.band_val = m.band_val AND rf.rep_id = m.rep_id
        |    AND rf.media_id = rf.rep_id
        |  WHERE m.media_id <> m.rep_id
        |), votes AS (
        |  SELECT media_id, rep_id, delta,
        |    CAST(count(*) AS BIGINT) AS n_frame_hits
        |  FROM cand GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT * FROM votes
        |  QUALIFY row_number() OVER (PARTITION BY media_id, rep_id
        |    ORDER BY n_frame_hits DESC, delta ASC) = 1
        |), n AS (SELECT media_id, CAST(nf AS BIGINT) AS nf FROM p)
        |SELECT v.media_id, v.rep_id, v.delta, v.n_frame_hits,
        |  least(na.nf, nb.nf + v.delta) - greatest(0, v.delta) AS overlap,
        |  (v.n_frame_hits >= 2 AND v.n_frame_hits * 4 >=
        |    (least(na.nf, nb.nf + v.delta) - greatest(0, v.delta)) * 3)
        |    AS is_dup
        |FROM best v JOIN n na ON na.media_id = v.media_id
        |  JOIN n nb ON nb.media_id = v.rep_id""".stripMargin,

    // per-transformation-class tier eval. The metadata tier's
    // predicate is evaluated in full closed form — equal (nf, w, h,
    // Σ-over-frames sum3), the per-frame 64-cell pixel-count formula
    // summed over the clip (the mm_near_dup_eval predicate-parity
    // convention, ADVICE r15) — and the perceptual tier REPLAYS the
    // offset-voting decision per pair (equal-key frame matches →
    // delta votes → mode delta → hits ≥ 2 ∧ hits·4 ≥ overlap·3),
    // never stating the closed form (ADVICE r16).
    "mm_video_near_dup_eval" ->
      s"""WITH p AS (
        |  SELECT doc_id AS media_id, doc_id // 2 AS pair_id,
        |    ${hp("pw")} % 97 + 16 AS w,
        |    ${hp("ph")} % 97 + 16 AS h,
        |    ${hp("vf")} % 3 + 4 AS nf
        |  FROM documents
        |), fs AS (
        |  SELECT media_id, pair_id, w, h,
        |    CAST(u.i - 1 AS BIGINT) AS frame_idx,
        |    CAST(concat('0x', substr(md5(concat(CAST(pair_id AS VARCHAR),
        |      '#vclip#', CAST(u.i - 1 + CASE WHEN media_id % 2 = 1
        |        THEN $voffSql ELSE 0 END AS VARCHAR))), 1, 15))
        |      AS BIGINT) AS key
        |  FROM p, unnest(generate_series(1, nf)) u(i)
        |), ss AS (
        |  SELECT media_id,
        |    CAST(3 * sum(list_sum(list_transform(generate_series(0, 63),
        |      c ->
        |      (((c // 8 + 1) * h + 7) // 8 - ((c // 8) * h + 7) // 8)
        |      * (((c % 8 + 1) * w + 7) // 8 - ((c % 8) * w + 7) // 8)
        |      * (CASE WHEN c < 60 AND (key >> c) & 1 = 1
        |         THEN 200 ELSE 40 END)))) AS BIGINT) AS sum3_total
        |  FROM fs GROUP BY media_id
        |), votes AS (
        |  SELECT pair_id, delta, CAST(count(*) AS BIGINT) AS n_frame_hits
        |  FROM (
        |    SELECT DISTINCT fb.pair_id, fb.frame_idx,
        |      fb.frame_idx - fa.frame_idx AS delta
        |    FROM fs fa JOIN fs fb ON fb.pair_id = fa.pair_id
        |      AND fa.media_id % 2 = 0 AND fb.media_id % 2 = 1
        |      AND fa.key = fb.key
        |  ) GROUP BY 1, 2
        |), best AS (
        |  SELECT * FROM votes
        |  QUALIFY row_number() OVER (PARTITION BY pair_id
        |    ORDER BY n_frame_hits DESC, delta ASC) = 1
        |), j AS (
        |  SELECT a.pair_id,
        |    CASE WHEN $voffSqlA > 0 THEN 'head_trunc'
        |      WHEN a.nf <> b.nf THEN 'tail_trunc'
        |      ELSE 'resize' END AS transform_class,
        |    CASE WHEN a.nf = b.nf AND a.w = b.w AND a.h = b.h
        |      AND sa.sum3_total = sb.sum3_total THEN 1 ELSE 0 END
        |      AS meta_hit,
        |    CASE WHEN v.n_frame_hits IS NOT NULL AND v.n_frame_hits >= 2
        |      AND v.n_frame_hits * 4 >=
        |        (least(b.nf, a.nf + v.delta) - greatest(0, v.delta)) * 3
        |      THEN 1 ELSE 0 END AS perc_hit
        |  FROM p a
        |  JOIN p b ON b.pair_id = a.pair_id AND b.media_id % 2 = 1
        |  JOIN ss sa ON sa.media_id = a.media_id
        |  JOIN ss sb ON sb.media_id = b.media_id
        |  LEFT JOIN best v ON v.pair_id = a.pair_id
        |  WHERE a.media_id % 2 = 0
        |)
        |SELECT transform_class, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(meta_hit) AS BIGINT) AS caught_metadata,
        |  CAST(sum(perc_hit) AS BIGINT) AS caught_perceptual,
        |  round(sum(meta_hit) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall_metadata_r,
        |  round(sum(perc_hit) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall_perceptual_r
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // closed-form twin of the audio fingerprint chain: every sample's
    // magnitude in window w IS the (gain-scaled) window amplitude, so
    // the decoded window energy is n_w·amp_w² exactly and fingerprint
    // bit w reduces to [amp²(w+1) > amp²(w)] — the oracle derives the
    // per-member amplitudes from the same salted md5 chain (including
    // the odd member's gain/resample re-encode) and REPLAYS the
    // energy-comparison fingerprint, banding, and bucket-rep chain. A
    // green row proves encode → WAV → decode → windowed energies →
    // fingerprint invariance end-to-end.
    "mm_audio_near_dup" ->
      s"""WITH pr AS (SELECT DISTINCT doc_id // 2 AS pair_id FROM documents),
        |par AS (
        |  SELECT pair_id,
        |    $atrSql AS atr,
        |    CASE ($agiSql) WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 5 END AS gn,
        |    CASE ($agiSql) WHEN 0 THEN 2 ELSE 4 END AS gd
        |  FROM pr
        |), nibs AS (
        |  SELECT pair_id, t.w,
        |    CAST(concat('0x', substr(md5(concat(CAST(pair_id AS VARCHAR),
        |      '#awin#', CAST(t.w AS VARCHAR))), 1, 1)) AS BIGINT) AS nib
        |  FROM pr, generate_series(0, 63) t(w)
        |), amps AS (
        |  SELECT d.doc_id AS media_id, n.w,
        |    CASE WHEN d.doc_id % 2 = 1 AND p.atr = 0
        |      THEN ((n.nib + 5) * 160 * p.gn) // p.gd
        |      ELSE (n.nib + 5) * 160 END AS amp
        |  FROM documents d
        |  JOIN par p ON p.pair_id = d.doc_id // 2
        |  JOIN nibs n ON n.pair_id = d.doc_id // 2
        |), fp AS (
        |  SELECT a.media_id,
        |    CAST(sum(CASE WHEN b.amp * b.amp > a.amp * a.amp
        |      THEN (CAST(1 AS BIGINT) << a.w) ELSE 0 END) AS BIGINT)
        |      AS afp
        |  FROM amps a JOIN amps b ON b.media_id = a.media_id
        |    AND b.w = a.w + 1
        |  GROUP BY 1
        |), b AS (
        |  SELECT media_id, CAST(t.b AS BIGINT) AS band,
        |    CAST((afp >> (16 * t.b)) & 65535 AS BIGINT) AS band_val
        |  FROM fp, generate_series(0, 3) t(b)
        |)
        |SELECT band, band_val, CAST(count(*) AS BIGINT) AS n_items,
        |  min(media_id) AS rep_id
        |FROM b GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // per-transformation-class tier eval: the statistic tier's
    // predicate — equal (n_samples, sample_rate, Σ energy) — is
    // evaluated in full closed form (n and rate from the re-encode
    // class, Σ energy = n_w·Σ amp_w² over the derived amplitudes),
    // and the perceptual tier REPLAYS the fingerprint comparison on
    // both members' energy chains (the odd member's through its
    // gain/resample re-encode — the invariance is evaluated, never
    // assumed; ADVICE r16 convention).
    "mm_audio_near_dup_eval" ->
      s"""WITH pr AS (SELECT DISTINCT doc_id // 2 AS pair_id FROM documents),
        |par AS (
        |  SELECT pair_id,
        |    $atrSql AS atr,
        |    CASE ($agiSql) WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 5 END AS gn,
        |    CASE ($agiSql) WHEN 0 THEN 2 ELSE 4 END AS gd
        |  FROM pr
        |), nibs AS (
        |  SELECT pair_id, t.w,
        |    CAST(concat('0x', substr(md5(concat(CAST(pair_id AS VARCHAR),
        |      '#awin#', CAST(t.w AS VARCHAR))), 1, 1)) AS BIGINT) AS nib
        |  FROM pr, generate_series(0, 63) t(w)
        |), amps AS (
        |  SELECT n.pair_id, n.w, (n.nib + 5) * 160 AS amp_a,
        |    CASE WHEN p.atr = 0 THEN ((n.nib + 5) * 160 * p.gn) // p.gd
        |      ELSE (n.nib + 5) * 160 END AS amp_b
        |  FROM nibs n JOIN par p USING (pair_id)
        |), fp AS (
        |  SELECT a.pair_id,
        |    CAST(sum(CASE WHEN b.amp_a * b.amp_a > a.amp_a * a.amp_a
        |      THEN (CAST(1 AS BIGINT) << a.w) ELSE 0 END) AS BIGINT)
        |      AS fp_a,
        |    CAST(sum(CASE WHEN b.amp_b * b.amp_b > a.amp_b * a.amp_b
        |      THEN (CAST(1 AS BIGINT) << a.w) ELSE 0 END) AS BIGINT)
        |      AS fp_b
        |  FROM amps a JOIN amps b ON b.pair_id = a.pair_id
        |    AND b.w = a.w + 1
        |  GROUP BY 1
        |), ss AS (
        |  SELECT pair_id,
        |    CAST(256 * sum(amp_a * amp_a) AS BIGINT) AS ss_a,
        |    CAST(CASE WHEN min(p.atr) = 1 THEN 128 * sum(amp_b * amp_b)
        |      ELSE 256 * sum(amp_b * amp_b) END AS BIGINT) AS ss_b
        |  FROM amps JOIN par p USING (pair_id) GROUP BY pair_id
        |), j AS (
        |  SELECT p.pair_id,
        |    CASE WHEN p.atr = 0 THEN 'gain' ELSE 'resample' END
        |      AS transform_class,
        |    CASE WHEN 16384 = (CASE WHEN p.atr = 1 THEN 8192
        |        ELSE 16384 END)
        |      AND 16000 = (CASE WHEN p.atr = 1 THEN 8000 ELSE 16000 END)
        |      AND s.ss_a = s.ss_b THEN 1 ELSE 0 END AS stat_hit,
        |    CASE WHEN f.fp_a = f.fp_b THEN 1 ELSE 0 END AS perc_hit
        |  FROM par p JOIN ss s USING (pair_id) JOIN fp f USING (pair_id)
        |)
        |SELECT transform_class, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(stat_hit) AS BIGINT) AS caught_statistic,
        |  CAST(sum(perc_hit) AS BIGINT) AS caught_perceptual,
        |  round(sum(stat_hit) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall_statistic_r,
        |  round(sum(perc_hit) / CAST(count(*) AS DOUBLE), 6)
        |    AS recall_perceptual_r
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

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
