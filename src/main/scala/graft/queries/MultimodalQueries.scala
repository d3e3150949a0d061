package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps
import graft.tables.Tables

/** Multimodal extension queries (SURVEY.md §2.9): a media table is
  * synthesized deterministically from `documents` (payload = UTF-8
  * bytes of the text — a stand-in blob with a real BinaryType column),
  * then decoded/featurized with the stubbed codecs. The DuckDB twins
  * compute the same md5-derived values from the text directly (same
  * bytes ⇒ same md5 ⇒ same result) — so the Spark side exercises the
  * binary-column path end-to-end while staying oracle-checkable.
  */
object MultimodalQueries {

  val queries: Map[String, Q] = Map(

    // decode + dimensions per media item (narrow projection over blobs).
    "mm_decode_dims" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("bytes"),
          col("source"))
        .withColumn("dims", MultimodalOps.decodeStub(col("bytes")))
        .select(col("media_id"), col("kind"),
                col("dims.width").cast("long").as("width"),
                col("dims.height").cast("long").as("height"),
                col("dims.n_frames").cast("long").as("n_frames"),
                length(col("bytes")).cast("long").as("n_bytes"))),

    // feature extraction: 8-dim stub embedding, first two activations.
    "mm_features" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bytes", col("text").cast("binary"))
        .withColumn("feat", MultimodalOps.featureStub(col("bytes"), 8))
        .select(
          col("doc_id").as("media_id"),
          round(element_at(col("feat"), 1), 6).as("f0"),
          round(element_at(col("feat"), 2), 6).as("f1"),
          round(aggregate(col("feat"), lit(0.0), (a, x) => a + x * x), 6).as("feat_norm_sq"))),

    // aspect-preserving resize geometry to fit 224×224 (the vision
    // preprocessing step) — integer math over the decoded dims.
    "mm_resize" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bytes", col("text").cast("binary"))
        .withColumn("dims", MultimodalOps.decodeStub(col("bytes")))
        .withColumn("rs", MultimodalOps.resizeDims(
          col("dims.width"), col("dims.height"), 224))
        .select(col("doc_id").as("media_id"),
                col("dims.width").cast("long").as("width"),
                col("dims.height").cast("long").as("height"),
                col("rs.out_w").as("out_w"), col("rs.out_h").as("out_h"))),

    // MEDIA DEDUP composition: payload → feature vector → sign-LSH
    // bucket → duplicate groups — the binary-column twin of the
    // embedding dedup pipeline, exercising blob → featurize → index →
    // group end to end. The stub features are md5-derived (no metric
    // locality — documented env constraint), so the groups here are
    // exact-payload duplicates plus hash-coincidental bucket mates; a
    // real CLIP-style encoder drops into the same array<double> column
    // and the identical downstream (bucket, group) plan then yields
    // true NEAR-dup media clusters. The fixture corpus contains real
    // exact copies, so the groups are non-trivial.
    "mm_near_dup" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bytes", col("text").cast("binary"))
        .select(col("doc_id").as("media_id"),
          MultimodalOps.featureStub(col("bytes"), 8).as("feat"))
        .withColumn("bucket",
          graft.functions.VectorOps.lshBucket(col("feat"), 8, 8))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_items"), min(col("media_id")).as("rep_id"))
        .filter(col("n_items") >= 2)),

    // frame sampling for video payloads: every 12th frame, exploded.
    "mm_frame_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") % 3 === 2) // kind == video
        .withColumn("bytes", col("text").cast("binary"))
        .withColumn("dims", MultimodalOps.decodeStub(col("bytes")))
        .select(col("doc_id").as("media_id"),
                explode(MultimodalOps.sampleFrames(col("dims.n_frames"), 12)).as("frame_idx")))
  )

  private val h31txt = "CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT) % 2147483647"

  val oracleSql: Map[String, String] = Map(
    "mm_decode_dims" ->
      s"""SELECT doc_id AS media_id,
         |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         |  ($h31txt) % 1920 + 1 AS width,
         |  ($h31txt) % 1080 + 1 AS height,
         |  ($h31txt) % 216 + 24 AS n_frames,
         |  CAST(length(text) AS BIGINT) AS n_bytes
         |FROM documents""".stripMargin,

    "mm_features" ->
      """WITH f AS (
        |  SELECT doc_id, list_transform(generate_series(0, 7), i ->
        |    (CAST(concat('0x', substr(md5(concat(md5(text), '_', i)), 1, 14)) AS BIGINT) % 2147483647)
        |      / 1073741823.5 - 1.0) AS feat
        |  FROM documents
        |)
        |SELECT doc_id AS media_id,
        |  round(feat[1], 6) AS f0,
        |  round(feat[2], 6) AS f1,
        |  round(list_sum(list_transform(feat, x -> x * x)), 6) AS feat_norm_sq
        |FROM f""".stripMargin,

    "mm_resize" ->
      s"""WITH d AS (
         |  SELECT doc_id AS media_id,
         |    ($h31txt) % 1920 + 1 AS width,
         |    ($h31txt) % 1080 + 1 AS height
         |  FROM documents
         |)
         |SELECT media_id, width, height,
         |  greatest(1, (width * 224) // greatest(width, height)) AS out_w,
         |  greatest(1, (height * 224) // greatest(width, height)) AS out_h
         |FROM d""".stripMargin,

    "mm_near_dup" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id, list_transform(generate_series(0, 7), i ->
        |    (CAST(concat('0x', substr(md5(concat(md5(text), '_', i)), 1, 14)) AS BIGINT) % 2147483647)
        |      / 1073741823.5 - 1.0) AS feat
        |  FROM documents
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

    "mm_frame_sample" ->
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, ($h31txt) % 216 + 23 AS max_frame
         |  FROM documents WHERE doc_id % 3 = 2
         |)
         |SELECT media_id, unnest(generate_series(0, max_frame, 12)) AS frame_idx
         |FROM v""".stripMargin
  )
}
