package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support (SURVEY.md §2.9): image/audio/video
  * payloads ride as opaque `BinaryType` columns with typed metadata;
  * decode / feature-extraction / frame-sampling are per-row
  * transformations that scale as narrow projections (no shuffle, no
  * driver involvement) over a 100 TB media table.
  *
  * The actual codecs are STUBBED — this container has no image/audio
  * libraries — with deterministic md5-derived fakes, so the Spark-side
  * plumbing (schemas, binary columns, batch iteration shape,
  * partitioning) is real and oracle-testable while the codec call is
  * a drop-in point.
  */
object MultimodalOps {

  /** media table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  private val P = 2147483647L

  private def h31(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long") % P

  /** STUB decode: deterministic pseudo-dimensions from the payload
    * hash. A real implementation calls the codec here (per row or per
    * mapPartitions batch) and fills the same schema:
    * struct(width int, height int, n_frames int).
    */
  def decodeStub(bytes: Column): Column = {
    val h = h31(bytes)
    struct(
      (h % 1920L + 1L).cast("int").as("width"),
      (h % 1080L + 1L).cast("int").as("height"),
      (h % 216L + 24L).cast("int").as("n_frames"))
  }

  /** STUB feature extractor: `dim` deterministic pseudo-activations in
    * [-1, 1) from the payload hash — stands in for an image/audio
    * embedding model; downstream similarity ops (VectorOps) consume it
    * unchanged.
    */
  def featureStub(bytes: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (h31(concat(md5(bytes), lit("_"), i.cast("string"))) /
        lit(1073741823.5) - 1.0))

  /** Frame sampling for video payloads: every `step`-th frame index of
    * the decoded frame count — pure array generation, exploded by the
    * caller.
    */
  def sampleFrames(nFrames: Column, step: Int): Column =
    sequence(lit(0), nFrames.cast("long") - 1L, lit(step.toLong))

  /** Aspect-preserving resize to fit a `target`×`target` box (the
    * standard vision-model preprocessing step): the longer edge
    * becomes `target`, the shorter scales proportionally (min 1 px).
    * Pure INTEGER arithmetic (`w·target DIV max(w,h)`) so the computed
    * geometry is engine-exact — the actual pixel resampling is the
    * codec stub's territory.
    */
  def resizeDims(width: Column, height: Column, target: Int): Column = {
    val longEdge = greatest(width.cast("long"), height.cast("long"))
    // floor((edge·target)/longEdge) in double is exact here: operands
    // are integers ≤ 1920·224 (exactly representable) and the true
    // quotient is ≥ 1/1920 away from any other integer — far beyond
    // one ulp, so the floor cannot misround.
    def fit(edge: Column) =
      greatest(lit(1L),
        floor(edge.cast("long") * target / longEdge).cast("long"))
    struct(fit(width).as("out_w"), fit(height).as("out_h"))
  }

  /** The mapPartitions batch-decode shape: demonstrates how a real
    * vectorized decoder plugs in — the iterator is consumed in batches
    * of `batchSize` payloads (amortizing model/codec init per batch,
    * exactly the mapInPandas batch contract), and each input row maps
    * to (media_id, n_bytes, first_byte). Only the two extraction
    * lambdas are stubs.
    */
  def decodeBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("first_byte", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select("media_id", "bytes").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codec: val decoded = Codec.decodeAll(batch.map(_.getAs[Array[Byte]]("bytes")))
        batch.map { r =>
          val b = r.getAs[Array[Byte]]("bytes")
          Row(r.getLong(0), b.length.toLong, if (b.isEmpty) -1 else b(0) & 0xFF)
        }
      }
    }(enc)
  }
}
