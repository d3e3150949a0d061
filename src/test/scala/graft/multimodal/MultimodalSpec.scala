package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = graft.tables.Tables.documents(spark, sf)
    .select(col("doc_id").as("media_id"),
            col("text").cast("binary").as("bytes"))

  test("decodeBatched preserves cardinality and yields real byte stats") {
    val out = MultimodalOps.decodeBatched(media, batchSize = 7)
    assert(out.schema.fieldNames.toSeq == Seq("media_id", "n_bytes", "first_byte"))
    val rows = out.collect()
    assert(rows.length == media.count())
    assert(rows.forall(r => r.getLong(1) > 0 && r.getInt(2) >= 0 && r.getInt(2) < 256))
  }

  test("decode stub is deterministic across evaluations") {
    val a = media.withColumn("d", MultimodalOps.decodeStub(col("bytes")))
      .select("media_id", "d.width", "d.height").collect().toSet
    val b = media.withColumn("d", MultimodalOps.decodeStub(col("bytes")))
      .select("media_id", "d.width", "d.height").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("feature stub feeds the similarity ops (cosine self-sim = 1)") {
    import graft.functions.VectorOps
    val withFeat = media.withColumn("feat",
      MultimodalOps.featureStub(col("bytes"), 8).cast("array<float>"))
    val sims = withFeat
      .select(VectorOps.cosine(col("feat"), col("feat")).as("c"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(c => math.abs(c - 1.0) < 1e-9))
  }
}
