package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("png codec round-trip matches the closed form (pure, no Spark)") {
    // gradient image r=cr+x, g=cg+y, b=cb at (w,h,cr,cg,cb)=(5,3,10,20,30):
    //   sum_r = h·Σx(cr+x) = 3·(10+11+12+13+14) = 180
    //   sum_g = w·Σy(cg+y) = 5·(20+21+22)       = 315
    //   sum_b = w·h·cb     = 15·30              = 450
    val bytes = MultimodalOps.synthPng(5, 3, 10, 20, 30)
    // a real PNG file: magic header present
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val (w, h, sr, sg, sb) = MultimodalOps.decodePng(bytes)
    assert((w, h, sr, sg, sb) == (5L, 3L, 180L, 315L, 450L))
  }

  test("decodePngs recovers every image's closed-form raster statistics") {
    // expected values computed independently from the synthesis params
    // (the same arithmetic the DuckDB oracle runs) — the decode path
    // must reproduce them from the actual PNG bytes.
    def ph(salt: String) =
      conv(substring(md5(concat(md5(col("text")), lit("_" + salt))), 1, 14), 16, 10)
        .cast("long") % 2147483647L
    val expected = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id").as("media_id"),
        (ph("w") % 97L + 16L).as("w"), (ph("h") % 97L + 16L).as("h"),
        (ph("r") % 144L).as("cr"), (ph("g") % 144L).as("cg"), (ph("b") % 256L).as("cb"))
      .select(col("media_id"), col("w"), col("h"),
        (col("h") * (col("w") * col("cr") + col("w") * (col("w") - 1) / 2)).as("sum_r"),
        (col("w") * (col("h") * col("cg") + col("h") * (col("h") - 1) / 2)).as("sum_g"),
        (col("w") * col("h") * col("cb")).as("sum_b"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Number](3).longValue,
         r.getAs[Number](4).longValue, r.getLong(5))).toMap

    val decoded = MultimodalOps.decodePngs(
        MultimodalOps.mediaTable(spark, sf).select(col("media_id"), col("bytes")),
        batchSize = 7)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    assert(decoded.nonEmpty && decoded.size == expected.size)
    decoded.foreach { case (id, got) =>
      val (w, h, sr, sg, sb) = expected(id)
      assert(got == ((w, h, sr, sg, sb)), s"media_id=$id")
    }
  }

  test("media table payloads are real PNGs and decode deterministically") {
    val media = MultimodalOps.mediaTable(spark, sf).select(col("media_id"), col("bytes"))
    val magics = media.select(substring(col("bytes"), 2, 3).cast("string").as("m"))
      .distinct().collect().map(_.getString(0))
    assert(magics.toSeq == Seq("PNG"))
    def run() = MultimodalOps.decodePngs(media)
      .select("media_id", "width", "height", "sum_r").collect().toSet
    val a = run(); val b = run()
    assert(a == b && a.nonEmpty)
  }

  test("wav codec round-trip matches the closed form (pure, no Spark)") {
    // ramp s(t) = c + (t mod 256), nb=2 blocks, c=-100:
    //   n = 512, Σs = 512·(−100) + 2·32640 = 14080
    //   Σs² = 512·100² + 2·(−100)·2·32640 + 2·5559680 = 3,183,360
    val bytes = MultimodalOps.synthWav(2, -100)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    val (n, rate, sum, sumSq, mn, mx) = MultimodalOps.decodeWav(bytes)
    assert((n, rate, sum, sumSq, mn, mx) == ((512L, 16000L, 14080L, 3183360L, -100L, 155L)))
  }

  test("decodeWavs recovers every payload's closed-form sample statistics") {
    def ph(salt: String) =
      conv(substring(md5(concat(md5(col("text")), lit("_" + salt))), 1, 14), 16, 10)
        .cast("long") % 2147483647L
    val expected = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id").as("media_id"),
        (ph("an") % 97L + 16L).as("nb"), (ph("ac") % 32001L - 16000L).as("c"))
      .select(col("media_id"), (col("nb") * 256).as("n"),
        (col("nb") * 256 * col("c") + col("nb") * 32640L).as("sum_amp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val decoded = MultimodalOps.decodeWavs(
        MultimodalOps.audioTable(spark, sf), batchSize = 7)
      .select("media_id", "n_samples", "sum_amp").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(decoded.nonEmpty && decoded == expected)
  }

  test("autocorrelation pitch detector finds the true 256-sample period") {
    // scalar replay from the synthesis law s_t = c + (t % 256) for a
    // few docs, against the REAL decode path; and the detector must
    // rank the true period above every decoy for every doc
    val rows = graft.queries.MultimodalQueries.queries("mm_audio_pitch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 == 256L), "every best_lag must be the true period")
    val byDoc = rows.groupBy(_._1)
    // R(256) strictly dominates the decoys (tiebreak never decides)
    byDoc.values.foreach { rs =>
      val r256 = rs.find(_._2 == 256L).get._3
      assert(rs.filter(_._2 != 256L).forall(_._3 < r256))
    }
    // scalar recompute for 3 deterministic docs
    def ph(salt: String) =
      conv(substring(md5(concat(md5(col("text")), lit("_" + salt))), 1, 14), 16, 10)
        .cast("long") % 2147483647L
    val params = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), (ph("an") % 97L + 16L).as("nb"),
              (ph("ac") % 32001L - 16000L).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    params.keys.toSeq.sorted.take(3).foreach { id =>
      val (nb, c) = params(id)
      val n = (nb * 256).toInt
      val s = Array.tabulate(n)(t => c + (t % 256))
      Seq(100, 200, 256, 300).foreach { l =>
        val raw = (0 until n - l).map(t => s(t) * s(t + l)).sum
        val s1 = (0 until n - l).map(s).sum
        val s2 = (l until n).map(s).sum
        val want = (n - l).toLong * raw - s1 * s2
        val got = rows.find(r => r._1 == id && r._2 == l.toLong).get._3
        assert(got === want, s"doc $id lag $l")
      }
    }
  }

  test("decoded pixel statistics feed the similarity ops (cosine self-sim = 1)") {
    import graft.functions.VectorOps
    val withFeat = MultimodalOps.decodePngs(
        MultimodalOps.mediaTable(spark, sf).select(col("media_id"), col("bytes")))
      .select(col("media_id"),
        array(col("width"), col("height"), col("sum_r"), col("sum_g"), col("sum_b"))
          .cast("array<float>").as("feat"))
    val sims = withFeat
      .select(VectorOps.cosine(col("feat"), col("feat")).as("c"))
      .collect().map(_.getDouble(0))
    assert(sims.nonEmpty && sims.forall(c => math.abs(c - 1.0) < 1e-9))
  }
}
