package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Round-17 pins: the offset-VOTING video near-dup matcher (VERDICT
  * r16 item 2) against an independent brute-force Scala replay of the
  * banding → star-edge → mode-delta → overlap-threshold chain, and
  * the per-transformation-class eval invariants (head-truncated
  * planted pairs caught; existing classes' catch rates unchanged).
  */
class Round17OpsSpec extends SparkSpec {

  private def voff(pairId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$pairId#voff".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 3
  }

  test("mm_video_near_dup: offset voting matches a brute-force replay " +
       "and catches every planted pair including head-truncated ones") {
    // collected per-frame hashes — small fixture (500 clips × 4-6)
    val hashes = MultimodalOps.ahashPngs(
        MultimodalOps.videoFrameTable(spark, sf))
      .select(col("media_id"), col("frame_idx"), col("ahash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nf = hashes.groupBy(_._1).map { case (id, fs) => id -> fs.length.toLong }

    // brute force: buckets keyed (band, band_val) over all frames
    val bandRows = for {
      (id, f, ah) <- hashes
      b <- 0 until 4
    } yield ((b.toLong, (ah >> (16 * b)) & 0xFFFFL), (id, f))
    val buckets = bandRows.groupBy(_._1).view.mapValues(_.map(_._2))
      .filter(_._2.length >= 2)
    val cand = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    buckets.foreach { case (_, members) =>
      val repId = members.map(_._1).min
      val repFrames = members.filter(_._1 == repId).map(_._2)
      for ((id, f) <- members if id != repId; rf <- repFrames)
        cand += ((id, repId, f, f - rf))
    }
    val votes = cand.toSeq.groupBy(c => (c._1, c._2, c._4))
      .map { case (k, v) => k -> v.length.toLong }
    val best = votes.groupBy { case ((id, rep, _), _) => (id, rep) }
      .map { case ((id, rep), vs) =>
        val ((_, _, delta), hits) =
          vs.minBy { case ((_, _, d), n) => (-n, d) }
        val overlap = math.min(nf(id), nf(rep) + delta) -
          math.max(0L, delta)
        (id, rep) -> ((delta, hits, overlap,
          hits >= 2 && hits * 4 >= overlap * 3))
      }

    val got = SparkEntry.queries("mm_video_near_dup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got === best)

    // every planted pair (odd member → its even twin) is caught, and
    // the head-truncated class is non-empty — the exact-index r16
    // matcher scored ZERO banded hits on it by construction
    val pairEdges = got.keys.filter { case (id, rep) =>
      id % 2 == 1 && rep == id - 1 }
    val headTrunc = pairEdges.count { case (id, _) => voff(id / 2) > 0 }
    assert(headTrunc > 0)
    pairEdges.foreach { e =>
      assert(got(e)._4, s"planted pair edge $e not flagged dup")
      assert(got(e)._1 === -voff(e._1 / 2),
        s"voted delta for $e should be -voff")
    }
    assert(pairEdges.size === nf.keys.count(_ % 2 == 1))
  }

  test("audio fingerprint: decoded energy-delta-sign fp matches the " +
       "nibble closed form and survives gain/resample re-encodes") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(pairId: Long, w: Int): Long =
      java.lang.Long.parseLong(md5hex(s"$pairId#awin#$w").take(1), 16)
    def expectedFp(pairId: Long): Long =
      (0 until 63).foldLeft(0L) { (fp, w) =>
        if (nib(pairId, w + 1) > nib(pairId, w)) fp | (1L << w) else fp
      }
    val rows = MultimodalOps.afingerWavs(
        MultimodalOps.audioClipTable(spark, sf))
      .select(col("media_id"), col("n_samples"), col("sample_rate"),
              col("ss_total"), col("afp"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.size === 500)
    var gain = 0
    var resample = 0
    rows.keys.filter(_ % 2 == 0).foreach { a =>
      val b = a + 1
      val pair = a / 2
      val want = expectedFp(pair)
      // the DECODED fingerprint of both members equals the closed form
      assert(rows(a)._4 === want, s"even clip $a fp mismatch")
      assert(rows(b)._4 === want, s"odd clip $b fp mismatch")
      val atr = java.lang.Long.parseLong(md5hex(s"$pair#atr").take(1), 16) % 2
      if (atr == 0) { // gain: same container stats except energy
        gain += 1
        assert(rows(a)._1 === rows(b)._1 && rows(a)._2 === rows(b)._2)
        assert(rows(a)._3 !== rows(b)._3, s"pair $pair gain left ss equal")
      } else { // resample: half the samples, half the rate
        resample += 1
        assert(rows(b)._1 === rows(a)._1 / 2)
        assert(rows(b)._2 === 8000L && rows(a)._2 === 16000L)
      }
    }
    assert(gain > 0 && resample > 0)
  }

  test("mm_audio_near_dup_eval: both re-encode classes at perceptual " +
       "recall 1.0, statistic tier 0") {
    val rows = SparkEntry.queries("mm_audio_near_dup_eval")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet === Set("gain", "resample"))
    rows.foreach { case (cls, (n, stat, perc)) =>
      assert(n > 0, s"$cls empty")
      assert(perc === n, s"$cls perceptual recall < 1")
      assert(stat === 0L, s"$cls statistic tier should miss")
    }
  }

  test("mm_video_near_dup_eval: three transformation classes, " +
       "perceptual recall 1.0 in each, metadata ~0") {
    val rows = SparkEntry.queries("mm_video_near_dup_eval")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet === Set("head_trunc", "tail_trunc", "resize"))
    rows.foreach { case (cls, (n, meta, perc)) =>
      assert(n > 0, s"$cls empty")
      assert(perc === n, s"$cls perceptual recall < 1")
      assert(meta === 0L, s"$cls metadata tier should miss (1/28k odds)")
    }
  }
}
