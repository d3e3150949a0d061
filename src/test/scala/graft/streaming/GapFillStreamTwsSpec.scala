package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.GapFillStream.{In, Out}

/** The transformWithState LOCF resampler: twin equivalence against the
  * flatMapGroupsWithState port on the same input, and restart-from-
  * checkpoint resume proving all three state pieces recover — the
  * cursor (no re-emission), the LOCF carry (gaps after restart still
  * carry the pre-restart mean), and the open-hour partials (a bucket
  * that RECEIVED data before the restart but only closes after it
  * still emits its exact mean).
  */
class GapFillStreamTwsSpec extends SparkSpec {

  private val H = 3600000L
  private val Base = 1704067200000L // 2024-01-01T00:00Z, hour-aligned

  private def in(key: String, hour: Int, offMs: Long, v: Double): In = {
    val ts = Base + hour * H + offMs
    In(key, ts, v, new java.sql.Timestamp(ts))
  }

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** a: observed h0 (two values) and h3, gaps h1-h2 carry 1.5;
    * b: gap h0 with NULL (no carry yet), observed h1, gaps h2-h3
    * carry 5.0. The h4 event only advances the watermark (its own
    * bucket never closes).
    */
  private val pts = Seq(
    in("a", 0, 0L, 1.0), in("a", 0, 60000L, 2.0), in("a", 3, 0L, 4.0),
    in("b", 1, 0L, 5.0), in("a", 4, 0L, 9.9))

  private val want = Set[(String, Long, Long, Boolean, Option[Double])](
    ("a", Base, 2L, false, Some(1.5)),
    ("a", Base + 1 * H, 0L, true, Some(1.5)),
    ("a", Base + 2 * H, 0L, true, Some(1.5)),
    ("a", Base + 3 * H, 1L, false, Some(4.0)),
    ("b", Base, 0L, true, None),
    ("b", Base + 1 * H, 1L, false, Some(5.0)),
    ("b", Base + 2 * H, 0L, true, Some(5.0)),
    ("b", Base + 3 * H, 0L, true, Some(5.0)))

  private def collectGrid(table: String) = {
    import spark.implicits._
    spark.table(table)
      .select("event_type", "hour_ms", "cnt", "is_gap", "locf_avg_r")
      .as[(String, Long, Long, Boolean, Option[Double])].collect().toSet
  }

  test("tws grid matches the fmgws twin and the hand-computed LOCF chart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      def run(name: String, tws: Boolean): Set[(String, Long, Long, Boolean, Option[Double])] = {
        val input = MemoryStream[In]
        val src = input.toDS().withWatermark("ts", "0 seconds")
        val grid =
          if (tws) GapFillStreamTws.grid(src, Base) else GapFillStream.grid(src, Base)
        val ckpt = Files.createTempDirectory(s"gftws-$name-").toString
        val q = grid.toDF().writeStream.outputMode("append")
          .queryName(name).option("checkpointLocation", ckpt)
          .format("memory").start()
        input.addData(pts)
        q.processAllAvailable()
        q.stop()
        collectGrid(name)
      }
      val twsGot = run("gftws_tws", tws = true)
      val fmgwsGot = run("gftws_fmgws", tws = false)
      assert(twsGot == want, s"tws grid diverged: $twsGot")
      assert(fmgwsGot == want, s"fmgws twin diverged: $fmgwsGot")
    }
  }

  test("tws restart recovers cursor, carry, and open-hour partials") {
    withRocksDb {
      import spark.implicits._
      val srcDir = Files.createTempDirectory("gftws-restart-src-").toString
      val outDir = Files.createTempDirectory("gftws-restart-out-").toString
      val ckpt = Files.createTempDirectory("gftws-restart-ckpt-").toString
      def writeBatch(rows: Seq[In], name: String): Unit =
        spark.createDataset(rows).coalesce(1).write.parquet(s"$srcDir/$name")
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema(spark.createDataset(Seq.empty[In]).schema)
          .parquet(s"$srcDir/*/")
          .withWatermark("ts", "0 seconds")
          .as[In]
        val q = GapFillStreamTws.grid(src, Base)
          .toDF().writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      // Run 1: wm reaches h1, so only h0 closes. b's h1 bucket has
      // DATA but stays an open partial in MapState across the restart.
      writeBatch(Seq(in("a", 0, 0L, 1.0), in("a", 0, 60000L, 2.0),
                     in("b", 1, 0L, 5.0)), "part1")
      runOnce()
      val afterRun1 = spark.read.parquet(outDir)
        .select("event_type", "hour_ms", "cnt", "is_gap", "locf_avg_r")
        .as[(String, Long, Long, Boolean, Option[Double])].collect().toSet
      assert(afterRun1 == Set(
        ("a", Base, 2L, false, Some(1.5)), ("b", Base, 0L, true, None)),
        s"pre-restart emission wrong: $afterRun1")
      // Run 2 (fresh query from the checkpoint): h1-h3 close. a's
      // h1-h2 gaps must carry 1.5 (recovered carry), b's h1 must emit
      // the exact pre-restart mean (recovered partial), and nothing
      // re-emits (recovered cursor).
      writeBatch(Seq(in("a", 3, 0L, 4.0), in("a", 4, 0L, 9.9)), "part2")
      runOnce()
      val all = spark.read.parquet(outDir)
        .select("event_type", "hour_ms", "cnt", "is_gap", "locf_avg_r")
        .as[(String, Long, Long, Boolean, Option[Double])].collect()
      assert(all.length == all.map(r => (r._1, r._2)).distinct.length,
        "a grid row was emitted twice across the restart")
      assert(all.toSet == want, s"post-restart grid diverged: ${all.toSet}")
    }
  }
}
