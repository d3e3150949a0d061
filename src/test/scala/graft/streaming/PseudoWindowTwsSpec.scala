package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.PseudoWindow.{Point, endOfWindow}

/** The transformWithState port: batch-twin equivalence and
  * restart-from-checkpoint resume (the savepoint story on the modern
  * state API — MapState column families under the RocksDB provider).
  */
class PseudoWindowTwsSpec extends SparkSpec {

  private def mkPoints(n: Int): Seq[Point] =
    (0 until n).flatMap { i =>
      val ts = 1704067200000L + i * 100L
      Seq(Point("temp", ts, (i % 10) / 10.0, new java.sql.Timestamp(ts)),
          Point("pressure", ts, math.sin(2 * math.Pi * ((i % 10) / 10.0)),
                new java.sql.Timestamp(ts)))
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

  test("tws event-time window matches the batch floor-formula twin") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[Point]
      val counts = PseudoWindowTws.eventTime(
        input.toDS().withWatermark("ts", "0 seconds"), 1000L)
      val ckpt = Files.createTempDirectory("pwtws-et-").toString
      val q = counts.writeStream.outputMode("append")
        .queryName("pwtws_et").option("checkpointLocation", ckpt)
        .format("memory").start()
      val pts = mkPoints(55)
      input.addData(pts)
      q.processAllAvailable()
      input.addData(Point("temp", 1704067210000L, 0.0,
        new java.sql.Timestamp(1704067210000L)))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("pwtws_et")
        .select("key", "windowEndMs", "cnt").as[(String, Long, Long)]
        .collect().toSet
      val want = pts
        .groupBy(p => (p.key, endOfWindow(p.tsMs, 1000L)))
        .map { case ((k, e), ps) => (k, e, ps.size.toLong) }
        .filter(_._2 <= 1704067210000L)
        .toSet
      assert(got == want)
    }
  }

  test("tws MapState is offline-readable from the checkpoint (ChangeBackend parity)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[Point]
      val ckpt = Files.createTempDirectory("pwtws-inspect-").toString
      val q = PseudoWindowTws.eventTime(
        input.toDS().withWatermark("ts", "0 seconds"), 1000L)
        .writeStream.outputMode("append").queryName("pwtws_inspect")
        .option("checkpointLocation", ckpt).format("memory").start()
      // 25 ticks → windows 0..1 closed (wm 2.4 s), window 2 still OPEN
      // with 5 counted events — that open entry is what must be
      // visible in the offline state read
      input.addData(mkPoints(25).filter(_.key == "temp"))
      q.processAllAvailable()
      q.stop()

      val state = spark.read.format("statestore")
        .option("path", ckpt)
        .option("stateVarName", "countInWindow")
        .load()
      // (grouping key, map key = endOfWindow, value = count)
      val rows = state.selectExpr("key.value AS key",
          "user_map_key.value AS window_end", "user_map_value.value AS cnt")
        .as[(String, Long, Long)].collect().toSet
      assert(rows == Set(("temp", 1704067202999L, 5L)),
        s"open-window state mismatch: $rows")
    }
  }

  test("tws restart from checkpoint resumes without duplicate or lost windows") {
    withRocksDb {
      import spark.implicits._
      val srcDir = Files.createTempDirectory("pwtws-restart-src-").toString
      val outDir = Files.createTempDirectory("pwtws-restart-out-").toString
      val ckpt = Files.createTempDirectory("pwtws-restart-ckpt-").toString
      def writeBatch(pts: Seq[Point], name: String): Unit =
        spark.createDataset(pts).coalesce(1)
          .write.parquet(s"$srcDir/$name")
      def runOnce(): Unit = {
        val pts = spark.readStream
          .schema(spark.createDataset(Seq.empty[Point]).schema)
          .parquet(s"$srcDir/*/")
          .withWatermark("ts", "0 seconds")
          .as[Point]
        val q = PseudoWindowTws.eventTime(pts, 1000L)
          .toDF().writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      writeBatch(mkPoints(25), "part1")
      runOnce()
      val before = spark.read.parquet(outDir).count()
      writeBatch(mkPoints(55).drop(25), "part2")
      runOnce()
      val all = spark.read.parquet(outDir)
        .select("key", "windowEndMs", "cnt").as[(String, Long, Long)].collect()

      // the window straddling the restart only counts 10 if its
      // MapState entry was recovered; no window is emitted twice
      assert(before >= 2)
      assert(all.forall(_._3 == 10L))
      assert(all.map(w => (w._1, w._2)).distinct.length == all.length)
      assert(all.length == 2 * 5)
    }
  }
}
