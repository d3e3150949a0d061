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
