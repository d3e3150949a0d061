package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming semantics ≙ SURVEY.md §5.2 items 4-5: event-time
  * emission parity with the batch twin, processing-time count
  * invariants, and restart-from-checkpoint resume (the savepoint
  * story).
  */
class PseudoWindowSpec extends SparkSpec {
  import PseudoWindow._

  private def mkPoints(n: Int): Seq[Point] =
    (0 until n).flatMap { i =>
      val ts = 1704067200000L + i * 100L
      Seq(Point("temp", ts, (i % 10) / 10.0, new java.sql.Timestamp(ts)),
          Point("pressure", ts, math.sin(2 * math.Pi * ((i % 10) / 10.0)),
                new java.sql.Timestamp(ts)))
    }

  test("event-time PseudoWindow matches the batch floor-formula twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Point]
    val counts = PseudoWindow.eventTime(
      input.toDS().withWatermark("ts", "0 seconds"), 1000L)
    val ckpt = Files.createTempDirectory("pw-et-").toString
    val q = counts.writeStream.outputMode("append")
      .queryName("pw_et").option("checkpointLocation", ckpt)
      .format("memory").start()
    val pts = mkPoints(55) // 5.5 s of stream
    input.addData(pts)
    q.processAllAvailable()
    // second batch advances the watermark past the early windows
    input.addData(Point("temp", 1704067210000L, 0.0,
      new java.sql.Timestamp(1704067210000L)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("pw_et")
      .select("key", "windowEndMs", "cnt").as[(String, Long, Long)]
      .collect().toSet
    // batch twin: all windows fully below the final watermark (10 s)
    val want = pts
      .groupBy(p => (p.key, endOfWindow(p.tsMs, 1000L)))
      .map { case ((k, e), ps) => (k, e, ps.size.toLong) }
      .filter(_._2 <= 1704067210000L)
      .toSet
    assert(got == want)
    // every FULL window (not the trailing partial 5.0-5.5 s one) has 10
    assert(got.nonEmpty &&
      got.filter(_._2 < 1704067205000L).forall(_._3 == 10L))
  }

  test("restart from checkpoint resumes without duplicate or lost windows") {
    import spark.implicits._
    // MemoryStream does not support checkpoint recovery — use the file
    // source (the reference's savepoint-resume story, SURVEY.md §3.2).
    // (the memory sink does not either, so sink = parquet files too)
    val srcDir = Files.createTempDirectory("pw-restart-src-").toString
    val outDir = Files.createTempDirectory("pw-restart-out-").toString
    val ckpt = Files.createTempDirectory("pw-restart-ckpt-").toString
    def writeBatch(pts: Seq[Point], name: String): Unit =
      spark.createDataset(pts).coalesce(1)
        .write.parquet(s"$srcDir/$name")
    def runOnce(): Unit = {
      val pts = spark.readStream
        .schema(spark.createDataset(Seq.empty[Point]).schema)
        .parquet(s"$srcDir/*/")
        .withWatermark("ts", "0 seconds")
        .as[Point]
      val q = PseudoWindow.eventTime(pts, 1000L)
        .toDF().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    writeBatch(mkPoints(25), "part1") // ticks 0..24 → wm 2.4 s
    runOnce()
    val before = spark.read.parquet(outDir).count()
    writeBatch(mkPoints(55).drop(25), "part2") // continue ticks 25..54
    runOnce()
    val all = spark.read.parquet(outDir)
      .select("key", "windowEndMs", "cnt").as[(String, Long, Long)].collect()

    // the window straddling the restart (2000-2999: 5 events before,
    // 5 after) only counts 10 if its state was recovered; no window is
    // emitted twice (distinct == total)
    assert(before >= 2) // first run closed windows up to wm 2.4 s
    assert(all.forall(_._3 == 10L))
    assert(all.map(w => (w._1, w._2)).distinct.length == all.length)
    assert(all.length == 2 * 5) // 2 keys × 5 windows ≤ wm 5.4 s
  }

  test("processing-time PseudoWindow preserves the count-sum invariant") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val input = MemoryStream[Point]
    val counts = PseudoWindow.processingTime(input.toDS(), 50L)
    val ckpt = Files.createTempDirectory("pw-pt-").toString
    val q = counts.writeStream.outputMode("append")
      .queryName("pw_pt").option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .format("memory").start()
    val pts = mkPoints(30)
    input.addData(pts)
    // wall-clock windows close ~50 ms after ingestion; poll the sink
    // until the conservation law is reached (timeout-driven batches
    // keep firing, so avoid processAllAvailable here)
    def emitted(): Long = spark.table("pw_pt").agg(sum("cnt"))
      .collect()(0) match { case r if r.isNullAt(0) => 0L; case r => r.getLong(0) }
    val deadline = System.currentTimeMillis() + 30000
    while (emitted() < pts.size && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
    }
    q.stop()
    // nondeterministic window ASSIGNMENT by design (README.md:41-47) —
    // but the conservation law is exact: every input counted once
    assert(emitted() == pts.size)
  }
}
