package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Cross-batch stage gating for the streaming funnel: the state
  * machine must carry attainment across micro-batches, gate each
  * stage on the PREVIOUS stage's timestamp (strictly after), and
  * never regress a write-once field.
  */
class FunnelStreamSpec extends SparkSpec {
  import FunnelStream._

  private def run(batches: Seq[Seq[In]],
                  windowMs: Option[Long] = None): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[In]
    val ckpt = Files.createTempDirectory("funnel-").toString
    val name = s"funnel_out_${System.nanoTime()}"
    val q = FunnelStream.track(input.toDS(), windowMs)
      .writeStream.outputMode("append")
      .queryName(name).option("checkpointLocation", ckpt)
      .format("memory").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    // write-once fields: min over non-null emissions = final state
    spark.table(name).as[Out].collect()
      .groupBy(_.user_id).view.mapValues { outs =>
        (outs.flatMap(_.t_view).minOption,
         outs.flatMap(_.t_click).minOption,
         outs.flatMap(_.t_purchase).minOption)
      }.toMap
  }

  test("stage attainment carries across batches") {
    // user 1: view in batch 1, click in batch 2, purchase in batch 3
    val got = run(Seq(
      Seq(In(1L, 10L, 1000L, "view")),
      Seq(In(1L, 11L, 2000L, "click")),
      Seq(In(1L, 12L, 3000L, "purchase"))))
    assert(got(1L) === ((Some(1000L), Some(2000L), Some(3000L))))
  }

  test("stages gate strictly on the previous stage's timestamp") {
    val got = run(Seq(Seq(
      // user 2: click BEFORE any view → ignored; click at ts == t_view
      // → ignored (strict >); click after → counts
      In(2L, 20L, 500L, "click"),
      In(2L, 21L, 1000L, "view"),
      In(2L, 22L, 1000L, "click"),
      In(2L, 23L, 1500L, "click"),
      // user 3: purchase before any click → ignored forever
      In(3L, 30L, 100L, "purchase"),
      In(3L, 31L, 200L, "view"))))
    assert(got(2L) === ((Some(1000L), Some(1500L), None)))
    assert(got(3L) === ((Some(200L), None, None)))
  }

  test("conversion window gates at the boundary, across batches") {
    val got = run(Seq(
      // user 5: click exactly at t_view + W → counts (inclusive bound)
      Seq(In(5L, 50L, 1000L, "view")),
      Seq(In(5L, 51L, 1000L + 500L, "click"),
          In(5L, 52L, 1900L, "purchase")), // in (t_click, t_click+W] ✓
      // user 6: first click past the window → rejected forever, even
      // though a later purchase would have followed it
      Seq(In(6L, 60L, 1000L, "view")),
      Seq(In(6L, 61L, 1000L + 501L, "click"),
          In(6L, 62L, 1700L, "purchase"))),
      windowMs = Some(500L))
    assert(got(5L) === ((Some(1000L), Some(1500L), Some(1900L))))
    assert(got(6L) === ((Some(1000L), None, None)))
  }

  test("write-once: later cheaper events never regress a set stage") {
    val got = run(Seq(
      Seq(In(4L, 40L, 1000L, "view"), In(4L, 41L, 2000L, "click")),
      // a second view/click later must not overwrite the firsts
      Seq(In(4L, 42L, 3000L, "view"), In(4L, 43L, 4000L, "click"),
          In(4L, 44L, 5000L, "purchase"))))
    assert(got(4L) === ((Some(1000L), Some(2000L), Some(5000L))))
  }
}
