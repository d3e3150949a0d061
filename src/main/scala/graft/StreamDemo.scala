package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{SensorStream, StateInspect}

/** Live twin of running the reference's `TimingExplorer` job
  * (/root/reference/src/main/java/com/ververica/jobs/TimingExplorer.java:45-107):
  * self-paced 10 ev/s sensor source → keyed sawtooth/sine series →
  * event-time 1 s windowed counts (append) + raw-points fan-out,
  * checkpointed every trigger, with observe() metrics standing in for
  * the datapoints counter / eventTimeLag histogram
  * (SawtoothFunction.java:33, InfluxDBSink.java:38-39). After the
  * bounded run, the checkpoint is inspected offline ≙ ChangeBackend.
  *
  * Usage: graft.StreamDemo [runSeconds] (default 8)
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = Files.createTempDirectory("graft-demo-out-").toString
    val ckptRaw = Files.createTempDirectory("graft-demo-ckpt-raw-").toString
    val ckptWin = Files.createTempDirectory("graft-demo-ckpt-win-").toString
    println(s"[demo] sinks: $outDir  checkpoints: $ckptRaw | $ckptWin")

    val points = SensorStream.sensorPointsStream(spark, rowsPerBatch = 10)

    // Branch 1 ≙ `sensors` measurement: raw points with lag metrics.
    val rawQuery = SensorStream.startFanOut(points, outDir, ckptRaw)

    // Branch 2 ≙ `eventsPerSecond`: event-time windowed counts with an
    // observe() metric ≙ the datapoints counter.
    val windowed = SensorStream.eventTimeWindowCounts(points)
      .observe("win_metrics", count(lit(1)).as("windows_emitted"),
               sum(col("cnt")).as("events_counted"))
    val winQuery = windowed.writeStream
      .outputMode("append")
      .queryName("events_per_second")
      .option("checkpointLocation", ckptWin)
      .trigger(Trigger.ProcessingTime("1 second"))
      .format("memory")
      .start()

    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("win_metrics")) {
          val m = om.get("win_metrics")
          println(s"[demo] batch=${e.progress.batchId} windows=${m.getAs[Long]("windows_emitted")} events=${m.getAs[Long]("events_counted")} wm=${e.progress.eventTime.get("watermark")}")
        }
        if (om.containsKey("sensor_metrics")) {
          val m = om.get("sensor_metrics")
          println(s"[demo] batch=${e.progress.batchId} datapoints=${m.getAs[Long]("datapoints")} maxLagMs=${m.getAs[Any]("max_lag_ms")}")
        }
      }
    })

    Thread.sleep(runSeconds * 1000L)
    rawQuery.stop(); winQuery.stop()

    val emitted = spark.table("events_per_second")
    println(s"[demo] emitted windows (expect cnt=10 per key per second):")
    emitted.orderBy("window_end_ms", "key").show(12, truncate = false)
    val bad = emitted.filter(col("cnt") =!= 10).count()
    println(s"[demo] windows with cnt != 10: $bad (event-time determinism holds iff 0)")

    println("[demo] offline state inspection (≙ ChangeBackend print):")
    StateInspect.stateMetadata(spark, ckptWin).show(truncate = false)
    StateInspect.keyedState(spark, ckptWin)
      .select(col("key.key").as("key"),
              unix_millis(col("key.window.start")).as("window_start_ms"),
              col("value.count").cast("long").as("cnt"))
      .orderBy("window_start_ms", "key")
      .show(8, truncate = false)

    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
