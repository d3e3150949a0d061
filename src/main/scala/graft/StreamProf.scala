package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Profiling harness for the streaming twins: runs one query under the
  * Bench session config with a StreamingQueryListener attached and
  * prints every micro-batch's durationMs breakdown (addBatch /
  * getBatch / latestOffset / queryPlanning / walCommit / commitOffsets
  * / triggerExecution) — names where a twin's fixed cost goes without
  * touching the measured path.
  *
  * Usage: graft.StreamProf <queryName> [sfDir]
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        System.out.println(s"[prof] started ${e.name} at ${System.nanoTime() / 1e9}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        System.out.println(f"[prof] batch=${p.batchId}%2d rows=${p.numInputRows}%6d " +
          s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
          s"plan=${d.get("queryPlanning")} wal=${d.get("walCommit")} " +
          s"commit=${d.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          System.out.println(s"[prof]   state: commitMs=${so.allUpdatesTimeMs + so.commitTimeMs} " +
            s"rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        System.out.println(s"[prof] terminated at ${System.nanoTime() / 1e9}")
    })
    // warm like Bench does
    try {
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      graft.queries.StreamingQueries.eventsStream(spark, sfDir)
      graft.queries.StreamingQueries.documentsStream(spark, sfDir)
    } catch { case _: Throwable => () }
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sqlContext.tableNames().filter(_.startsWith("stream_out_"))
        .foreach(spark.catalog.dropTempView)
      System.out.println(f"[prof] rep$rep total=$sec%.2f s")
    }
    spark.stop()
  }
}
