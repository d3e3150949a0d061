package graft

import org.apache.spark.sql.SparkSession

/** Per-rep stall probe — the r16 forensics methodology as a reusable
  * harness. ScaleBench records only median + [min, max] per cell; a
  * one-in-N multi-10 s stall needs the PER-REP series to measure a
  * draw rate (the r16 BPE stall drew ~1-in-5 at 10× and was invisible
  * in medians). This main runs each named query N consecutive times
  * against ONE dir (default: the 10×-scaled corpus, where the r16
  * stall class drew), clearing the artifact memo + catalog cache per
  * rep exactly like ScaleBench's timeOnce, and prints every rep:
  *
  *   SPARK_GRAFT_PROBE_QUERIES=dedup_cc,graph_pagerank \
  *   SPARK_GRAFT_PROBE_REPS=27 java ... graft.StallProbe
  *
  * stdout: one `[probe] <query> rep <i>/<N> <sec>` line per rep plus a
  * per-query summary (median / min / max / n over 2× median — the
  * stall-draw count). Used by VERDICT r16 item 3 to decide whether the
  * engine's remaining per-round localCheckpoint chains
  * (ConnectedComponents.labels, Bfs.labeledDistances, the pagerank
  * family) draw the corpus-sized-write stall band or are exonerated:
  * their per-round frames are VERTEX-sized (|V| rows ≈ 5k-50k) where
  * the stalled BPE chains wrote TOKEN-sized frames (~10⁶ rows ×
  * whole-text strings) — the probe measures whether that 100× size gap
  * keeps them out of the band.
  */
object StallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "27").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "SPARK_GRAFT_PROBE_QUERIES is required")
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query $n"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // probe the scaled corpus (SPARK_GRAFT_PROBE_DIR=<dir> overrides,
    // e.g. the 1× dir for a baseline band)
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      ScaleBench.buildScaledDir(spark, sfDir, factor).toString)
    // session warm-up, same as ScaleBench: the first query otherwise
    // absorbs one-time scheduler/codegen cost that would read as a
    // fake first-rep stall
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val secs = (1 to reps).map { i =>
        graft.queries.Artifacts.clear()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[probe] $name%-24s rep $i%2d/$reps $sec%7.2f s")
        sec
      }
      val sorted = secs.sorted
      val med =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      val stalls = secs.count(_ > 2 * med)
      println(f"[probe-summary] $name%-24s median $med%6.2f  min ${sorted.head}%6.2f  max ${sorted.last}%6.2f  stalls(>2x med) $stalls%d/$reps")
    }
    spark.stop()
  }
}
