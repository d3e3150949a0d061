package graft.queries

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.PseudoWindow

/** Streaming operators run end-to-end as bounded queries: the events
  * table replayed through a file streaming source → watermark →
  * windowed aggregation → memory sink, compared against the same
  * aggregation in DuckDB. Append-mode emission is watermark-gated, so
  * the oracle carries the same cutoff: only windows whose end ≤
  * max(ts) (the final watermark with 0 s delay) are emitted.
  */
object StreamingQueries {

  private val runId = new AtomicInteger(0)

  /** Temp dirs created for the in-flight query (source symlink dir +
    * checkpoint); deleted by runToMemory once the memory sink holds
    * the full result, so a 55-query Verify/Bench run stays bounded on
    * disk (VERDICT r1 item 7). Single-threaded builder usage — each
    * query constructs its stream then immediately runs it.
    */
  private val pendingTmp = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()

  /** events.parquet as a streaming DataFrame with (ts_ms, ts) like
    * Tables.events (nanos → ms; file sources need an explicit schema).
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // The file streaming source requires a directory: expose the single
    // events.parquet file through a symlinked temp dir.
    val streamDir = Files.createTempDirectory("graft-stream-src-")
    pendingTmp.synchronized { pendingTmp += streamDir }
    Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    s.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts_ms", expr("CAST(ts DIV 1000000 AS BIGINT)"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    }
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the accumulated result table. The checkpoint and source
    * temp dirs are deleted afterwards — the memory sink holds the
    * rows, so nothing references them once the query stops.
    */
  private def runToMemory(s: SparkSession, streamed: DataFrame,
                          rocksdb: Boolean = false): DataFrame = {
    val name = s"stream_out_${runId.incrementAndGet()}"
    val ckpt = Files.createTempDirectory("graft-ckpt-")
    pendingTmp.synchronized { pendingTmp += ckpt }
    // transformWithState stores each state variable as its own column
    // family — supported by the RocksDB provider only (the provider a
    // 100 TB deployment runs anyway). The conf is captured at query
    // start, so setting it around start() scopes it to this query.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    if (rocksdb) s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Stateful streaming pins one state-store instance per shuffle
    // partition per stateful operator for the query's lifetime, and
    // AQE cannot coalesce them — at bounded-replay scale the per-batch
    // store open/commit overhead dominates (a stream-stream join keeps
    // 4 stores per partition). Size the stateful shuffle explicitly;
    // a real deployment sizes it to state volume, not the batch
    // session's CPU count. Captured at query start, so setting it
    // around start() scopes it to this query.
    val partKey = "spark.sql.shuffle.partitions"
    val prevPart = s.conf.getOption(partKey)
    s.conf.set(partKey, "8")
    val q = try {
      streamed.writeStream
        .outputMode("append")
        .queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .format("memory")
        .start()
    } finally {
      prevPart match {
        case Some(p) => s.conf.set(partKey, p)
        case None => s.conf.unset(partKey)
      }
      if (rocksdb) {
        prevProv match {
          case Some(p) => s.conf.set(provKey, p)
          case None => s.conf.unset(provKey)
        }
      }
    }
    try {
      q.processAllAvailable()
      // processAllAvailable returns once source offsets are consumed;
      // the watermark-driven flush runs as one more no-data micro-batch
      // — wait until it has been observed before stopping.
      val deadline = System.currentTimeMillis() + 15000
      while (!q.recentProgress.exists(_.numInputRows == 0) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
      }
      q.processAllAvailable()
    } finally q.stop()
    pendingTmp.synchronized {
      pendingTmp.foreach(deleteRecursively)
      pendingTmp.clear()
    }
    s.table(name)
  }

  val queries: Map[String, Q] = Map(

    // Idiomatic streaming path (SURVEY.md §2 #8, event-time variant):
    // watermark + window() + append — state purge engine-managed.
    "stream_window_agg" -> ((s, dir) => {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .groupBy(col("event_type"), window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"),
             asDouble(sum(dec(col("value")))).as("sum_value"))
        .select(col("event_type"),
                unix_millis(col("window.start")).as("window_start_ms"),
                col("cnt"), col("sum_value"))
      runToMemory(s, agg)
    }),

    // Streaming exact dedup (dropDuplicates on the full output tuple:
    // whichever physical row survives, the emitted VALUES are the
    // distinct set — deterministic and oracle-checkable).
    "stream_dedup" -> ((s, dir) => {
      val dedup = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("event_type"),
                (col("ts_ms") - col("ts_ms") % 86400000L).as("day_ms"))
        .dropDuplicates("user_id", "event_type", "day_ms")
      runToMemory(s, dedup)
    }),

    // Built-in session windows (30-min gap) — the engine-managed twin
    // of events_sessionize; append emits sessions once the watermark
    // passes last_event + gap.
    "stream_session_window" -> ((s, dir) => {
      val sessions = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                unix_millis(col("session_window.start")).as("session_start_ms"),
                unix_millis(col("session_window.end")).as("session_end_ms"),
                col("n_events"))
      runToMemory(s, sessions)
    }),

    // Strict-parity stateful path: the flatMapGroupsWithState port of
    // the reference's MapState+timer machine, emitting the exact
    // endOfWindow timestamps (start + duration − 1 ms).
    "stream_pseudo_window" -> ((s, dir) => {
      implicit val enc = org.apache.spark.sql.Encoders.product[PseudoWindow.Point]
      val pts = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .select(col("event_type").as("key"), col("ts_ms").as("tsMs"),
                col("value"), col("ts"))
        .as[PseudoWindow.Point]
      val counts = PseudoWindow.eventTime(pts, 3600000L)
      runToMemory(s, counts.toDF())
        .select(col("key"), col("windowEndMs").as("window_end_ms"), col("cnt"))
    }),

    // Stream-stream inner join with event-time range bounds: views
    // joined to the same user's purchases within the following hour.
    // Watermarks on BOTH sides + the time-range condition let the
    // engine purge join state once the watermark passes ts_v + 1 h —
    // bounded state at unbounded input, the production shape for
    // attribution joins. Bounded replay ≡ the batch interval join, so
    // the oracle is exact.
    "stream_stream_join" -> ((s, dir) => {
      val views = eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts_ms").as("view_ms"),
                col("ts").as("v_ts"))
        .withWatermark("v_ts", "0 seconds")
      val purchases = eventsStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_ms").as("purchase_ms"),
                col("ts").as("p_ts"))
        .withWatermark("p_ts", "0 seconds")
      val joined = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("v_user").as("user_id"), col("view_ms"), col("purchase_ms"))
      runToMemory(s, joined)
    }),

    // Stream-stream LEFT OUTER join: same attribution join, but views
    // with NO purchase in the following hour emit a null-matched row
    // once the watermark passes view_ts + 1 h (state eviction IS the
    // "no match will ever come" proof — the outer-join-specific
    // mechanism). The query's GLOBAL watermark is the MIN across both
    // watermarked sides — here the purchase stream's max event time,
    // which trails the view stream's — so the oracle's emission cutoff
    // is view_ms + 1 h ≤ least(max view_ms, max purchase_ms); views
    // past that stay unmatched-unemitted in the bounded replay.
    "stream_outer_join" -> ((s, dir) => {
      val views = eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts_ms").as("view_ms"),
                col("ts").as("v_ts"))
        .withWatermark("v_ts", "0 seconds")
      val purchases = eventsStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_ms").as("purchase_ms"),
                col("ts").as("p_ts"))
        .withWatermark("p_ts", "0 seconds")
      val joined = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
        .select(col("v_user").as("user_id"), col("view_ms"), col("purchase_ms"))
      runToMemory(s, joined)
    }),

    // The same MapState+timer machine on the MODERN arbitrary-state
    // API (transformWithState, Spark 4.x): real per-key MapState + one
    // registered timer per open window — the literal structural twin
    // of the reference's KeyedProcessFunction (PseudoWindowTws).
    // Identical semantics, so it shares stream_pseudo_window's oracle.
    "stream_pseudo_window_tws" -> ((s, dir) => {
      implicit val enc = org.apache.spark.sql.Encoders.product[PseudoWindow.Point]
      val pts = eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .select(col("event_type").as("key"), col("ts_ms").as("tsMs"),
                col("value"), col("ts"))
        .as[PseudoWindow.Point]
      val counts = graft.streaming.PseudoWindowTws.eventTime(pts, 3600000L)
      runToMemory(s, counts.toDF(), rocksdb = true)
        .select(col("key"), col("windowEndMs").as("window_end_ms"), col("cnt"))
    })
  )

  // Both oracles cut at the final watermark: windows closed by
  // wm = max(ts_ms) are exactly those with end ≤ wm.
  val oracleSql: Map[String, String] = Map(
    "stream_window_agg" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 1000000 AS ts_ms, value FROM events
        |), agg AS (
        |  SELECT event_type,
        |    ts_ms - (ts_ms % 3600000) AS window_start_ms,
        |    count(*) AS cnt,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT * FROM agg
        |WHERE window_start_ms + 3600000 <= (SELECT max(ts_ms) FROM e)""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
        |  (epoch_ns(ts) // 1000000) - ((epoch_ns(ts) // 1000000) % 86400000) AS day_ms
        |FROM events""".stripMargin,

    // Session semantics: a new session starts when the gap is >= 30 min
    // (Spark merges an event only if it lands strictly inside the open
    // window). Emission cutoff: session_end <= final watermark.
    "stream_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts_ms,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |           OR ts_ms - lag(ts_ms) OVER w >= 1800000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |), sessions AS (
        |  SELECT user_id, ts_ms,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM flagged
        |), agg AS (
        |  SELECT user_id,
        |    min(ts_ms) AS session_start_ms,
        |    max(ts_ms) + 1800000 AS session_end_ms,
        |    count(*) AS n_events
        |  FROM sessions GROUP BY user_id, sid
        |)
        |SELECT * FROM agg
        |WHERE session_end_ms <= (SELECT max(ts_ms) FROM e)""".stripMargin,

    "stream_pseudo_window" -> pseudoWindowOracle,
    "stream_pseudo_window_tws" -> pseudoWindowOracle,

    "stream_stream_join" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms FROM events
        |)
        |SELECT v.user_id, v.ts_ms AS view_ms, p.ts_ms AS purchase_ms
        |FROM e v JOIN e p
        |  ON v.event_type = 'view' AND p.event_type = 'purchase'
        | AND p.user_id = v.user_id
        | AND p.ts_ms >= v.ts_ms AND p.ts_ms < v.ts_ms + 3600000""".stripMargin,

    // Outer-join emission cutoff = the query's global watermark = MIN
    // of the two sides' max event times (see the query comment).
    "stream_outer_join" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms FROM events
        |), v AS (
        |  SELECT user_id, ts_ms AS view_ms FROM e WHERE event_type = 'view'
        |), p AS (
        |  SELECT user_id, ts_ms AS purchase_ms FROM e WHERE event_type = 'purchase'
        |), wm AS (
        |  SELECT least((SELECT max(view_ms) FROM v),
        |               (SELECT max(purchase_ms) FROM p)) AS w
        |), matched AS (
        |  SELECT v.user_id, v.view_ms, p.purchase_ms
        |  FROM v JOIN p ON p.user_id = v.user_id
        |    AND p.purchase_ms >= v.view_ms AND p.purchase_ms < v.view_ms + 3600000
        |), unmatched AS (
        |  SELECT v.user_id, v.view_ms, CAST(NULL AS BIGINT) AS purchase_ms
        |  FROM v, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM p
        |          WHERE p.user_id = v.user_id
        |            AND p.purchase_ms >= v.view_ms
        |            AND p.purchase_ms < v.view_ms + 3600000)
        |    AND v.view_ms + 3600000 <= wm.w
        |)
        |SELECT * FROM matched UNION ALL SELECT * FROM unmatched""".stripMargin
  )

  private lazy val pseudoWindowOracle =
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 1000000 AS ts_ms FROM events
      |), agg AS (
      |  SELECT event_type AS key,
      |    ts_ms - (ts_ms % 3600000) + 3599999 AS window_end_ms,
      |    count(*) AS cnt
      |  FROM e GROUP BY 1, 2
      |)
      |SELECT * FROM agg
      |WHERE window_end_ms <= (SELECT max(ts_ms) FROM e)""".stripMargin
}
