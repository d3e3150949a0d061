package graft.streaming

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** ≙ InfluxDBSink format/lifecycle parity (SURVEY.md §2 #9): line
  * protocol with measurement, key tag, value field, ms timestamp.
  */
class LineProtocolSinkSpec extends SparkSpec {

  test("streams points as InfluxDB line protocol") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long, Double)]
    val outDir = Files.createTempDirectory("lp-out-").toString
    val ckpt = Files.createTempDirectory("lp-ckpt-").toString
    val q = LineProtocolSink.write(
      input.toDF().toDF("key", "ts_ms", "value"),
      "sensors", outDir, ckpt)
    input.addData(("temp", 1704067200000L, 0.5), ("pressure", 1704067200100L, -0.25))
    q.processAllAvailable()
    q.stop()

    val lines = Files.list(java.nio.file.Paths.get(outDir)).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq.sorted
    assert(lines == Seq(
      "sensors,key=pressure value=-0.25 1704067200100",
      "sensors,key=temp value=0.5 1704067200000"))
  }

  test("HTTP transport POSTs line-protocol batches to /write (in-process server)") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.HttpServer
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/write", exchange => {
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      received.add((exchange.getRequestURI.toString, body))
      exchange.sendResponseHeaders(204, -1)
      exchange.close()
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
      val w = new HttpLineProtocolWriter("sensors", endpoint, batchSize = 3)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
      def row(k: String, ts: Long, v: Double) =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](k, ts, v), schema)
      assert(w.open(0L, 0L))
      (1 to 7).foreach(i => w.process(row("temp", 1704067200000L + i, i / 10.0)))
      w.close(null)
      // 7 rows at batchSize 3 → two full batches + the close flush
      val posts = received.asScala.toSeq
      assert(posts.length == 3)
      assert(posts.forall(_._1 == "/write?db=sineWave&precision=ms"))
      val lines = posts.flatMap(_._2.split("\n"))
      assert(lines.length == 7)
      assert(lines.head == "sensors,key=temp value=0.1 1704067200001")
    } finally server.stop(0)
  }

  test("HTTP transport fails the task on a non-2xx response (at-least-once)") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.HttpServer
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/write", exchange => {
      exchange.sendResponseHeaders(500, -1); exchange.close()
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
      val w = new HttpLineProtocolWriter("sensors", endpoint, batchSize = 1)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
      w.open(0L, 0L)
      val err = intercept[java.io.IOException] {
        w.process(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](1L, 1.0), schema))
      }
      assert(err.getMessage.contains("HTTP 500"))
    } finally server.stop(0)
  }

  test("format omits the tag for unkeyed points") {
    val w = new LineProtocolWriter("eventsPerSecond", "/tmp/unused")
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](1704067200999L, 10.0),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts_ms", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
    assert(w.format(row) == "eventsPerSecond value=10.0 1704067200999")
  }
}
