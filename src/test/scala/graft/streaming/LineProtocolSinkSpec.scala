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
