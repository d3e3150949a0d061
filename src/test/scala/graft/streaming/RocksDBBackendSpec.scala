package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ≙ the reference's state-backend swap (heap ↔ RocksDB,
  * ChangeBackend.java / TimingExplorer.java:66-72): in Spark the
  * backend is the state-store provider config. This spec runs the
  * windowed aggregation on RocksDB end-to-end, including a
  * stop/restart resume on the same checkpoint.
  */
class RocksDBBackendSpec extends SparkSpec {

  test("windowed aggregation runs on the RocksDB state backend") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("rocks-ckpt-").toString
      val t0 = 1704067200000L
      def run(data: Seq[(String, java.sql.Timestamp)], name: String): Long = {
        val input = MemoryStream[(String, java.sql.Timestamp)]
        input.addData(data)
        val q = input.toDF().toDF("key", "ts")
          .withWatermark("ts", "0 seconds")
          .groupBy(col("key"), window(col("ts"), "1 second"))
          .count()
          .writeStream.outputMode("append")
          .queryName(name).option("checkpointLocation", ckpt)
          .format("memory").start()
        q.processAllAvailable()
        q.stop()
        spark.table(name).count()
      }
      val batch1 = (0 until 30).map(i =>
        ("k" + (i % 2), new java.sql.Timestamp(t0 + i * 100L)))
      val n1 = run(batch1, "rocks_1")
      assert(n1 == 4) // 2 keys × 2 windows closed by wm 2.9 s
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
