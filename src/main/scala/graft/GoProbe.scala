package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe (r17): GlobalOrder construction vs execution cost. */
object GoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.range(100000).select(col("id"), (col("id") % 997).as("a"))
      .localCheckpoint()
    (1 to 4).foreach { rep =>
      var t0 = System.nanoTime()
      val rn = graft.operators.GlobalOrder.withRowNumber(base, "rn", Seq(col("a"), col("id")))
      rn.schema
      val tb = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      rn.write.format("noop").mode("overwrite").save()
      val te = (System.nanoTime() - t0) / 1e9
      println(f"[go] rep$rep build=$tb%.3f exec=$te%.3f")
    }
    spark.stop()
  }
}
