package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe (r17): warm DataFrame BUILD time for named queries. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count()
    args.foreach { name =>
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.schema
        val tb = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val te = (System.nanoTime() - t1) / 1e9
        println(f"[build] $name rep$rep build=$tb%.2f exec=$te%.2f")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
