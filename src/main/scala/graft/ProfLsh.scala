package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$c")
    }
    spark.range(1).count() // warm
    time("bands") { queries.DedupQueries.queries("dedup_minhash_bands")(spark, dir).count() }
    val bands = queries.DedupQueries.queries("dedup_minhash_bands")(spark, dir).persist()
    bands.count()
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
    val cand = a.join(b, Seq("band", "band_hash")).filter(col("doc_a") < col("doc_b")).select("doc_a","doc_b")
    time("cand raw") { cand.count() }
    time("cand distinct") { cand.distinct().count() }
    time("full query") { queries.DedupQueries.queries("dedup_lsh_pairs")(spark, dir).count() }
    spark.stop()
  }
}
