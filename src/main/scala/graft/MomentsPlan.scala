package graft
import org.apache.spark.sql.SparkSession
object MomentsPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.01")
    graft.queries.SimilarityQueries.pcaMoments(emb).explain("formatted")
    spark.stop()
  }
}
