package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.tables.Tables

/** Scratch profiling main for the similarity hot paths (not part of
  * the library surface; run with `sbt "runMain graft.ProfLsh"`).
  */
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1).count() // warm

    val emb = Tables.embeddings(spark, dir)
    println(s"emb rows = ${emb.count()}")

    time("norms only") {
      noop(emb.select(sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")).as("n")))
    }
    val embN = emb.withColumn("nrm", sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")))
    val q = embN.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val pairs = embN.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
    time("cross join only (no cos)") { noop(pairs.select("vec_id", "q_id")) }
    time("cross join + decimal cos") {
      noop(pairs.withColumn("cos",
        VectorOps.dotDecimal(col("q_emb"), col("embedding")).cast("double") /
          (col("q_nrm") * col("nrm"))).select("vec_id", "q_id", "cos"))
    }
    time("full bruteforce query") {
      noop(queries.SimilarityQueries.queries("ann_topk_bruteforce")(spark, dir))
    }
    time("full ivf query") {
      noop(queries.SimilarityQueries.queries("ann_topk_ivf")(spark, dir))
    }
    spark.stop()
  }
}
