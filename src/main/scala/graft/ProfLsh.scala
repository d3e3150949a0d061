package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.operators.Dedup
import graft.tables.Tables

/** Scratch profiling main for the dedup hot paths (not part of the
  * library surface; run with `sbt "runMain graft.ProfLsh"`).
  */
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

    // stage decomposition of dedup_lsh_pairs
    val sigs = Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        Dedup.minhashSignature(array_distinct(col("toks"))).as("sig"))
    time("sigs") { sigs.count() }
    val sigsP = sigs.persist(); sigsP.count()

    def side(n: String) = {
      val cols = (0 until Dedup.RowsPerBand).map(i =>
        element_at(col(s"sig_$n"), col("band") * Dedup.RowsPerBand + i + 1).as(s"k$i"))
      sigsP.select(col("doc_id").as(n), col("sig").as(s"sig_$n"),
          explode(sequence(lit(0), lit(Dedup.NumBands - 1))).as("band"))
        .select(Seq(col(n), col(s"sig_$n"), col("band")) ++ cols: _*)
    }
    val keys = Seq("band") ++ (0 until Dedup.RowsPerBand).map(i => s"k$i")
    val earlierMatch = size(filter(
      sequence(lit(0), col("band")),
      bp => bp < col("band") && (0 until Dedup.RowsPerBand).map(i =>
        element_at(col("sig_doc_a"), bp * Dedup.RowsPerBand + i + 1) ===
          element_at(col("sig_doc_b"), bp * Dedup.RowsPerBand + i + 1))
        .reduce(_ && _))) > 0
    val cand = side("doc_a").join(side("doc_b"), keys)
      .filter(col("doc_a") < col("doc_b"))
      .filter(!earlierMatch)
      .select("doc_a", "doc_b")
    time("cand") { cand.count() }
    val candP = cand.persist(); candP.count()

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(transform(TextOps.tokens(col("text")),
          t => TextOps.tokenHash31(t))).as("tokset"))
    time("toksets") { docs.count() }
    val docsP = docs.persist(); docsP.count()

    val verify = candP
      .join(docsP.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("tokset", "set_a"), "doc_a")
      .join(docsP.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("tokset", "set_b"), "doc_b")
      .withColumn("jac", Dedup.jaccard(col("set_a"), col("set_b")))
      .filter(col("jac") >= 0.2)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard_r"))
    time("verify (all cached)") { verify.count() }

    spark.catalog.clearCache()
    time("full dedup_lsh_pairs") {
      queries.DedupQueries.queries("dedup_lsh_pairs")(spark, dir).count()
    }
    time("dedup_simhash") {
      queries.DedupQueries.queries("dedup_simhash")(spark, dir).count()
    }
    spark.stop()
  }
}
