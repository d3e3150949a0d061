package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r17): phase timing for the pcaPower chain. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pca] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.tables.Tables.embeddings(spark, sfDir)
    println(s"[pca] n_vecs=${emb.count()}")
    // stepwise replica of pcaFinish(pcaMoments(emb)) with timers
    (1 to 2).foreach { rep =>
      val moments = graft.queries.SimilarityQueries.pcaMoments(emb)
      val mm = moments.groupBy(col("i"), col("j"))
        .agg(sum(col("s")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = mm.filter(col("i") === -1L && col("j") === -1L)
        .select(col("s").cast("long").as("n"))
      val mu = mm.filter(col("i") >= 0L && col("j") === -1L)
        .crossJoin(broadcast(n))
        .select(col("i"), (col("s").cast("double") / col("n")).as("mu"))
      val s2 = mm.filter(col("j") >= 0L)
        .select(col("i"), col("j"), col("s").as("sxx"))
      val cu = s2.crossJoin(broadcast(n))
        .join(broadcast(mu.select(col("i"), col("mu").as("mu_i"))), "i")
        .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mu_j"))), "j")
        .select(col("i"), col("j"),
          round(col("sxx").cast("double") / col("n") - col("mu_i") * col("mu_j"), 12)
            .cast("decimal(18,12)").as("cq"))
      val cf = cu.unionByName(
          cu.filter(col("i") =!= col("j"))
            .select(col("j").as("i"), col("i").as("j"), col("cq")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var v = t(s"rep$rep v0 ckpt") {
        mu.select(col("i"), lit(0.125).cast("decimal(18,12)").as("vq"))
          .localCheckpoint()
      }
      var nrm: org.apache.spark.sql.DataFrame = null
      (1 to 3).foreach { r =>
        val u = t(s"rep$rep round$r u ckpt") {
          cf.join(v.select(col("i").as("j"), col("vq").as("vj")), "j")
            .groupBy(col("i")).agg(sum(col("cq") * col("vj")).as("u"))
            .select(col("i"),
              round(col("u").cast("double"), 12).cast("decimal(18,12)").as("uq"))
            .localCheckpoint()
        }
        nrm = u.agg(sqrt(sum(col("uq") * col("uq")).cast("double")).as("nrm"))
        v = u.crossJoin(broadcast(nrm))
          .select(col("i"),
            round(col("uq").cast("double") / col("nrm"), 12)
              .cast("decimal(18,12)").as("vq"))
      }
      t(s"rep$rep final noop") {
        v.crossJoin(broadcast(nrm))
          .select(col("i").cast("long").as("dim_idx"),
            round(col("vq").cast("double"), 6).as("loading_r"),
            round(col("nrm"), 6).as("eigval_r"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
