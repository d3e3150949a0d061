package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CentroidRanks vs the higher-order-function formulation it replaced
  * (transform + comparator array_sort over exact-decimal cosines) —
  * identical rankings on the corpus, and codegen == interpreted.
  */
class CentroidRanksSpec extends SparkSpec {

  private def centArr = {
    val emb = graft.tables.Tables.embeddings(spark, sf)
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg((sum(col("x").cast("double").cast("decimal(28,14)")).cast("double") /
            count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("pairs"))
      .select(col("label").cast("long").as("list_id"),
              transform(col("pairs"), p => p.getField("c")).as("centroid"))
      .select(struct(col("list_id"), col("centroid"),
          sqrt(VectorOps.normSqDecimal(col("centroid")).cast("double")).as("cnorm"))
        .as("cent"))
      .agg(array_sort(collect_list(col("cent"))).as("cents"))
  }

  private def base =
    graft.tables.Tables.embeddings(spark, sf).limit(100)
      .withColumn("nrm", sqrt(VectorOps.normSqDecimal(col("embedding")).cast("double")))
      .crossJoin(broadcast(centArr))

  test("matches the HOF transform+array_sort ranking on the corpus") {
    val hof = array_sort(
      transform(col("cents"), c => struct(
        (VectorOps.dotDecimal(col("embedding"), c.getField("centroid")).cast("double") /
          (col("nrm") * c.getField("cnorm"))).as("ccos"),
        c.getField("list_id").as("list_id"))),
      (l, r) => when(l.getField("ccos") > r.getField("ccos"), -1)
        .when(l.getField("ccos") < r.getField("ccos"), 1)
        .otherwise((l.getField("list_id") - r.getField("list_id")).cast("int")))
    val rows = base.select(
        CentroidRanks(col("embedding"), col("nrm"), col("cents")).as("fast"),
        transform(hof, p => p.getField("list_id")).as("ref"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fast=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
    }
  }

  test("interpreted eval matches codegen") {
    val q = base.select(CentroidRanks(col("embedding"), col("nrm"), col("cents")).as("r"))
    val cg = q.collect().map(_.getSeq[Long](0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = q.collect().map(_.getSeq[Long](0))
      cg.zip(interp).foreach { case (x, y) => assert(x == y) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
