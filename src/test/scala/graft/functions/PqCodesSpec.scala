package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.SimilarityQueries

/** The codegen'd PQ encoder vs the higher-order-function route it
  * replaced (per-subspace array_min over (surrogate-dist, j) structs
  * on exact-decimal dots) — identical code words on the corpus,
  * codegen == interpreted, null contract pinned.
  */
class PqCodesSpec extends SparkSpec {

  private def emb = graft.tables.Tables.embeddings(spark, sf)

  private def centArr = SimilarityQueries.pqCentArrOf(
    SimilarityQueries.pqCodebookLongOf(emb, col("vec_id") % 16))

  test("codebook j values are contiguous 0..K-1 per subspace (the positional-lut contract)") {
    // adcRankedOf indexes the flattened lut as m*k + code + 1 — only
    // sound when every subspace's j-sorted entries are gap-free
    val rows = SimilarityQueries.pqCodebookLongOf(emb, col("vec_id") % 16)
      .select(col("m"), col("j")).distinct().collect()
      .groupBy(_.getLong(0)).map { case (m, rs) => m -> rs.map(_.getLong(1)).sorted.toSeq }
    assert(rows.keySet === (0L until 8L).toSet)
    rows.foreach { case (m, js) =>
      assert(js === (0L until 16L).toSeq, s"subspace $m has gaps: $js")
    }
  }

  test("matches the HOF array_min formulation on every corpus vector") {
    val cg = SimilarityQueries.pqEncodedOf(emb, centArr)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = SimilarityQueries.pqEncodedHofOf(emb, centArr)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cg.nonEmpty && cg.keySet === hof.keySet)
    cg.foreach { case (id, codes) =>
      assert(codes === hof(id), s"vec $id: cg=$codes hof=${hof(id)}")
      assert(codes.length === 8 && codes.forall(c => c >= 0 && c < 16))
    }
  }

  test("interpreted eval matches codegen (whole-stage off)") {
    val q = SimilarityQueries.pqEncodedOf(emb.limit(50), centArr)
    val cg = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(cg === interp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null contract: null vector, dim not divisible by M, empty cell") {
    import spark.implicits._
    val good = Seq((0L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    // 2 subspaces x 1 entry each, dsub = 4
    def cell(j: Long) = struct(lit(j).as("j"),
      array(Seq.fill(4)(lit(0.25)): _*).as("centroid"), lit(0.25).as("ccsq"))
    val cents2 = good.select(array(array(cell(0)), array(cell(1))).as("cents"))
      .limit(1)
    val ok = good.crossJoin(cents2)
      .select(PqCodes(col("embedding"), col("cents")).as("codes")).collect()
    assert(ok(0).getSeq[Long](0) === Seq(0L, 1L))

    val nullVec = Seq((0L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
      .crossJoin(cents2)
      .select(PqCodes(col("embedding"), col("cents")).as("codes")).collect()
    assert(nullVec(0).isNullAt(0))

    // dim 7 not divisible by 2 subspaces -> null
    val badDim = Seq((0L, Seq.fill(7)(0.5f))).toDF("vec_id", "embedding")
      .crossJoin(cents2)
      .select(PqCodes(col("embedding"), col("cents")).as("codes")).collect()
    assert(badDim(0).isNullAt(0))

    // subspace-length mismatch (centroid dim 4 vs dsub 2 when M=4... use
    // M=2 with a 3-long centroid) -> null
    def badCell = struct(lit(0L).as("j"),
      array(lit(0.25), lit(0.25), lit(0.25)).as("centroid"), lit(0.25).as("ccsq"))
    val centsBad = good.select(array(array(badCell), array(badCell)).as("cents")).limit(1)
    val mism = good.crossJoin(centsBad)
      .select(PqCodes(col("embedding"), col("cents")).as("codes")).collect()
    assert(mism(0).isNullAt(0))
  }

  test("registered through the SQL surface (GraftExtensions route)") {
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    graft.tables.Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("pq_sql_emb")
    SimilarityQueries.pqCentArrOf(
      SimilarityQueries.pqCodebookLongOf(emb, col("vec_id") % 16))
      .createOrReplaceTempView("pq_sql_cents")
    val out = spark.sql(
      "SELECT vec_id, pq_encode(embedding, cents) AS codes FROM pq_sql_emb CROSS JOIN pq_sql_cents")
      .collect()
    assert(out.length === 5)
    out.foreach(r => assert(r.getSeq[Long](1).length === 8))
  }
}
