package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup
import graft.text.TextOps

/** MinHashSig vs the HOF formulation it replaced — identical
  * signatures on the corpus, codegen == interpreted, and the
  * duplicate/empty/null contracts.
  */
class MinHashSigSpec extends SparkSpec {

  test("matches the HOF route on the corpus (raw and pre-distinct input)") {
    val rows = graft.tables.Tables.documents(spark, sf).limit(100)
      .select(
        MinHashSig(TextOps.tokens(col("text"))).as("fast_raw"),
        Dedup.minhashSignatureHof(array_distinct(TextOps.tokens(col("text")))).as("ref"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("interpreted eval matches codegen") {
    val q = graft.tables.Tables.documents(spark, sf).limit(30)
      .select(MinHashSig(TextOps.tokens(col("text"))).as("sig"))
    val cg = q.collect().map(_.getSeq[Long](0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = q.collect().map(_.getSeq[Long](0))
      cg.zip(interp).foreach { case (x, y) => assert(x == y) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("duplicates ignored; empty -> 16 nulls; null array/token -> null") {
    import spark.implicits._
    val got = Seq(
      (1L, Some(Seq("x", "y", "x", "y"))),
      (2L, Some(Seq("x", "y"))),
      (3L, Some(Seq.empty[String])),
      (4L, None)
    ).toDF("id", "toks")
      .select(col("id"), MinHashSig(col("toks")).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Any](1))).toMap
    assert(got(1L) == got(2L))                       // multiset-insensitive
    assert(got(3L).asInstanceOf[Seq[Any]].forall(_ == null)) // empty → nulls
    assert(got(3L).asInstanceOf[Seq[Any]].length == 16)
    assert(got(4L) == null)
  }
}
