package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextOps

/** ShingleHashes vs the composed-builtins route it replaced —
  * identical distinct hash sets on the corpus, plus codegen ==
  * interpreted and the short-document / null contracts.
  */
class ShingleHashesSpec extends SparkSpec {

  test("matches array_distinct(transform(shingles, tokenHash31)) on the corpus") {
    val rows = graft.tables.Tables.documents(spark, sf).limit(100)
      .select(
        ShingleHashes(TextOps.tokens(col("text")), 3).as("fast"),
        array_distinct(transform(TextOps.shingles(TextOps.tokens(col("text")), 3),
          sh => TextOps.tokenHash31(sh))).as("ref"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("interpreted eval matches codegen") {
    val q = graft.tables.Tables.documents(spark, sf).limit(30)
      .select(ShingleHashes(TextOps.tokens(col("text")), 3).as("sh"))
    val cg = q.collect().map(_.getSeq[Long](0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = q.collect().map(_.getSeq[Long](0))
      cg.zip(interp).foreach { case (x, y) => assert(x == y) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("short docs yield no shingles; duplicate shingles dedupe; null token -> null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b"))),          // < k tokens → empty
      (2L, Some(Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"))), // repeats dedupe
      (3L, None)                          // null array → null
    ).toDF("id", "toks")
      .select(col("id"), ShingleHashes(col("toks"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(df(1L) == Seq.empty)
    // "a b c" / "b c a" / "c a b" repeated → exactly 3 distinct hashes
    assert(df(2L).asInstanceOf[Seq[Long]].length == 3)
    assert(df(3L) == null)
  }
}
