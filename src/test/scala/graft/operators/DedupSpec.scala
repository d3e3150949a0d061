package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextOps

class DedupSpec extends SparkSpec {

  private def docsDF(texts: Seq[String]) = {
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  test("jaccard is 1 for identical sets, 0 for disjoint, symmetric bounds") {
    val df = docsDF(Seq("a b c", "a b c", "x y z", "a b q"))
      .withColumn("tokset", array_distinct(TextOps.tokens(col("text"))))
    val pairs = df.as("l").crossJoin(df.as("r"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        Dedup.jaccard(col("l.tokset"), col("r.tokset")).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) == 0.0)
    assert(pairs((0L, 3L)) == 0.5) // {a,b} of {a,b,c,q}
    assert(pairs((3L, 0L)) == 0.5)
  }

  test("identical documents collide on every minhash band; disjoint ones on none") {
    val df = docsDF(Seq("w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "z1 z2 z3 z4 z5"))
      .withColumn("sig", Dedup.minhashSignature(array_distinct(TextOps.tokens(col("text")))))
      .select(col("doc_id"), explode(Dedup.bandHashes(col("sig"))).as("bh"))
      .select(col("doc_id"), col("bh.band"), col("bh.band_hash"))
    val bands = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = bands.groupBy(_._1).view.mapValues(_.map(b => (b._2, b._3)).toSet)
    assert(byDoc(0L) == byDoc(1L))
    assert(byDoc(0L).intersect(byDoc(2L)).isEmpty)
  }

  test("minhash estimate tracks exact jaccard on the corpus") {
    val df = graft.tables.Tables.documents(spark, sf).limit(50)
      .withColumn("tokset", array_distinct(TextOps.tokens(col("text"))))
      .withColumn("sig", Dedup.minhashSignature(col("tokset")))
    val a = df.select(col("doc_id").as("ia"), col("tokset").as("sa"), col("sig").as("ga"))
    val b = df.select(col("doc_id").as("ib"), col("tokset").as("sb"), col("sig").as("gb"))
    val stats = a.join(b, col("ib") === col("ia") + 1)
      .select(
        Dedup.jaccard(col("sa"), col("sb")).as("jac"),
        Dedup.minhashEstimate(col("ga"), col("gb")).as("est"))
      .agg(avg(abs(col("jac") - col("est")))).collect()(0).getDouble(0)
    // 16 hashes → σ ≈ 0.125 per pair; mean |error| well under 0.2
    assert(stats < 0.2, s"mean |jaccard - estimate| = $stats")
  }

  test("simhash: identical docs distance 0, near docs closer than far docs") {
    val df = docsDF(Seq(
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "q w e r t y u i"))
      .withColumn("sh", Dedup.simhash(TextOps.tokens(col("text"))))
      .select("doc_id", "sh")
    val sh = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) == 0)
    assert(ham(sh(0L), sh(2L)) < ham(sh(0L), sh(3L)))
  }

  test("shingles produce k-grams in order") {
    val got = docsDF(Seq("a b c d"))
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("s"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
  }
}
