package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** Incremental IVF maintenance (`ann_index_append`): the oracle pins
  * the search result's exact values; this pins the MAINTENANCE
  * properties that make appending sound —
  *
  *  1. append ≡ rebuild: base-lists ∪ batch-assignment is row-for-row
  *     identical to assigning the whole corpus against the same frozen
  *     centroids (the identity the DuckDB twin relies on);
  *  2. search-after-append ≡ search-over-rebuilt;
  *  3. the batch opens no new lists (frozen centroids ⇒ every
  *     appended row lands in an existing list), and the appended index
  *     covers exactly the full corpus with no duplicates.
  */
class IvfAppendSpec extends SparkSpec {

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val cents = SimilarityQueries.appendCentArr(spark, sf)
  private lazy val appended = SimilarityQueries.appendedAssigned(spark, sf)
  private lazy val rebuilt = SimilarityQueries.assignTo(
    graft.tables.Tables.embeddings(spark, sf)
      .withColumn("nrm",
        sqrt(graft.functions.VectorOps.normSqDecimal(col("embedding")).cast("double"))),
    cents)

  test("append ≡ rebuild: identical assignment rows") {
    val a = collectSorted(appended.select("vec_id", "list_id"))
    val r = collectSorted(rebuilt.select("vec_id", "list_id"))
    assert(a.nonEmpty && a == r)
  }

  test("search-after-append ≡ search-over-rebuilt") {
    val sa = collectSorted(SimilarityQueries.ivfSearchOver(spark, sf)(cents, appended))
    val sr = collectSorted(SimilarityQueries.ivfSearchOver(spark, sf)(cents, rebuilt))
    assert(sa.nonEmpty && sa == sr)
  }

  test("batch opens no new lists and the appended index covers the corpus exactly") {
    val baseLists = SimilarityQueries.appendBaseAssigned(spark, sf)
      .select("list_id").distinct().collect().map(_.getLong(0)).toSet
    val batchLists = SimilarityQueries.appendBatch(spark, sf)
      .count() // force the filter shape is non-empty
    assert(batchLists > 0)
    val newLists = appended.select("list_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(newLists.subsetOf(baseLists))
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(appended.count() == n)
    assert(appended.select("vec_id").distinct().count() == n)
  }
}
