package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup
import graft.tables.Tables

/** The bloom-pruned incremental dedup must be a PURE optimization:
  * bit-identical output to the unpruned query (no-false-negative
  * law), with the probe side actually shrunk (what the filter buys).
  */
class BloomJoinSpec extends SparkSpec {

  test("pruned output is identical to the unpruned join") {
    val plain = DedupQueries.queries("dedup_incremental")(spark, sf)
      .collect().map(_.toSeq).toSet
    val pruned = DedupQueries.queries("dedup_incremental_bloom")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(plain === pruned)
  }

  test("the filter prunes most of the probe side") {
    val isNew = col("doc_id") % 5 === 4
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.exactFingerprint(col("text")).as("fp"))
    val base = docs.filter(!isNew).select(col("fp").as("key")).distinct()
    val m = 16L * base.count()
    val bits = EventQueries.bloomBits(base, m)
    val batch = docs.filter(isNew)
    val nBatch = batch.count()
    val nMembers = EventQueries.bloomMembers(
      batch.select(col("doc_id").as("id"), col("fp").as("key")), bits, m).count()
    val nTrueDups = DedupQueries.queries("dedup_incremental")(spark, sf)
      .filter(col("exact_dup_of").isNotNull).count()
    info(s"batch=$nBatch members=$nMembers trueDups=$nTrueDups (m=$m bits)")
    // no false negatives: every true dup is a member …
    assert(nMembers >= nTrueDups)
    // … and the false-positive load keeps the probe side small: the
    // fixture batch is mostly novel, so members ≪ batch
    assert(nMembers < nBatch / 2,
      s"filter passed $nMembers of $nBatch — not pruning")
  }
}
