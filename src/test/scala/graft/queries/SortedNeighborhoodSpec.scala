package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for sorted-neighborhood edit-distance dedup
  * (`dedup_sorted_neighborhood`): the W·n pair-work bound that makes
  * blocking scale, independent recomputation of the reported edit
  * distances, the exact-duplicate recall guarantee inside the window,
  * and the one-shuffle/one-window plan shape.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  // sf0.01: sf0.001's 2-char-prefix buckets hold <= 3 docs, so the
  // W-neighbor window degenerates (nearly every in-bucket pair is
  // within reach and the blocking laws test nothing).
  private val dir = "/root/testdata/sf0.01"

  private lazy val edges =
    DedupQueries.queries("dedup_sorted_neighborhood")(spark, dir).collect()

  private lazy val keyed = Tables.documents(spark, dir)
    .select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 64)
        .as("snkey"))
    .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Reference Wagner–Fischer edit distance (plain Scala — independent
    * of both engines' levenshtein).
    */
  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    for (i <- 1 to a.length) {
      var diag = prev(0); prev(0) = i
      for (j <- 1 to b.length) {
        val cost = math.min(math.min(prev(j), prev(j - 1)) + 1,
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = prev(j); prev(j) = cost
      }
    }
    prev(b.length)
  }

  test("pair work is bounded by W·n — the blocking law") {
    assert(edges.length <= DedupQueries.SnWindow * keyed.size)
    // and it is not vacuous: the fixture's near-dups produce matches
    assert(edges.nonEmpty)
  }

  test("reported distances are real edit distances, within threshold") {
    edges.foreach { r =>
      val d = lev(keyed(r.getLong(0)), keyed(r.getLong(1)))
      assert(d == r.getInt(2), s"${r.getLong(0)}->${r.getLong(1)}: $d vs ${r.getInt(2)}")
      assert(d <= DedupQueries.SnMaxDist)
    }
  }

  test("exact duplicates within the window are always found (recall floor)") {
    // every pair of docs with IDENTICAL normalized keys at sort-rank
    // distance <= W must appear as a dist-0 edge — sorting puts equal
    // keys adjacent, which is the blocking argument for exact dups
    val byBucket = keyed.toSeq
      .map { case (id, k) => (k.take(2), k, id) }
      .groupBy(_._1)
    val got = edges.filter(_.getInt(2) == 0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var expected = 0
    byBucket.values.foreach { rows =>
      val sorted = rows.sortBy(t => (t._2, t._3))
      for (i <- sorted.indices;
           j <- (i + 1) until math.min(i + 1 + DedupQueries.SnWindow, sorted.length)
           if sorted(i)._2 == sorted(j)._2) {
        expected += 1
        assert(got.contains((sorted(i)._3, sorted(j)._3)),
          s"missing exact-dup edge ${sorted(i)._3}->${sorted(j)._3}")
      }
    }
    info(s"$expected exact-dup edges, all recalled")
    assert(expected > 0, "fixture has no in-window exact dups — law vacuous")
  }

  test("plan: one bucket shuffle, one Window node, no join") {
    val plan = DedupQueries.queries("dedup_sorted_neighborhood")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(1500))
    assert("Window".r.findAllIn(plan).length == 1, plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
  }
}
