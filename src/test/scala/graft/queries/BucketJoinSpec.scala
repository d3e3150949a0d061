package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** The point of bucketing is visible only in the plan: the join over
  * bucket-aligned tables must consume the written layout (zero
  * exchanges feeding the SortMergeJoin), while the same join over raw
  * parquet shuffles both sides.
  *
  * At fixture size the planner rightly prefers a broadcast join and
  * ignores bucketing, so both tests pin the AT-SCALE plan by turning
  * the broadcast threshold off — at 100 TB neither side of
  * orders ⋈ lineitem broadcasts, which is exactly when the written
  * layout is the only way to avoid re-shuffling the fact tables every
  * run.
  */
class BucketJoinSpec extends SparkSpec {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Broadcast)Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join plans with no shuffle before the join") {
    noBroadcast {
      val (o, l) = RelationalQueries.bucketedTables(spark, sf)
      val bucketed = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"), col("l_extendedprice"))
      val plain = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"), col("l_extendedprice"))
      assert(bucketed.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "bucketed join did not plan as SortMergeJoin")
      assert(exchanges(bucketed) === 0,
        s"bucketed join still shuffles:\n${bucketed.queryExecution.executedPlan.toString.take(1500)}")
      assert(exchanges(plain) >= 2,
        "expected the raw-parquet join to shuffle both sides")
    }
  }

  test("full query: the only exchange left is the final aggregation") {
    noBroadcast {
      val n = exchanges(RelationalQueries.queries("q_bucketed_join")(spark, sf))
      assert(n === 1, s"expected exactly the agg exchange, got $n")
    }
  }
}
