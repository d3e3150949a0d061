package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental view maintenance (`cdc_agg_maintain` internals):
  * the delta fold composes — two sequential folds ≡ one fold of the
  * union ≡ re-aggregating the patched base — including group death
  * (count → 0) and group birth (insert into an unseen group).
  */
class MaintenanceSpec extends SparkSpec {

  private def dView(rows: Seq[(String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("l_returnflag", "dq0", "dn")
      .select(col("l_returnflag"), col("dq0").cast("decimal(18,4)").as("dq"),
              col("dn"))
  }

  private def collectView(df: org.apache.spark.sql.DataFrame) =
    df.select(col("l_returnflag"), col("n_rows"),
        col("sq").cast("double").as("sq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("sequential folds == union fold == re-aggregated patched base") {
    import spark.implicits._
    val base = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 5.0),
                   (4L, "C", 7.5))
      .toDF("l_orderkey", "l_returnflag", "l_quantity")
    // d1: update A(+5 on one row), delete B's only row (group death)
    val d1 = dView(Seq(("A", 5.0, 0L), ("B", -5.0, -1L)))
    // d2: insert two rows into new group D (group birth), delete the
    // A row d1 just updated (current value 15 = 10 + 5)
    val d2 = dView(Seq(("D", 3.0, 1L), ("D", 4.0, 1L), ("A", -15.0, -1L)))
    val s0 = RelationalQueries.aggState(base)
    val sequential = collectView(
      RelationalQueries.maintainedView(
        RelationalQueries.maintainedView(s0, d1), d2))
    val unioned = collectView(
      RelationalQueries.maintainedView(s0, d1.unionByName(d2)))
    val patched = Seq((2L, "A", 20.0),
                      (4L, "C", 7.5), (5L, "D", 3.0), (6L, "D", 4.0))
      .toDF("l_orderkey", "l_returnflag", "l_quantity")
    val recomputed = collectView(RelationalQueries.aggState(patched)
      .withColumn("sq", col("sq").cast("decimal(18,4)")))
    assert(sequential === recomputed)
    assert(unioned === recomputed)
    // group death is real: B is gone, D was born
    assert(!sequential.exists(_._1 == "B") && sequential.exists(_._1 == "D"))
  }
}
