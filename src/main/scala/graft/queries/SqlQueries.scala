package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** SQL-string surface: the engine's tables registered as temp views +
  * `spark.sql(...)` — the analogue of the reference stack's dashboard
  * query path (InfluxQL over measurements, SURVEY.md §3.3), plus
  * correlated-subquery and outer-join coverage that the DataFrame
  * suite doesn't exercise.
  */
object SqlQueries {

  /** Register every sf table as a temp view (idempotent per session). */
  def registerViews(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
    Tables.events(s, dir).createOrReplaceTempView("events")
  }

  private def sql(q: String): Q = (s, dir) => {
    registerViews(s, dir)
    s.sql(q)
  }

  val queries: Map[String, Q] = Map(

    // TPC-H Q4-style: EXISTS correlated subquery through pure SQL.
    "q_sql_order_priority" -> sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin),

    // TPC-H Q17-style: correlated scalar-aggregate subquery (decimal
    // route so the 0.5·avg threshold is engine-exact).
    "q_sql_small_quantity_revenue" -> sql(
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey""".stripMargin),

    // Full outer join: per-nation customer vs supplier counts.
    "q_sql_outer_join" -> sql(
      """SELECT coalesce(c.k, s.k) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON c.k = s.k""".stripMargin)
  )

  val oracleSql: Map[String, String] = Map(
    "q_sql_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_sql_small_quantity_revenue" ->
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey""".stripMargin,

    "q_sql_outer_join" ->
      """SELECT coalesce(c.k, s.k) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON c.k = s.k""".stripMargin
  )
}
