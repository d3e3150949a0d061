package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

/** Laws for the data-quality audit (`q_expectations`): every check's
  * population and violation count recomputed from raw rows.
  */
class ExpectationsSpec extends SparkSpec {

  private lazy val rows =
    RelationalQueries.queries("q_expectations")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("all six checks report raw-recomputed populations and violations") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity")).collect()
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms")).collect()
    val cust = Tables.customer(spark, sf).select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    val okeys = ord.map(_.getLong(0)).toSet

    val expected = Map(
      "lineitem_fk_orders" ->
        (li.length.toLong, li.count(r => !okeys.contains(r.getLong(0))).toLong),
      "orders_fk_customer" ->
        (ord.length.toLong, ord.count(r => !cust.contains(r.getLong(1))).toLong),
      "orders_pk_unique" -> {
        val groups = ord.groupBy(_.getLong(0))
        (groups.size.toLong, groups.count(_._2.length > 1).toLong)
      },
      "orders_custkey_not_null" ->
        (ord.length.toLong, ord.count(_.isNullAt(1)).toLong),
      "lineitem_quantity_range" ->
        (li.length.toLong,
         li.count(r => r.getDouble(1) < 1.0 || r.getDouble(1) > 50.0).toLong),
      "orders_date_range" ->
        (ord.length.toLong,
         ord.count(r => r.getLong(2) < 788918400000L ||
                        r.getLong(2) >= 1009843200000L).toLong))

    assert(rows.keySet == expected.keySet)
    expected.foreach { case (name, (n, v)) =>
      val (gn, gv, pass) = rows(name)
      assert(gn == n, s"$name n_checked $gn vs $n")
      assert(gv == v, s"$name n_violations $gv vs $v")
      assert(pass == (v == 0L), name)
    }
  }
}
