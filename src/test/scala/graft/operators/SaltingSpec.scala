package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

class SaltingSpec extends SparkSpec {

  test("salted join equals the plain join and spreads hot keys") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority")

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(
        li, ord, "l_orderkey", "o_orderkey",
        saltBy = col("l_linenumber"), buckets = 8)
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)

    // the salt actually spreads a key's rows over multiple buckets
    val spread = li.filter(col("l_orderkey") === li.select("l_orderkey").first().getLong(0))
      .withColumn("s", Salting.salt(col("l_linenumber"), 8))
      .select("s").distinct().count()
    assert(spread >= 2)
  }
}
