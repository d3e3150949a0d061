package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Structural invariants for the SCD2 merge and the column profiler —
  * the laws a consumer of either table relies on.
  */
class MergeProfileSpec extends SparkSpec {

  test("scd2: exactly one current version per key, history closed correctly") {
    val t = RelationalQueries.queries("cdc_scd2")(spark, sf)
      .persist()
    val perKey = t.groupBy(col("c_custkey"))
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_cur"),
           count(lit(1)).as("n_vers"))
    // every key has exactly one open version
    assert(perKey.filter(col("n_cur") =!= 1L).count() === 0L)
    // closed rows end exactly where their successor starts
    val bad = t.filter(!col("is_current"))
      .join(t.filter(col("is_current"))
              .select(col("c_custkey"), col("valid_from").as("succ_from")),
            "c_custkey")
      .filter(col("valid_to") =!= col("succ_from"))
    assert(bad.count() === 0L)
    // changed keys carry two versions, untouched keys one
    val hist = perKey.groupBy(col("n_vers")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.keySet === Set(1L, 2L), hist.toString)
    t.unpersist()
  }

  test("time travel: snapshot@0 is the pre-merge table, snapshot@1 the post-merge state") {
    val snap = RelationalQueries.queries("cdc_snapshot")(spark, sf).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> (r.getDouble(2), r.getLong(3))).toMap)
      .toMap
    val base = graft.tables.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        asDouble(dec(col("c_acctbal"))).as("bal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // t=0: exactly the original table, all version 1
    assert(snap(0L).view.mapValues(_._1).toMap == base)
    assert(snap(0L).values.forall(_._2 == 1L))
    // t=1: changed keys re-balanced at version 2, inserts present,
    // untouched keys carried forward unchanged. Insert keys start one
    // past the observed key domain (not a fixed constant — ADVICE r7).
    val insOffset = base.keys.max + 1L
    base.foreach { case (k, b) =>
      val (gb, gv) = snap(1L)(k)
      if (k % 7 == 3) { assert(gv == 2L); assert(math.abs(gb - (b + 100.50)) < 1e-9) }
      else { assert(gv == 1L); assert(gb == b) }
      if (k % 11 == 5) assert(snap(1L).contains(k + insOffset))
    }
    // each key appears exactly once per snapshot (the map sizes prove
    // no duplicate versions leak through the interval predicate)
    assert(snap(0L).size == base.size)
    assert(snap(1L).size == base.size + base.keys.count(_ % 11 == 5))
  }

  test("approx profile: estimates inside HLL tolerance, facts exact") {
    val approx = EventQueries.queries("events_profile_approx")(spark, sf)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val exact = EventQueries.queries("events_profile")(spark, sf)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (c, r) =>
      // m=256 ⇒ σ ≈ 1.04/√256 ≈ 6.5%; allow ~3σ
      assert(math.abs(r.getAs[Double]("rel_err_r")) < 0.25, s"$c: $r")
      // the non-estimated facts must agree with the exact profiler
      assert(r.getAs[Long]("n_rows") === exact(c).getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_null") === exact(c).getAs[Long]("n_null"))
      assert(r.getAs[Long]("true_distinct") === exact(c).getAs[Long]("n_distinct"))
    }
  }

  test("profile: per-column rows agree on table-level facts") {
    val rows = EventQueries.queries("events_profile")(spark, sf).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("n_rows")).distinct.length === 1)
    val byCol = rows.map(r => r.getAs[String]("column") -> r).toMap
    // event_type is a 5-value enum; ids are unique per event
    assert(byCol("event_type").getAs[Long]("n_distinct") === 5L)
    assert(byCol("event_id").getAs[Long]("n_distinct") ===
      byCol("event_id").getAs[Long]("n_rows"))
  }
}
