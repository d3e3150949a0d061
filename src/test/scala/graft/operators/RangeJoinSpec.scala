package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkSpec

/** The binned range join must equal the naive nested-loop range join
  * row-for-row on generated data, for any bin width — including
  * boundary values sitting exactly on interval and bin edges.
  */
class RangeJoinSpec extends SparkSpec {

  test("binned == naive on generated values and intervals, multiple bin widths") {
    import spark.implicits._
    val values = Gen.listOfN(300, Gen.chooseNum(0, 2000))
      .apply(Gen.Parameters.default, rng.Seed(5L)).get
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
    // overlapping + touching + point-adjacent intervals, incl. edges
    // exactly on multiples of the bin widths
    val bands = Seq(
      ("A", 0.0, 500.0), ("B", 500.0, 1000.0), ("C", 900.0, 1100.0),
      ("D", 1000.0, 2000.0), ("E", 1999.0, 2001.0), ("F", 300.0, 300.0))
    val fact = values.toDF("id", "v")
    val dim = bands.toDF("band", "lo", "hi")

    val naive = fact.join(dim, col("lo") <= col("v") && col("v") < col("hi"))
      .select(col("id"), col("band"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(naive.nonEmpty)

    Seq(100.0, 250.0, 333.0, 1000.0).foreach { w =>
      val binned = RangeJoin.binned(fact, dim, col("v"), col("lo"), col("hi"), w)
        .select(col("id"), col("band"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(binned == naive, s"binWidth=$w diverges: " +
        s"missing=${(naive -- binned).take(5)} extra=${(binned -- naive).take(5)}")
    }
  }
}
