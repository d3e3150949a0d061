package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** `events_entropy_mi` sums 12-dp-quantized p·ln terms into exact
  * decimals. The two engines' ln can differ by 1 ulp, so the hash
  * check is sound only while every term sits clear of its 12-dp
  * rounding boundary by more than that divergence (~1e-16 relative).
  * This re-derives the terms from the contingency table and pins the
  * boundary margin, plus the estimates' information-theoretic sanity
  * on the independent fixture.
  */
class EntropySpec extends SparkSpec {

  test("quantized p·ln terms sit clear of the 12-dp rounding boundary") {
    val cells = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts_ms div 3600000) % 24").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("nij")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour"),
        r.getAs[Long]("nij")))
    val nn = cells.map(_._3).sum.toDouble
    val nt = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val nh = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }

    val terms =
      cells.map { case (t, h, nij) =>
        (nij / nn) * math.log((nn * nij) / (nt(t).toDouble * nh(h))) } ++
      nt.values.map(v => -(v / nn) * math.log(v / nn)) ++
      nh.values.map(v => -(v / nn) * math.log(v / nn))

    val minMargin = terms.map { v =>
      val f = v * 1e12 - math.floor(v * 1e12)
      math.abs(f - 0.5)
    }.min
    info(f"min |frac − 0.5| margin = $minMargin%.3e (1e-12 units) over ${terms.size} terms")
    assert(minMargin > 1e-6,
      f"a p·ln term sits $minMargin%.3e from its 12-dp boundary — " +
        "1-ulp ln divergence could flip the quantized term")
  }

  test("estimates are information-theoretically sane on the fixture") {
    val r = EventQueries.queries("events_entropy_mi")(spark, sf).collect().head
    val hType = r.getAs[Double]("h_type"); val hHour = r.getAs[Double]("h_hour")
    val mi = r.getAs[Double]("mi"); val nmi = r.getAs[Double]("nmi")
    assert(hType > 0 && hType <= math.log(5.0) + 1e-6, s"H(type)=$hType")
    assert(hHour > 0 && hHour <= math.log(24.0) + 1e-6, s"H(hour)=$hHour")
    // finite-sample MI of independent columns: positive but tiny
    assert(mi >= 0 && mi < 0.05, s"MI=$mi not near zero on independent fixture")
    assert(nmi >= 0 && nmi < 0.05, s"NMI=$nmi")
    assert(mi <= math.min(hType, hHour), "MI exceeds min entropy bound")
  }
}
