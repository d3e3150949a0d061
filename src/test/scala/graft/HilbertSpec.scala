package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** `layout_hilbert` rests on two claims: the generated 10-iteration
  * index IS the Hilbert curve (a bijection whose consecutive indices
  * are Manhattan-adjacent cells — the locality property the layout
  * sells), and on a 2-D selective predicate the resulting zone maps
  * skip at least as well as Z-order's. Both are pinned here; the
  * bijection/adjacency exhaustively on a 32×32 grid (1024 cells, every
  * curve step checked), the skip comparison on the fixture.
  */
class HilbertSpec extends SparkSpec {

  test("hilbert index is a bijection with unit-step adjacency (32x32 exhaustive)") {
    val bits = 5
    val n = 1 << bits
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))
    val d = EventQueries.hilbertIndex(grid, bits)
      .select(col("a"), col("b"), col("hd")).collect()
      .map(r => (r.getAs[Long]("hd"), (r.getAs[Long]("a"), r.getAs[Long]("b"))))
      .toMap

    assert(d.size === n * n, "hd is not a bijection — duplicate indices")
    assert(d.keys.min === 0L && d.keys.max === (n * n - 1).toLong)
    (0L until (n.toLong * n - 1)).foreach { i =>
      val (x1, y1) = d(i); val (x2, y2) = d(i + 1)
      val manhattan = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(manhattan === 1L,
        s"curve jumps from ($x1,$y1) to ($x2,$y2) between d=$i and ${i + 1}")
    }
  }

  test("hilbert zone maps skip at least as well as zorder on the 2-D predicate") {
    val rows = EventQueries.queries("layout_hilbert")(spark, sf).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("pred")) ->
        (r.getAs[Long]("files_touched"), r.getAs[Long]("rows_scanned"))).toMap
    val (hFiles, hRows) = rows(("hilbert", "p_both"))
    val (zFiles, zRows) = rows(("zorder", "p_both"))
    info(s"p_both: hilbert $hFiles files / $hRows rows, zorder $zFiles files / $zRows rows")
    assert(hFiles <= zFiles,
      s"hilbert touches $hFiles files vs zorder's $zFiles on p_both — " +
        "the curve lost its locality advantage")
  }
}
