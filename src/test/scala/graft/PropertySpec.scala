package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, TimeWindows}
import graft.text.TextOps

/** Property tests (SURVEY.md §5.2 item 3): the window floor formula,
  * window-count partition invariants, Jaccard/minhash bounds, and
  * SimHash order-invariance — scalacheck for the pure formulas (many
  * cases), one generated dataset per Spark-level property (a Spark
  * job per scalacheck case would be minutes per property).
  */
class PropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("endOfWindow floor formula: tiling, idempotence, bounds (scalacheck)") {
    // pure mirror of TimeWindows.endOfWindowMs / PseudoWindow.java:82
    def endOf(ts: Long, d: Long): Long = ts - ts % d + d - 1
    val gen = for {
      ts <- Gen.chooseNum(0L, 4102444800000L) // 1970..2100
      d <- Gen.oneOf(1000L, 3600000L, 86400000L, 250L, 7L)
    } yield (ts, d)
    check(Prop.forAll(gen) { case (ts, d) =>
      val e = endOf(ts, d)
      val start = e - d + 1
      // the window contains its ts, tiles time with period d, and the
      // formula is idempotent on every ts inside the window
      e >= ts && ts >= start && start % d == 0 &&
        endOf(e, d) == e && endOf(start, d) == e &&
        endOf(e + 1, d) == e + d
    })
  }

  test("sawtooth/sine generator formulas cycle and stay bounded (scalacheck)") {
    def phase(i: Long): Double = (i % 10) / 10.0
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { i =>
      val p = phase(i)
      p >= 0.0 && p <= 0.9 && phase(i + 10) == p &&
        math.abs(math.sin(p * 2 * math.Pi)) <= 1.0
    })
  }

  test("tumbling window counts partition the input (spark, generated data)") {
    // one scalacheck-generated dataset, Spark-level invariants:
    // sum(per-window counts) == row count, and every (key, window)
    // count equals the driver-side recount.
    val rows = Gen.listOfN(500, for {
      key <- Gen.oneOf("temp", "pressure", "humidity")
      ts <- Gen.chooseNum(1704067200000L, 1704067200000L + 120000L)
    } yield (key, ts)).apply(Gen.Parameters.default, Seed(7L)).get
    import spark.implicits._
    val df = rows.toDF("key", "ts_ms")
    val got = TimeWindows.tumblingCount(df, "key", "ts_ms", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = rows.groupBy { case (k, ts) => (k, ts - ts % 1000L + 999L) }
      .map { case (k, v) => k -> v.size.toLong }
    assert(got == expect)
    assert(got.values.sum == rows.size)
  }

  test("jaccard bounds, identity, symmetry on generated token sets (spark)") {
    val docs = Gen.listOfN(25, Gen.nonEmptyListOf(
        Gen.oneOf((1 to 40).map(i => s"w$i"))).map(_.distinct))
      .apply(Gen.Parameters.default, Seed(11L)).get
      .zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
    import spark.implicits._
    val df = docs.toDF("id", "toks")
    val a = df.select(col("id").as("ia"), col("toks").as("ta"))
    val b = df.select(col("id").as("ib"), col("toks").as("tb"))
    val pairs = a.crossJoin(b)
      .select(col("ia"), col("ib"),
        Dedup.jaccard(col("ta"), col("tb")).as("j"),
        Dedup.minhashEstimate(
          Dedup.minhashSignature(col("ta")),
          Dedup.minhashSignature(col("tb"))).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    docs.foreach { case (i, _) =>
      assert(pairs((i, i))._1 == 1.0)   // identity
      assert(pairs((i, i))._2 == 1.0)   // identical signatures agree everywhere
    }
    pairs.foreach { case ((i, j), (jac, est)) =>
      assert(jac >= 0.0 && jac <= 1.0)
      assert(est >= 0.0 && est <= 1.0)
      assert(pairs((j, i))._1 == jac)   // symmetry
    }
  }

  test("simhash is token-order invariant; hamming bounded by 32 (spark)") {
    val docs = Gen.listOfN(30, Gen.nonEmptyListOf(
        Gen.oneOf((1 to 30).map(i => s"t$i"))))
      .apply(Gen.Parameters.default, Seed(13L)).get
      .zipWithIndex.map { case (toks, i) => (i.toLong, toks, scala.util.Random.shuffle(toks)) }
    import spark.implicits._
    val df = docs.toDF("id", "toks", "shuffled")
    val out = df.select(
        Dedup.simhash(col("toks")).as("a"),
        Dedup.simhash(col("shuffled")).as("b"),
        Dedup.hamming(Dedup.simhash(col("toks")), Dedup.simhash(col("shuffled"))).as("h"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "simhash must be order-invariant (multiset semantics)")
      assert(r.getLong(2) == 0L)
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 32))
    }
  }
}
