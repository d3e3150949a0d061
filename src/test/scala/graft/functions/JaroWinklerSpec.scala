package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.queries.DedupQueries

/** The `jaro_winkler` native expression must agree with DuckDB's
  * `jaro_winkler_similarity` (its oracle) — pinned on cases that
  * exercise every branch: transpositions, the 0.7 boost gate, the
  * ≤4-char prefix cap, zero-match short strings, equal and empty
  * inputs. Values below were computed by DuckDB itself. Plus the
  * threshold-margin soundness of `dedup_jaro_winkler`'s keep set.
  */
class JaroWinklerSpec extends SparkSpec {

  // (a, b, duckdb jaro_winkler_similarity(a, b)) — 10 dp
  private val cases = Seq(
    ("martha", "marhta", 0.9611111111),
    ("dixon", "dicksonx", 0.8133333333),
    ("jellyfish", "smellyfish", 0.8962962963),
    ("abc", "abc", 1.0),
    ("abc", "", 0.0),
    ("a", "b", 0.0),
    ("duane", "dwayne", 0.8400000000),
    ("customer#000000001", "customer#000000010", 0.9888888889),
    ("the quick brown fox", "the quick brown dog", 0.9578947368),
    ("aaaa", "aaa", 0.9416666667),
    ("ab", "ba", 0.0),
    ("crate", "trace", 0.7333333333))

  test("kernel matches DuckDB case-for-case (10 dp)") {
    cases.foreach { case (a, b, expected) =>
      val got = JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
      assert(math.abs(got - expected) < 5e-11,
        f"jw('$a','$b') = $got%.10f, DuckDB says $expected%.10f")
    }
  }

  test("expression evaluates through codegen identically to the kernel") {
    import spark.implicits._
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", JaroWinkler(col("a"), col("b")))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got.foreach { case (a, b, v) =>
      val expected = cases.find(c => c._1 == a && c._2 == b).get._3
      assert(math.abs(v - expected) < 5e-11, s"codegen jw('$a','$b') = $v")
    }
    // null in → null out
    val n = Seq(("x", Option.empty[String])).toDF("a", "b")
      .withColumn("jw", JaroWinkler(col("a"), col("b"))).collect().head
    assert(n.isNullAt(2))
  }

  test("blocked-pair scores sit clear of the 0.92 keep threshold") {
    val pairs = DedupQueries.queries("dedup_jaro_winkler")(spark, sf).collect()
    assert(pairs.nonEmpty, "no JW pairs on the fixture — blocking broke")
    val margins = pairs.map(r => math.abs(r.getAs[Double]("jw") - 0.92))
    info(f"${pairs.length} keep pairs, min |jw − τ| margin = ${margins.min}%.4f")
    assert(margins.min > 1e-4,
      "a keep decision sits on the threshold — oracle hash check unsound")
  }
}
