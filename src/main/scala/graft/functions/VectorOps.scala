package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns as pure
  * Catalyst higher-order functions (SURVEY.md §2.9) — no UDFs, no
  * collect, fully partition-parallel.
  *
  * Determinism note: float summation order differs between engines and
  * between Spark partial-aggregation plans, so every reduction is
  * routed through DECIMAL — each elementwise product is computed in
  * double (IEEE, bit-exact everywhere), rounded once to DECIMAL(28,14),
  * and summed exactly (decimal addition is associative). The final
  * cosine is then double arithmetic on identical inputs → identical
  * bits on any engine, any partitioning, any cluster size.
  */
object VectorOps {

  /** Exact decimal dot product of two numeric-array columns — the
    * codegen'd `DecimalDotProduct` expression (one fused loop inside
    * WholeStageCodegen; ~10× the interpreted higher-order-function
    * route at sf0.1 on the similarity/dedup hot paths).
    */
  def dotDecimal(a: Column, b: Column): Column = DecimalDotProduct.dot(a, b)

  /** The original higher-order-function formulation — kept as the
    * independent reference implementation that `DecimalDotProductSpec`
    * cross-checks the codegen expression against. NOT bit-identical:
    * Spark types the fold's `acc + v` as decimal(38,13) (DecimalPrecision
    * precision-loss), rounding the accumulator's 14th decimal each
    * step, so this route is ~1e-13-perturbed vs the exact sum the
    * codegen expression (and the DuckDB oracle) computes.
    */
  def dotDecimalHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast("decimal(28,14)")),
      lit(0).cast("decimal(38,14)"),
      // re-cast each step: Spark's decimal + widens (38,14)+(28,14) to
      // (38,13), which breaks the accumulator type contract; values are
      // ≪ 10^24 so the cast never loses digits
      (acc, v) => (acc + v).cast("decimal(38,14)"))

  /** Exact decimal squared L2 norm. */
  def normSqDecimal(a: Column): Column = dotDecimal(a, a)

  /** Cosine similarity via exact-decimal reductions + double finish.
    * Null on length mismatch or a zero-norm side (never NaN) — the
    * same contract as the fused `FloatVectorCosine` hot path.
    */
  def cosine(a: Column, b: Column): Column =
    dotDecimal(a, b).cast("double") /
      nullif(sqrt(normSqDecimal(a).cast("double")) * sqrt(normSqDecimal(b).cast("double")),
        lit(0.0))

  /** 31-bit stable hash of a string (md5-prefix route — matches
    * graft.text.TextOps.tokenHash31).
    */
  def hash31(s: Column): Column =
    conv(substring(md5(s), 1, 14), 16, 10).cast("long") % 2147483647L

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane(j)[i] = hash31("j_i")/2^30 − 1 with hash31 = md5-prefix.
    * Computed ONCE on the driver (the md5 route matches the inlined
    * DuckDB-oracle formula bit for bit) and shipped as literals —
    * plane weights are query constants, not per-row work.
    */
  def planeComponentValue(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"${j}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14)
    (java.lang.Long.parseLong(hex, 16) % 2147483647L) / 1073741823.5 - 1.0
  }

  /** Sign-random-projection LSH bucket id over `nPlanes` hyperplanes:
    * bit j = [dot(v, plane_j) > 0], bucket = Σ bit_j · 2^j.
    * One decimal-exact pass over the vector per plane.
    */
  def lshBucket(v: Column, dim: Int, nPlanes: Int): Column = {
    import org.apache.spark.sql.functions.typedLit
    val bits = (0 until nPlanes).map { j =>
      val plane = typedLit((1 to dim).map(i => planeComponentValue(j, i)))
      // codegen'd exact-decimal dot (one fused loop per plane) — the
      // sign test is on the same rounded-per-element sum the DuckDB
      // oracle computes, so bucket ids stay engine-identical
      val dot = DecimalDotProduct.dot(v, plane)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
