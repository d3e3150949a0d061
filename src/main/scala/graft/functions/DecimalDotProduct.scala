package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: exact-decimal dot product of two
  * numeric-array columns in ONE codegen'd loop.
  *
  * Semantics (bit-identical to the DuckDB oracle twin
  * `list_sum(list_transform(..., CAST(a[i]*b[i] AS DECIMAL(28,14))))`):
  * each elementwise product is computed in IEEE double, rounded ONCE
  * to scale 14 (HALF_UP — Spark's non-ANSI double→decimal cast, i.e.
  * `java.math.BigDecimal.valueOf(p).setScale(14, HALF_UP)`, the
  * shortest-decimal-representation rounding of `Decimal(Double)`),
  * then summed EXACTLY. Decimal addition is associative, so the result
  * is independent of element order, partitioning, and engine — the
  * determinism contract of SparkEntry's oracle hashing.
  *
  * Note on the `zip_with` + `aggregate` route this replaces: Spark's
  * decimal `Add` inside that fold widens (38,14)+(28,14) to (38,13) —
  * a HALF_UP round of the accumulator's 14th decimal at EVERY step —
  * so the old route was ~1e-13-perturbed relative to the true sum.
  * This expression sums exactly, i.e. it is the more faithful mirror
  * of the oracle; `DecimalDotProductSpec` bounds the two routes'
  * divergence and checks all query outputs are unaffected at the
  * round-6 surface.
  *
  * Null semantics mirror `zip_with` (which null-pads the shorter
  * array, poisoning the decimal fold): result is null when either
  * array is null, lengths differ, any element is null, a product is
  * NaN/±Inf, or a rounded product overflows DECIMAL(28,14).
  *
  * Why an Expression and not the higher-order functions: the lambda
  * route interprets `ZipWith`/`ArrayAggregate` per element with a
  * boxed `Decimal` allocation per step and no whole-stage codegen —
  * measured ~10× slower at sf0.1 (ann_topk_bruteforce 13.7 s vs the
  * fused float expression's 1.4 s on identical data). This loop keeps
  * the exact-decimal contract AND stays inside WholeStageCodegen —
  * the 100 TB hot path for the similarity/dedup family (preference
  * order (b) of SURVEY.md §4.3).
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_decimal requires array<float|double> arguments, got " +
      s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DecimalType(38, 14)
  // Non-null inputs can still yield null (length mismatch / null
  // element / decimal overflow) — mirror of the poisoned fold.
  override def nullable: Boolean = true

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = get(x, i, lt) * get(y, i, rt)
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      val t = java.math.BigDecimal.valueOf(p)
        .setScale(14, java.math.RoundingMode.HALF_UP)
      if (t.precision > 28) return null
      acc = acc.add(t)
      i += 1
    }
    Decimal(acc, 38, 14)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(v: String, i: String, t: DataType) = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case _         => s"$v.getDouble($i)"
      }
      val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |java.math.BigDecimal $acc = java.math.BigDecimal.ZERO;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $p = (${getter(a, i, lt)}) * (${getter(b, i, rt)});
         |  if (Double.isNaN($p) || Double.isInfinite($p)) { $bad = true; break; }
         |  java.math.BigDecimal $t = java.math.BigDecimal.valueOf($p)
         |    .setScale(14, java.math.RoundingMode.HALF_UP);
         |  if ($t.precision() > 28) { $bad = true; break; }
         |  $acc = $acc.add($t);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.types.Decimal.apply($acc, 38, 14);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DecimalDotProduct {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DecimalDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT vec_dot_decimal(a, b) ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_decimal", exprs => DecimalDotProduct(exprs(0), exprs(1)), "scala_udf")
}
