package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the PRODUCT-QUANTIZATION encoder — for
  * one vector, the per-subspace argmin codebook entry, returned as
  * `array<bigint>` of length M (one code per subspace).
  *
  * Semantics are bit-identical to the higher-order-function
  * formulation it replaces (per subspace:
  * `array_min(transform(entries, struct(ccsq − 2·dotDecimal(sub, c)
  * as double, j)))`): each sub·centroid product in IEEE double,
  * rounded once to DECIMAL(28,14) via the same hybrid
  * scaled-long/BigDecimal HALF_UP as [[DecimalDotProduct]], summed
  * exactly, finished as the double surrogate `ccsq − 2·dot` (the
  * monotone stand-in for ‖sub − c‖² — ‖sub‖² is constant within a
  * subspace's argmin), tie on the surrogate → smaller j. So codes —
  * and every downstream ADC hash — are unchanged.
  *
  * Why an Expression: the HOF route interprets M × K × Dsub lambda
  * evals per corpus row (= nlist×dim-shaped work, the same profile
  * CentroidRanks removed from IVF assignment); the corpus ENCODE is
  * the one per-corpus-build pass of the PQ family, and this loop runs
  * inside WholeStageCodegen.
  *
  * Inputs: v `array<float>` (dim divisible by M),
  * cents `array<array<struct<j: bigint, centroid: array<double>,
  * ccsq: double>>>` (the broadcast codebook of
  * SimilarityQueries.pqCentArrOf — outer index = subspace m, inner
  * entries j-sorted with exact-decimal ‖c‖² precomputed). Null
  * anywhere → null; dim % M ≠ 0, a subspace-length mismatch, an empty
  * codebook cell, or a non-finite/overflowing product → null (the
  * poisoned-decimal contract of [[DecimalDotProduct]]).
  */
case class PqCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(StructType(Array(
              StructField("j", LongType, _, _),
              StructField("centroid", ArrayType(DoubleType, _), _, _),
              StructField("ccsq", DoubleType, _, _))), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<float>, array<array<struct<j,centroid,ccsq>>>), " +
        s"got (${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(vAny: Any, centsAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val cents = centsAny.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val nSub = cents.numElements()
    if (nSub == 0 || dim % nSub != 0) return null
    val dsub = dim / nSub
    val codes = new Array[Long](nSub)
    var m = 0
    while (m < nSub) {
      val entries = cents.getArray(m)
      val nK = entries.numElements()
      if (nK == 0) return null
      var bestDist = Double.PositiveInfinity
      var bestJ = Long.MaxValue
      var found = false
      var jj = 0
      while (jj < nK) {
        val c = entries.getStruct(jj, 3)
        val jid = c.getLong(0)
        val cent = c.getArray(1)
        if (cent.numElements() != dsub) return null
        var fastSum = 0L
        var slowAcc = java.math.BigDecimal.ZERO
        var i = 0
        while (i < dsub) {
          val p = v.getFloat(m * dsub + i).toDouble * cent.getDouble(i)
          if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
          val ap = Math.abs(p)
          val t = ap * 1e14 + 0.5
          val d = t - Math.rint(t)
          if (Math.abs(d) > 0.05 + ap * 0.04) {
            val k = Math.floor(t).toLong
            if (Math.abs(fastSum) > 8000000000000000000L) {
              slowAcc = slowAcc.add(java.math.BigDecimal.valueOf(fastSum, 14))
              fastSum = 0L
            }
            fastSum += (if (p < 0) -k else k)
          } else {
            // Same DECIMAL(28,14) overflow contract as DecimalDotProduct:
            // a rounded product beyond precision 28 poisons the fold.
            val e = java.math.BigDecimal.valueOf(p)
              .setScale(14, java.math.RoundingMode.HALF_UP)
            if (e.precision > 28) return null
            slowAcc = slowAcc.add(e)
          }
          i += 1
        }
        val dot = slowAcc.add(java.math.BigDecimal.valueOf(fastSum, 14)).doubleValue()
        val dist = c.getDouble(2) - 2.0 * dot
        if (!found || dist < bestDist || (dist == bestDist && jid < bestJ)) {
          bestDist = dist; bestJ = jid; found = true
        }
        jj += 1
      }
      codes(m) = bestJ
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val dim = ctx.freshName("dim")
      val nSub = ctx.freshName("nSub")
      val dsub = ctx.freshName("dsub")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val entries = ctx.freshName("entries")
      val nK = ctx.freshName("nK")
      val bestDist = ctx.freshName("bestDist")
      val bestJ = ctx.freshName("bestJ")
      val found = ctx.freshName("found")
      val jj = ctx.freshName("jj")
      val c = ctx.freshName("c")
      val jid = ctx.freshName("jid")
      val cent = ctx.freshName("cent")
      val fs = ctx.freshName("fastSum")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val ap = ctx.freshName("ap")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val e = ctx.freshName("e")
      val dot = ctx.freshName("dot")
      val dist = ctx.freshName("dist")
      val bad = ctx.freshName("bad")
      s"""
         |int $dim = $v.numElements();
         |int $nSub = $cents.numElements();
         |boolean $bad = ($nSub == 0) || ($dim % $nSub != 0);
         |int $dsub = $bad ? 0 : $dim / $nSub;
         |long[] $codes = $bad ? null : new long[$nSub];
         |for (int $m = 0; $m < $nSub && !$bad; $m++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $entries = $cents.getArray($m);
         |  int $nK = $entries.numElements();
         |  if ($nK == 0) { $bad = true; break; }
         |  double $bestDist = Double.POSITIVE_INFINITY;
         |  long $bestJ = Long.MAX_VALUE;
         |  boolean $found = false;
         |  for (int $jj = 0; $jj < $nK && !$bad; $jj++) {
         |    InternalRow $c = $entries.getStruct($jj, 3);
         |    long $jid = $c.getLong(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $c.getArray(1);
         |    if ($cent.numElements() != $dsub) { $bad = true; break; }
         |    long $fs = 0L;
         |    java.math.BigDecimal $acc = java.math.BigDecimal.ZERO;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $p = ((double) $v.getFloat($m * $dsub + $i)) * $cent.getDouble($i);
         |      if (Double.isNaN($p) || Double.isInfinite($p)) { $bad = true; break; }
         |      double $ap = Math.abs($p);
         |      double $t = $ap * 1e14 + 0.5;
         |      double $d = $t - Math.rint($t);
         |      if (Math.abs($d) > 0.05 + $ap * 0.04) {
         |        long $k = (long) Math.floor($t);
         |        if (Math.abs($fs) > 8000000000000000000L) {
         |          $acc = $acc.add(java.math.BigDecimal.valueOf($fs, 14));
         |          $fs = 0L;
         |        }
         |        $fs += ($p < 0) ? -$k : $k;
         |      } else {
         |        java.math.BigDecimal $e = java.math.BigDecimal.valueOf($p)
         |          .setScale(14, java.math.RoundingMode.HALF_UP);
         |        if ($e.precision() > 28) { $bad = true; break; }
         |        $acc = $acc.add($e);
         |      }
         |    }
         |    if (!$bad) {
         |      double $dot = $acc.add(java.math.BigDecimal.valueOf($fs, 14)).doubleValue();
         |      double $dist = $c.getDouble(2) - 2.0 * $dot;
         |      if (!$found || $dist < $bestDist || ($dist == $bestDist && $jid < $bestJ)) {
         |        $bestDist = $dist; $bestJ = $jid; $found = true;
         |      }
         |    }
         |  }
         |  if (!$bad) { $codes[$m] = $bestJ; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object PqCodes {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-API entry point. */
  def apply(v: Column, cents: Column): Column =
    ColumnBridge.column(PqCodes(
      ColumnBridge.expression(v), ColumnBridge.expression(cents)))
}
