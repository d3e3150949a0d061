package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 16-hash MinHash signature of a
  * token array in one fused pass.
  *
  * Bit-identical to `Dedup.minhashSignature(array_distinct(toks))`
  * (and the DuckDB sigCte): per DISTINCT token string,
  * h = md5-hex-prefix-14 mod (2^31 − 1), then
  * sig[j] = min over tokens of ((2j+1)·h + 12345·j + 7) mod (2^31−1)
  * for j in 0..15. An empty token set yields 16 nulls (`array_min` of
  * an empty array), matching both composed routes.
  *
  * Why an Expression: the composed route materializes the distinct
  * token array, walks an interpreted affine lambda per (hash, j) —
  * 16 × |distinct| interpreted evals per doc — and re-allocates per
  * step. This kernel streams tokens once (HashSet dedup), hashes each
  * new token with a reused per-task MessageDigest, and folds all 16
  * running minima in a compiled loop; the md5 per distinct token is
  * the only irreducible cost.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  // Interpreted-path twin of the codegen mutable state — per-THREAD
  // (not per instance): driver-side constant folding can evaluate the
  // same instance concurrently with a local-relation eval, and MD5
  // digest state is mutable (ADVICE r15).
  @transient private lazy val interpMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any =
    MinHashSig.kernel(input.asInstanceOf[ArrayData], interpMd.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "minhashMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  (org.apache.spark.sql.catalyst.util.ArrayData)
         |    graft.functions.MinHashSig.kernel($a, $md);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSig {
  import org.apache.spark.sql.graft.ColumnBridge

  val NumHashes = 16
  val P = 2147483647L

  /** Shared compiled kernel: null on a null token; 16 nulls for an
    * empty token set; otherwise the 16 affine minima.
    */
  def kernel(arr: ArrayData, md: java.security.MessageDigest): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var any = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val t = arr.getUTF8String(i).toString
      if (seen.add(t)) {
        any = true
        md.reset()
        val digest = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = h % P
        var j = 0
        while (j < NumHashes) {
          val v = ((2L * j + 1L) * h + j * 12345L + 7L) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](NumHashes)(null))
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Column-API entry point over the RAW token array (dedup happens
    * inside the kernel — no separate array_distinct needed).
    */
  def apply(toks: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(toks)))
}
