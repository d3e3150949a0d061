package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: DISTINCT 31-bit hashes of all `k`-token
  * shingles of a token array, in one fused pass.
  *
  * Bit-identical to the composed route it replaces
  * (`array_distinct(transform(TextOps.shingles(toks, k), tokenHash31))`
  * ≡ DuckDB `list_distinct(list_transform(...concat_ws(' ', …)…,
  * md5-prefix))`): each shingle is the space-joined UTF-8 token run,
  * hashed as `parseLong(hex(md5(s))[0,14)) mod (2^31 − 1)`; distinct
  * keeps first-occurrence order (matching `array_distinct` /
  * `list_distinct`).
  *
  * Why an Expression: the HOF route walks an interpreted
  * `concat_ws(slice(...))` expression tree per shingle position —
  * ~|toks| interpreted sub-tree evals per row before hashing. Here
  * the loop runs compiled with one reused MessageDigest per task
  * (codegen mutable state), and only the md5 itself remains as
  * irreducible per-shingle cost.
  *
  * Null semantics: null array → null; null token → null.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // Interpreted-path twin of the codegen mutable state — per-THREAD
  // (not per instance): driver-side constant folding can evaluate the
  // same instance concurrently with a local-relation eval, and MD5
  // digest state is mutable (ADVICE r15).
  @transient private lazy val interpMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = ShingleHashes.kernel(arr, k, interpMd.get())
    if (out == null) null else UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "shingleMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.ShingleHashes.kernel($a, $k, $md);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashes {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Shared compiled kernel (called from both eval paths; returns null
    * on a null token). The per-shingle string is rebuilt rather than
    * rolling-hashed because the contract is EXACT md5 parity with the
    * composed-builtins route and the DuckDB oracle.
    */
  def kernel(arr: ArrayData, k: Int, md: java.security.MessageDigest): Array[Long] = {
    val n = arr.numElements()
    val nsh = math.max(n - (k - 1), 0)
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s < nsh) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(s + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 14 hex chars = 56 bits = top 7 bytes' high nibbles...
      // exactly: hex string chars 0..13 → 7 bytes of the digest
      var h = 0L
      var b = 0
      while (b < 7) {
        h = (h << 8) | (digest(b) & 0xffL)
        b += 1
      }
      // 14 hex chars = 56 bits: the 7 full bytes above
      seen.add(h % 2147483647L)
      s += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** Column-API entry point. */
  def apply(toks: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(toks), k))
}
