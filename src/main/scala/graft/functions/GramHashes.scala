package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: POSITIONAL 31-bit hashes of all
  * `k`-token grams of a token array, in document order, one fused
  * pass — the positional sibling of [[ShingleHashes]] (which
  * deduplicates and therefore loses gram positions).
  *
  * Position matters for span COVERAGE: the Lee-et-al substring-dedup
  * measure ("what fraction of this document's tokens sit inside a
  * ≥k-token span that also appears in another document") needs the
  * interval-union of duplicated gram starts, so the k-gram at
  * position p must stay AT position p — `posexplode` over this
  * array yields the (doc_id, pos, gram_hash) table the coverage
  * queries consume.
  *
  * Hash parity: each gram is the space-joined UTF-8 token run,
  * hashed as `parseLong(hex(md5(s))[0,14)) mod (2^31 − 1)` —
  * bit-identical to [[ShingleHashes]] and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(s), 1, 14)) AS BIGINT) %
  * 2147483647` idiom, so both engines see the same gram identity.
  *
  * Null semantics: null array → null; null token → null. Fewer than
  * `k` tokens → empty array (a short doc has zero spans, not null).
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // Interpreted-path digest is per-THREAD, not per expression
  // instance: driver-side constant folding can evaluate the same
  // instance concurrently with a local-relation eval, and MD5 digest
  // state is mutable (ADVICE r15 — the ShingleHashes convention,
  // hardened in all three digest expressions).
  @transient private lazy val interpMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = GramHashes.kernel(arr, k, interpMd.get())
    if (out == null) null else UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "gramMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.GramHashes.kernel($a, $k, $md);
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

object GramHashes {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Shared compiled kernel — the [[ShingleHashes.kernel]] loop
    * without the distinct set: out(p) = hash of the gram starting at
    * token position p. Returns null on a null token.
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
    val out = new Array[Long](nsh)
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
      // 14 hex chars = 56 bits = the digest's first 7 bytes
      var h = 0L
      var b = 0
      while (b < 7) {
        h = (h << 8) | (digest(b) & 0xffL)
        b += 1
      }
      out(s) = h % 2147483647L
      s += 1
    }
    out
  }

  /** Column-API entry point. */
  def apply(toks: Column, k: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(toks), k))
}
