package graft.operators

import graft.SparkSpec

/** Unit semantics of substring-level dedup on hand-built documents
  * (the oracle checks it end-to-end on the fixture; this pins the
  * windowing/sharing corner cases).
  */
class DedupSubstringSpec extends SparkSpec {

  private val K = 20

  /** n unique tokens with a per-doc prefix. */
  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("shared 20-token window is detected; short and unique docs are not") {
    import spark.implicits._
    val a = toks("a", 25)                         // 6 spans, one shared
    val b = toks("b", 2) ++ a.slice(2, 22) ++ toks("c", 2) // 24 toks, 5 spans
    val short = toks("s", 10)                     // < K → 0 spans
    val uniq = toks("u", 25)                      // 6 spans, none shared
    val docs = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, short.mkString(" ")), (4L, uniq.mkString(" "))
    ).toDF("doc_id", "text")

    val got = Dedup.substringStats(docs, K).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

    // doc 1: 25 − 19 = 6 spans; exactly one (a3..a22) also sits in doc 2
    assert(got(1L) === ((6L, 1L, 2L, true)))
    // doc 2: 24 − 19 = 5 spans; only the copied window is shared
    assert(got(2L) === ((5L, 1L, 2L, true)))
    // doc 3: shorter than the window → zero spans, still a row
    assert(got(3L) === ((0L, 0L, 0L, false)))
    // doc 4: spans exist but none recur elsewhere
    assert(got(4L) === ((6L, 0L, 1L, false)))
  }

  test("exact duplicate docs share every span") {
    import spark.implicits._
    val t = toks("x", 30).mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = Dedup.substringStats(docs, K).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((11L, 11L, 2L)))
    assert(got(2L) === ((11L, 11L, 2L)))
  }
}
