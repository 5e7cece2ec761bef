package graft

import graft.text.Lcp
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** lcp_chars (the suffix-array LCP kernel) against a brute-force
  * code-point recompute: random ASCII and multi-byte corpora, all
  * offset combinations, plus the substr-semantics edges (offset past
  * the end, identical remainders, strict-prefix remainders). The
  * column-level test runs through a real plan so the codegen path —
  * not just the static eval — is what's checked.
  */
class LcpSpec extends SparkSpec {

  private def brute(a: String, aOff: Int, b: String, bOff: Int): Long = {
    // code points, substr-style 1-based offsets
    val sa = a.codePoints().toArray.drop(math.max(aOff - 1, 0))
    val sb = b.codePoints().toArray.drop(math.max(bOff - 1, 0))
    sa.zip(sb).takeWhile { case (x, y) => x == y }.length.toLong
  }

  private def native(a: String, aOff: Int, b: String, bOff: Int): Long =
    Lcp.lcpU(UTF8String.fromString(a), aOff.toLong,
      UTF8String.fromString(b), bOff.toLong)

  test("matches brute force on random ASCII suffix pairs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(20))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(20))(('a' + rnd.nextInt(3)).toChar).mkString
      for (ao <- 1 to math.max(a.length, 1); bo <- 1 to math.max(b.length, 1))
        assert(native(a, ao, b, bo) == brute(a, ao, b, bo),
          s"lcp('$a', $ao, '$b', $bo)")
    }
  }

  test("counts code points, not bytes, on multi-byte text") {
    val a = "héllo wörld é" // 2-byte code points interleaved
    val b = "héllo wörld x"
    assert(native(a, 1, b, 1) == 12L)
    assert(native(a, 2, a, 2) == a.codePointCount(1, a.length))
    // mismatch INSIDE a multi-byte sequence must not count the char
    assert(native("é", 1, "è", 1) == 0L)
    // 3- and 4-byte code points (CJK + supplementary plane)
    assert(native("日本語テキスト", 1, "日本語です", 1) == 3L)
    assert(native("a😀b", 1, "a😀c", 1) == 2L)
  }

  test("substr-semantics edges") {
    assert(native("abc", 4, "abc", 1) == 0L) // offset past the end
    assert(native("abc", 99, "abc", 99) == 0L)
    assert(native("abcdef", 1, "abc", 1) == 3L) // strict prefix remainder
    assert(native("abc", 2, "xbc", 2) == 2L) // identical remainders
    assert(native("", 1, "abc", 1) == 0L)
  }

  test("column path (codegen) agrees with a zip_with recompute on real docs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(40)
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.text").as("ta"), col("b.text").as("tb"),
        (col("a.doc_id") % 7 + 1).cast("long").as("oa"),
        (col("b.doc_id") % 11 + 1).cast("long").as("ob"))
    val both = pairs
      .withColumn("fast", Lcp(col("ta"), col("oa"), col("tb"), col("ob")))
      .withColumn("slow", expr(
        """CAST(coalesce(nullif(array_position(
          |  zip_with(split(substr(ta, CAST(oa AS INT)), ''),
          |    split(substr(tb, CAST(ob AS INT)), ''),
          |    (x, y) -> coalesce(x, '') = coalesce(y, '')), false), 0) - 1,
          |  least(greatest(length(ta) - oa + 1, 0),
          |        greatest(length(tb) - ob + 1, 0))) AS BIGINT)""".stripMargin))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }
}
