package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** clean_text chain semantics (reference: embed.py:13-51). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanText(col("t"))).head().getString(0)

  test("entity unescape, lowercase, url/tag/mention strip, charset filter, whitespace") {
    assert(clean("Check &amp; buy <b>THIS</b> at http://x.com @user #tag UnicodeÜ!!")
      == "check buy this at unicode!!")
    // after unescape, "<= B >" matches the non-greedy tag strip — same as Python
    assert(clean("A &lt;= B &gt; C &quot;quoted&#39;") == "a c \"quoted'")
    assert(clean("visit www.example.com now") == "visit now")
    assert(clean("  spaced\t\tout\n\nwords  ") == "spaced out words")
    assert(clean("keep .,!?;:'\"- punct") == "keep .,!?;:'\"- punct")
  }

  test("stable_hash64 expression matches the JVM hash and registers in SQL") {
    import graft.text.{StableHash, StableHash64}
    val df = Seq("hello", "world", "it's").toDF("s")
    val got = df.select(StableHash64(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq("hello", "world", "it's").map(StableHash.hash64))
    StableHash64.register(spark)
    val r = spark.sql("SELECT stable_hash64('hello') AS h").head().getLong(0)
    assert(r == StableHash.hash64("hello"))
    // column-form unsigned remainder trick used by q56: 2^64 ≡ 16 (mod 100)
    val h = StableHash.hash64("it's") // negative as signed long
    assert(h < 0)
    val viaTrick = math.floorMod(math.floorMod(h, 100L) + 16L, 100L)
    assert(viaTrick == java.lang.Long.remainderUnsigned(h, 100L))
  }

  test("null-safe and python token-count parity") {
    val df = Seq[(Integer, String)]((1, null), (2, ""), (3, "one two three"))
      .toDF("id", "t")
      .select(col("id"), TextOps.tokenCount(TextOps.cleanText(col("t"))).as("n"))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Python: len("".split(" ")) == 1
    assert(got(1) == 1 && got(2) == 1 && got(3) == 3)
  }

  test("min-length review filter semantics (embed.py:61)") {
    val df = Seq("a b c d e f", "a b c d e").toDF("t")
      .filter(TextOps.tokenCount(TextOps.cleanText(col("t"))) > 5)
    assert(df.count() == 1)
  }

  test("langId picks dominant stopword language, alphabetical ties") {
    val df = Seq(
      "the cat is on the mat and it is big", // en
      "der hund ist nicht mit der katze und", // de
      "el gato y la casa de los perros", // es
      "xyzzy plugh foo").toDF("t") // no hits → first lang alphabetically (de)
      .select(TextOps.langId(TextOps.tokens(TextOps.cleanText(col("t")))).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "es", "de"))
  }

  test("fingerprint is token-order insensitive") {
    val df = Seq("alpha beta gamma", "gamma alpha beta", "alpha beta delta").toDF("t")
      .select(TextOps.fingerprint(TextOps.tokens(TextOps.cleanText(col("t")))).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("extractSummary strips quotes, ASSISTANT prefix and end markers") {
    val df = Seq("\"USER: hi ASSISTANT: A great product</s>\"").toDF("t")
      .select(TextOps.extractSummary(col("t")).as("s"))
    assert(df.head().getString(0) == "A great product")
  }
}
