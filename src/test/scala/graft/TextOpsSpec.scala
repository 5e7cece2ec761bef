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

  private def unesc(s: String): String =
    Seq(s).toDF("t").select(TextOps.htmlUnescape(col("t"))).head().getString(0)

  test("htmlUnescape matches CPython html.unescape on the covered surface") {
    // vectors pinned against CPython 3.x html.unescape
    val vectors = Seq(
      "&#65;" -> "A",
      "&#x41;" -> "A",
      "&#X41;" -> "A",
      "&#x1F600;" -> "😀",          // supplementary plane
      "&#151;" -> "—",                    // windows-1252 remap
      "&#x97;" -> "—",
      "&#0;" -> "�",                      // NUL → replacement
      "&#13;" -> "\r",
      "&#1114111;" -> "",                 // U+10FFFF is a noncharacter: dropped
      "&#1114112;" -> "�",                // out of range
      "&#1;" -> "",                       // C0 control: dropped
      "&#11;" -> "",
      "&#xfdd0;" -> "",                   // noncharacter block: dropped
      "&#xfffe;" -> "",
      "&#x10000;" -> "𐀀",          // plane-1 start survives
      "&#xD800;" -> "�",                  // surrogate
      "&#999999999999999999;" -> "�",     // huge decimal, no overflow
      "&#000000065;" -> "A",                   // leading zeros
      "&amp;#65;" -> "&#65;",                  // single-pass: no re-decode
      "&#38;lt;" -> "&lt;",
      "&amp;lt;" -> "&lt;",
      "&euro;" -> "€",
      "caf&eacute; &mdash; &frac12;" -> "café — ½",
      "&LT; &Lt;" -> "< ≪",                   // table is case-sensitive per entry
      "&unknown; &lT; & ;" -> "&unknown; &lT; & ;", // uncovered → untouched
      "a&lt;" -> "a<",
      "&lt;" -> "<",
      "&lt;&gt;" -> "<>",
      "no entities here" -> "no entities here",
      // SPEC-LOCKED surface boundary: the covered surface is
      // SEMICOLON-TERMINATED refs only. CPython additionally decodes
      // semicolon-less legacy forms ("&amp" → "&", "&#65" → "A"); here
      // they deliberately pass through untouched — the DuckDB twin and
      // the column form share this boundary, so parity holds engine-
      // to-engine even where it diverges from CPython.
      "&amp" -> "&amp",
      "&#65" -> "&#65",
      "&#x41" -> "&#x41",
      "&amp x" -> "&amp x")
    for ((in, want) <- vectors)
      assert(unesc(in) == want, s"unescape($in)")
    // the pure-column formulation (the DuckDB twin's blueprint) agrees
    // on every vector, so native / columns / SQL cannot drift
    val colOut = vectors.map(_._1).toDF("t")
      .select(col("t"), TextOps.htmlUnescapeCols(col("t")).as("u"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- vectors)
      assert(colOut(in) == want, s"htmlUnescapeCols($in)")
  }

  test("native HtmlUnescape == column formulation on adversarial strings") {
    val rnd = new scala.util.Random(42)
    val atoms = Seq("&", "#", ";", "x", "amp", "lt", "&amp;", "&#", "&#x",
      "6", "65", "1F600", "a", " ", "&unknown;", "&LT;", "&frac12;", "0",
      "&#xD800;", "&#999999999;", "&;", "&#;", "&#x;", "é")
    val cases = (1 to 200).map { _ =>
      (1 to rnd.nextInt(8)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
    } :+ ""
    val rows = cases.toDF("t")
      .select(TextOps.htmlUnescape(col("t")).as("n"),
        TextOps.htmlUnescapeCols(col("t")).as("c"))
      .collect()
    for ((r, in) <- rows.zip(cases))
      assert(r.getString(0) == r.getString(1), s"native vs cols on <$in>")
  }

  test("cleanText folds NBSP and typographic spaces like Python's unicode \\s") {
    // &nbsp; → U+00A0 → ' ' (the reference's \s+ collapse is unicode-aware)
    assert(clean("a&nbsp;b") == "a b")
    assert(clean("a&#160;b") == "a b")
    assert(clean("a b　c") == "a b c")
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
