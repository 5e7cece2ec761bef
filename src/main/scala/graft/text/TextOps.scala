package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning / analysis column expressions.
  *
  * `cleanText` mirrors the reference pipeline's review-cleaning semantics
  * (reference: embed.py:13-51): html-unescape, lowercase, strip URLs, strip
  * HTML tags, strip @mentions/#hashtags, keep only `[a-z0-9\s.,!?;:'"-]`,
  * collapse whitespace, trim. Everything here is a pure Catalyst column
  * expression (codegen'd, no UDFs) so plans stay inside whole-stage codegen
  * and every step is expressible as ANSI SQL for the DuckDB oracle.
  */
object TextOps {

  /** Pinned named HTML entities (semicolon forms, case-sensitive —
    * values generated from the HTML5 reference table CPython's
    * `html.unescape` uses; reference: embed.py:31).
    */
  val namedEntities: Seq[(String, String)] = Seq(
    "lt" -> "<",
    "gt" -> ">",
    "quot" -> "\"",
    "apos" -> "'",
    "amp" -> "&",
    "nbsp" -> "\u00a0",
    "mdash" -> "—",
    "ndash" -> "–",
    "hellip" -> "…",
    "lsquo" -> "‘",
    "rsquo" -> "’",
    "ldquo" -> "“",
    "rdquo" -> "”",
    "eacute" -> "é",
    "egrave" -> "è",
    "agrave" -> "à",
    "ccedil" -> "ç",
    "ouml" -> "ö",
    "uuml" -> "ü",
    "auml" -> "ä",
    "szlig" -> "ß",
    "copy" -> "©",
    "reg" -> "®",
    "trade" -> "™",
    "deg" -> "°",
    "plusmn" -> "±",
    "times" -> "×",
    "divide" -> "÷",
    "middot" -> "·",
    "bull" -> "•",
    "laquo" -> "«",
    "raquo" -> "»",
    "euro" -> "€",
    "pound" -> "£",
    "yen" -> "¥",
    "cent" -> "¢",
    "sect" -> "§",
    "para" -> "¶",
    "iexcl" -> "¡",
    "iquest" -> "¿",
    "ntilde" -> "ñ",
    "aacute" -> "á",
    "iacute" -> "í",
    "oacute" -> "ó",
    "uacute" -> "ú",
    "frac12" -> "½",
    "frac14" -> "¼",
    "frac34" -> "¾",
    "sup2" -> "²",
    "sup3" -> "³",
    "oslash" -> "ø",
    "aring" -> "å",
    "aelig" -> "æ",
    "thorn" -> "þ",
    // case variants present in the HTML5 table for the pinned names
    // (the table is case-SENSITIVE per entry: &Lt; is ≪, not <)
    "LT" -> "<",
    "Lt" -> "≪",
    "GT" -> ">",
    "Gt" -> "≫",
    "QUOT" -> "\"",
    "AMP" -> "&",
    "Eacute" -> "É",
    "Egrave" -> "È",
    "Agrave" -> "À",
    "Ccedil" -> "Ç",
    "Ouml" -> "Ö",
    "Uuml" -> "Ü",
    "Auml" -> "Ä",
    "COPY" -> "©",
    "REG" -> "®",
    "TRADE" -> "™",
    "Ntilde" -> "Ñ",
    "Aacute" -> "Á",
    "Iacute" -> "Í",
    "Oacute" -> "Ó",
    "Uacute" -> "Ú",
    "Oslash" -> "Ø",
    "Aring" -> "Å",
    "THORN" -> "Þ")

  /** HTML5 numeric-charref remap (the Windows-1252 compatibility table +
    * U+0000 → U+FFFD), exactly CPython html._invalid_charrefs minus the
    * identity rows. Codepoints outside [1, 0x10FFFF] or in the surrogate
    * block also decode to U+FFFD (the `invalid` branch below).
    */
  val numericRemap: Seq[(Long, String)] = Seq(
    0x00L -> "\ufffd",
    0x80L -> "€",
    0x82L -> "‚",
    0x83L -> "ƒ",
    0x84L -> "„",
    0x85L -> "…",
    0x86L -> "†",
    0x87L -> "‡",
    0x88L -> "ˆ",
    0x89L -> "‰",
    0x8aL -> "Š",
    0x8bL -> "‹",
    0x8cL -> "Œ",
    0x8eL -> "Ž",
    0x91L -> "‘",
    0x92L -> "’",
    0x93L -> "“",
    0x94L -> "”",
    0x95L -> "•",
    0x96L -> "–",
    0x97L -> "—",
    0x98L -> "˜",
    0x99L -> "™",
    0x9aL -> "š",
    0x9bL -> "›",
    0x9cL -> "œ",
    0x9eL -> "ž",
    0x9fL -> "Ÿ")

  /** One regex alternation over every covered reference — numeric
    * (decimal and hex) plus the named table. Matched in ONE left-to-right
    * pass, like Python's html.unescape: decoded output is never
    * re-scanned, so `&amp;#65;` → `&#65;` and `&#38;lt;` → `&lt;`.
    */
  val entityPattern: String =
    s"&(#(?:[0-9]+|[xX][0-9a-fA-F]+)|${namedEntities.map(_._1).mkString("|")});"

  /** Unicode codepoint → string, pure columns: hex-pad to 8 digits and
    * decode as UTF-32 (Spark's `chr` is ASCII-mod-256 only).
    */
  private def chrUnicode(code: Column): Column = {
    val base = decode(unhex(lpad(hex(code), 8, "0")), "UTF-32")
    val invalid = code <= 0L || (code >= 0xD800L && code <= 0xDFFFL) ||
      code > 0x10FFFFL
    // html._invalid_codepoints: 0x01-0x08, 0x0b, 0x0e-0x1f, 0x7f, the
    // U+FDD0-FDEF block, and every plane's trailing FFFE/FFFF pair,
    // which CPython DROPS (empty string). Branch order mirrors
    // _replace_charref: remap first (so 0x80-0x9F never reaches the
    // drop set), then surrogates / out-of-range, then the drop set.
    val dropped = (code >= 0x01L && code <= 0x08L) || code === 0x0bL ||
      (code >= 0x0eL && code <= 0x1fL) || code === 0x7fL ||
      (code >= 0xfdd0L && code <= 0xfdefL) ||
      (code % 0x10000L >= 0xfffeL)
    numericRemap.foldLeft(when(lit(false), lit(""))) {
      case (acc, (k, v)) => acc.when(code === k, lit(v))
    }.when(invalid, lit("\ufffd"))
      .when(dropped, lit(""))
      .otherwise(base)
  }

  /** Strip leading zeros but keep at least one digit (RE2 in the oracle
    * engine has no lookahead, so both engines use the ltrim form).
    */
  private def sigDigits(d: Column): Column = {
    val t = ltrim(d, "0")
    when(t === "", lit("0")).otherwise(t)
  }

  /** Full single-pass HTML-entity unescape. Production path: the native
    * codegen expression ([[HtmlUnescape]] -- one scan, early exit on
    * '&'-free rows; the column formulation below costs 2-4x per text
    * query at sf0.1). [[htmlUnescapeCols]] keeps the same semantics as
    * pure column expressions, as the cross-check reference (TextOpsSpec
    * pins native == columns == CPython vectors).
    */
  def htmlUnescape(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HtmlUnescape(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Column-expression formulation (cross-check reference only):
    * mark every covered reference with NUL/SOH sentinels (\u0000 body \u0001) in
    * one regexp pass, split on \u0000, decode each marked segment head.
    * Codepoint bounds are enforced via significant-digit counts (≤ 7
    * decimal / ≤ 6 hex covers 0x10FFFF; longer is out of range).
    */
  def htmlUnescapeCols(c: Column): Column = {
    val marked = regexp_replace(c, entityPattern, "\u0000$1\u0001")
    val decoded = transform(split(marked, "\u0000"), seg => {
      val p = instr(seg, "\u0001")
      val body = substring_index(seg, "\u0001", 1)
      val rest = seg.substr(p + 1, length(seg))
      val isHex = lower(body.substr(lit(2), lit(1))) === "x"
      val hexD = sigDigits(body.substr(lit(3), length(body)))
      val decD = sigDigits(body.substr(lit(2), length(body)))
      val code =
        when(isHex,
          when(length(hexD) <= 6, conv(hexD, 16, 10).cast("long"))
            .otherwise(lit(0x110000L)))
        .otherwise(
          when(length(decD) <= 7, decD.cast("long"))
            .otherwise(lit(0x110000L)))
      val named = namedEntities.foldLeft(when(body.startsWith("#"), chrUnicode(code))) {
        case (acc, (k, v)) => acc.when(body === k, lit(v))
      }.otherwise(body) // unreachable: the pattern only marks covered bodies
      when(p === 0, seg).otherwise(concat(named, rest))
    })
    array_join(decoded, "")
  }

  /** Cleaning regex steps shared with the oracle SQL (see OracleSql).
    * The unicode-whitespace step mirrors Python's unicode-aware `\s` on
    * the codepoints that survive unescaping (NBSP from &nbsp;/&#160;,
    * typographic spaces): the reference's charset filter KEEPS them (its
    * `\s` is unicode) and its final collapse folds them to ' '; the
    * engines' ASCII `\s` would delete them instead, so they are folded
    * to ' ' up front. (Patterns use \x{..} — valid in both Java regex
    * and RE2, which has no \uXXXX.)
    */
  val cleanSteps: Seq[(String, String)] = Seq(
    "[\\x{0b}\\x{1c}-\\x{1f}\\x{85}\\x{a0}\\x{1680}\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]" -> " ",
    "http\\S+|www\\S+" -> "",          // URLs (embed.py:37)
    "<.*?>" -> "",                      // HTML tags (embed.py:40)
    "[@#]\\w+" -> "",                   // mentions/hashtags (embed.py:43)
    "[^a-z0-9\\s.,!?;:'\"-]" -> "",     // non-alnum except punct (embed.py:46)
    "\\s+" -> " ")                      // whitespace collapse (embed.py:49)

  def cleanText(c: Column): Column = {
    val lowered = lower(htmlUnescape(coalesce(c, lit(""))))
    trim(cleanSteps.foldLeft(lowered) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    })
  }

  /** Whitespace tokens of already-cleaned text. Matches Python
    * `text.split(' ')` (single-space split after whitespace collapse);
    * empty string yields one empty token, like Python.
    */
  def tokens(clean: Column): Column = split(clean, " ")

  // long, not int: the driver's oracle comparator is dtype-sensitive and
  // DuckDB counts are BIGINT
  def tokenCount(clean: Column): Column = size(tokens(clean)).cast("long")

  /** Distinct-token overlap count against a fixed vocabulary — the
    * deterministic building block for language-ID and relevance scoring.
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(vocab.map(lit): _*)))
      .cast("long")

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, broadcast as literals.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "los", "de", "y", "que", "en", "un", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "du", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** argmax language by stopword hits; ties break alphabetically (the
    * fold visits languages in sorted order and only a strictly greater
    * hit count replaces the current winner).
    */
  def langId(toks: Column): Column = {
    val hits = stopwords.map { case (l, ws) => l -> vocabHits(toks, ws) }
    val (l0, h0) = hits.head
    hits.tail.foldLeft((lit(l0), h0)) { case ((bl, bh), (l, h)) =>
      (when(h > bh, lit(l)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }._1
  }

  /** Punctuation-character ratio of the cleaned text. */
  def punctRatio(clean: Column): Column = {
    val stripped = regexp_replace(clean, "[.,!?;:'\"-]", "")
    (length(clean) - length(stripped)).cast("double") /
      greatest(length(clean), lit(1)).cast("double")
  }

  /** English stopword-density of the token stream. */
  def stopwordRatio(toks: Column): Column = {
    val en = stopwords.toMap.apply("en")
    val hits = size(filter(toks, t => array_contains(array(en.map(lit): _*), t)))
    hits.cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Heuristic document-quality score in [0,1]: length saturation,
    * low punctuation noise, natural stopword density.
    */
  def qualityScore(clean: Column): Column = {
    val toks = tokens(clean)
    val lenScore = least(tokenCount(clean).cast("double") / lit(100.0), lit(1.0))
    lit(0.4) * lenScore +
      lit(0.3) * (lit(1.0) - punctRatio(clean)) +
      lit(0.3) * least(stopwordRatio(toks) * lit(4.0), lit(1.0))
  }

  /** Order-insensitive document fingerprint: md5 of the sorted distinct
    * token set. Robust to token shuffling; used for near-dup grouping.
    */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))).cast("binary"))

  /** Cleanup of model output text (reference: summarize.py:11-25): strip
    * outer quotes, keep text after the last `ASSISTANT:` marker, strip
    * trailing end-markers.
    */
  def extractSummary(c: Column): Column = {
    val unquoted = regexp_replace(regexp_replace(c, "^\"", ""), "\"$", "")
    val afterAssistant =
      when(unquoted.contains("ASSISTANT:"),
        element_at(split(unquoted, "ASSISTANT:"), -1)).otherwise(unquoted)
    trim(regexp_replace(afterAssistant, "(</s>|\\[END\\]|\\[/ASSISTANT\\])+$", ""))
  }
}
