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

  /** Entity → replacement chain; `&amp;` deliberately last so that
    * double-escaped text like `&amp;lt;` decodes to `&lt;` exactly as
    * Python's html.unescape does (reference: embed.py:31).
    */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Limited HTML-entity decode covering the common named entities. The
    * reference uses Python's full `html.unescape`; the engine pins the
    * deterministic subset above so the semantics stay SQL-expressible.
    */
  def htmlUnescapeLite(c: Column): Column =
    htmlEntities.foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** Cleaning regex steps shared with the oracle SQL (see OracleSql). */
  val cleanSteps: Seq[(String, String)] = Seq(
    "http\\S+|www\\S+" -> "",          // URLs (embed.py:37)
    "<.*?>" -> "",                      // HTML tags (embed.py:40)
    "[@#]\\w+" -> "",                   // mentions/hashtags (embed.py:43)
    "[^a-z0-9\\s.,!?;:'\"-]" -> "",     // non-alnum except punct (embed.py:46)
    "\\s+" -> " ")                      // whitespace collapse (embed.py:49)

  def cleanText(c: Column): Column = {
    val lowered = lower(htmlUnescapeLite(coalesce(c, lit(""))))
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
