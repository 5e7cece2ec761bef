package graft.queries

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One query = a Spark plan + (optionally) its ANSI-SQL mirror for the
  * driver's DuckDB oracle. Column names must match exactly (the driver
  * sorts columns by name before hashing).
  *
  * Cache contract: a few queries `persist()` an intermediate that feeds
  * multiple branches of the same plan (e.g. q100's edge set). The cache
  * is only needed while THAT query's action runs; both harness mains
  * (Bench, Verify) call `spark.catalog.clearCache()` after each query,
  * and embedding callers running many queries in one session should do
  * the same (or rely on Spark's LRU block eviction).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Cross-engine determinism helpers.
  *
  * Doubles summed in different orders differ in the last ulps, so any
  * aggregate that feeds a hash comparison goes through exact decimal
  * arithmetic (identical in Spark and DuckDB) and is rounded on output.
  * Every query also carries a total ORDER BY (ties broken by key) so row
  * order is reproducible on both engines.
  */
object Helpers {

  /** Exact sum: cast to decimal(20,6) (bit-identical for doubles of this
    * provenance), sum exactly, surface as rounded double.
    */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(20, 6))).cast("double"), 4)

  def dsumSql(e: String): String =
    s"round(CAST(sum(CAST(($e) AS DECIMAL(20,6))) AS DOUBLE), 4)"

  /** Exact mean: decimal sum cast double, divided by count, rounded. */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(20, 6))).cast("double") / count(lit(1)), 6)

  def davgSql(e: String): String =
    s"round(CAST(sum(CAST(($e) AS DECIMAL(20,6))) AS DOUBLE) / count(*), 6)"

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB mirror of TextOps.cleanText — generated from the same entity
    * and regex step lists so the two engines cannot drift.
    */
  def cleanTextSql(e: String): String = {
    val unescaped = TextOps.htmlEntities.foldLeft(s"coalesce(($e), '')") {
      case (acc, (k, v)) => s"replace($acc, ${sqlLit(k)}, ${sqlLit(v)})"
    }
    val replaced = TextOps.cleanSteps.foldLeft(s"lower($unescaped)") {
      case (acc, (pat, rep)) =>
        s"regexp_replace($acc, ${sqlLit(pat)}, ${sqlLit(rep)}, 'g')"
    }
    s"trim($replaced)"
  }

  /** DuckDB mirror of TextOps.tokens (single-space split, Python parity). */
  def tokensSql(cleanExpr: String): String = s"string_split($cleanExpr, ' ')"

  def vocabHitsSql(toksExpr: String, vocab: Seq[String]): String =
    s"len(list_intersect(list_distinct($toksExpr), [${vocab.map(sqlLit).mkString(",")}]))"

  /** DuckDB mirror of TextOps.langId — same fold, same tie semantics. */
  def langIdSql(toksExpr: String): String = {
    val hits = TextOps.stopwords.map { case (l, ws) => l -> vocabHitsSql(toksExpr, ws) }
    hits.tail.foldLeft((sqlLit(hits.head._1), hits.head._2)) {
      case ((bl, bh), (l, h)) =>
        (s"(CASE WHEN $h > $bh THEN ${sqlLit(l)} ELSE $bl END)", s"greatest($h, $bh)")
    }._1
  }

  /** DuckDB mirror of VectorOps.dot over DOUBLE[] expressions. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]*p[2]))"

  def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> x*x)))"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** DuckDB mirror of Features.minMaxNorm's per-row expression given
    * precomputed lo/hi columns.
    */
  def minMaxSql(e: String, lo: String, hi: String): String =
    s"(CASE WHEN abs(($hi) - ($lo)) <= 1e-8 + 1e-5*abs($lo) THEN 0.5 " +
      s"ELSE (least(greatest(($e), ($lo)), ($hi)) - ($lo)) / (($hi) - ($lo) + 1e-9) END)"

  /** DuckDB mirror of Features.bayesianRating / 5.0 + popularity + priceFit. */
  def bayesSql(r: String, n: String): String =
    s"((4.3*100.0 + coalesce(CAST(($r) AS DOUBLE), 4.3) * coalesce(CAST(($n) AS DOUBLE), 0.0)) " +
      s"/ (100.0 + coalesce(CAST(($n) AS DOUBLE), 0.0)))"

  def popularitySql(n: String): String =
    s"(CASE WHEN ($n) IS NOT NULL AND ($n) >= 0 THEN ln(1.0 + CAST(($n) AS DOUBLE)) ELSE 0.0 END)"

  def priceFitSql(price: String, anchor: String, priceStd: String): String = {
    val sigmaBase = s"(CASE WHEN ($priceStd) IS NOT NULL AND ($priceStd) > 0 " +
      s"THEN greatest(0.3*($anchor), 0.5*($priceStd)) ELSE 0.3*($anchor) END)"
    val sigma = s"((CASE WHEN ($price) > ($anchor) THEN 0.6 ELSE 1.2 END) * $sigmaBase)"
    s"(CASE WHEN ($anchor) IS NULL OR ($anchor) <= 0 THEN 0.5 " +
      s"WHEN ($price) IS NULL OR ($price) <= 0 THEN 0.2 " +
      s"ELSE exp(-pow(($price) - ($anchor), 2) / (2.0 * pow($sigma, 2))) END)"
  }

  /** Deterministic pseudo-metadata derived from `documents` — gives the
    * reference's product-meta shape (title/summary/rating/review_count/
    * price with realistic null patterns) on the driver's synthetic corpus.
    * Mirrored exactly in metaAnalogSql.
    */
  def metaAnalog(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("id"),
      substring(col("text"), 1, 80).as("title"),
      substring(col("text"), 81, 80).as("summary"),
      when(col("doc_id") % 5 === 0, lit(null))
        .otherwise(lit(3.0) + (col("doc_id") % 21) / lit(10.0)).as("rating"),
      when(col("doc_id") % 4 === 0, lit(null))
        .otherwise((col("doc_id") * 37) % 1000).as("review_count"),
      when(col("doc_id") % 7 === 0, lit(null))
        .otherwise(round(col("n_chars") / lit(10.0), 2)).as("price"))

  val metaAnalogSql: String =
    """SELECT doc_id AS id,
      | substr(text, 1, 80) AS title, substr(text, 81, 80) AS summary,
      | CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 3.0 + (doc_id % 21)/10.0 END AS rating,
      | CASE WHEN doc_id % 4 = 0 THEN NULL ELSE (doc_id * 37) % 1000 END AS review_count,
      | CASE WHEN doc_id % 7 = 0 THEN NULL ELSE round(n_chars/10.0, 2) END AS price
      |FROM documents""".stripMargin
}
