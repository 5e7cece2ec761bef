package graft.rank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking feature functions — pure column expressions mirroring the
  * reference's multi-factor scorer (reference: rank.py:44-54, 163-189,
  * 246-279). Every feature is a total function with explicit null
  * defaults, preserving the reference's `.get()`-tolerant semantics.
  */
object Features {
  val GlobalAvgRating = 4.3 // rank.py:182
  val BayesM = 100.0 // rank.py:182
  val MaxStarRating = 5.0 // rank.py:192
  val Epsilon = 1e-9 // rank.py:205

  /** Bayesian-smoothed rating (rank.py:182-189): null rating → prior,
    * null count → 0 (which collapses the whole expression to the prior).
    */
  def bayesianRating(rating: Column, count: Column): Column = {
    val r = coalesce(rating, lit(GlobalAvgRating))
    val n = coalesce(count.cast("double"), lit(0.0))
    (lit(GlobalAvgRating * BayesM) + r * n) / (lit(BayesM) + n)
  }

  /** log1p popularity; null/negative count → 0.0 (rank.py:248). */
  def popularity(count: Column): Column =
    when(count.isNotNull && count >= 0, log1p(count)).otherwise(lit(0.0))

  /** Gaussian price-fit around an anchor (rank.py:163-179):
    * null/≤0 anchor → 0.5; null/≤0 price → 0.2;
    * σ = (0.6 if price>anchor else 1.2) · max(0.3·anchor, 0.5·σ_prices).
    */
  def priceFit(price: Column, anchor: Column, priceStd: Column): Column = {
    val sigmaBase =
      when(priceStd.isNotNull && priceStd > 0,
        greatest(lit(0.3) * anchor, lit(0.5) * priceStd))
        .otherwise(lit(0.3) * anchor)
    val sigma = when(price > anchor, lit(0.6)).otherwise(lit(1.2)) * sigmaBase
    when(anchor.isNull || anchor <= 0, lit(0.5))
      .when(price.isNull || price <= 0, lit(0.2))
      .otherwise(exp(-pow(price - anchor, 2) / (lit(2.0) * pow(sigma, 2))))
  }

  /** numpy.isclose with default tolerances (rtol=1e-5, atol=1e-8), used by
    * the degenerate branch of min-max normalization (rank.py:51).
    */
  def isClose(a: Column, b: Column): Column =
    abs(a - b) <= lit(1e-8) + lit(1e-5) * abs(b)

  /** Percentile-clipped min-max normalization (rank.py:44-54): clip to
    * [p1,p99] of the WHOLE input frame, scale to [0,1] with +1e-9 on the
    * denominator; degenerate spread → constant 0.5. The percentile bounds
    * are a 2-row scalar aggregate broadcast back over the frame (one
    * map-side-combinable aggregation, no extra wide shuffle).
    */
  def minMaxNorm(df: DataFrame, inCol: String, outCol: String,
                 lower: Double = 0.01, upper: Double = 0.99): DataFrame = {
    val loName = s"__${outCol}_lo"
    val hiName = s"__${outCol}_hi"
    val bounds = df.agg(
      percentile(col(inCol), lit(lower)).as(loName),
      percentile(col(inCol), lit(upper)).as(hiName))
    val lo = col(loName)
    val hi = col(hiName)
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        when(isClose(hi, lo), lit(0.5))
          .otherwise((least(greatest(col(inCol), lo), hi) - lo) / (hi - lo + lit(Epsilon))))
      .drop(loName, hiName)
  }

  /** Default blend weights (rank.py:259-266). */
  val Alpha = 0.4 // cosine similarity
  val Beta = 0.2 // bayesian rating
  val Gamma = 0.1 // popularity
  val Delta = 0.15 // price fit
  val EpsilonW = 0.15 // reranker score
  val MmrLambda = 0.66

  /** Weighted linear blend (rank.py:269-279). */
  def blend(sim: Column, bayes: Column, popNorm: Column,
            priceFit: Column, rerankNorm: Column): Column =
    lit(Alpha) * sim + lit(Beta) * bayes + lit(Gamma) * popNorm +
      lit(Delta) * priceFit + lit(EpsilonW) * rerankNorm
}
