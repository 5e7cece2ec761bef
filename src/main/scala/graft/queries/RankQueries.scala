package graft.queries

import graft.rank.Ranker
import graft.sources.Tables
import graft.vector.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship end-to-end recommendation query (reference:
  * semantic.py:33-52 + rank.py:208-337): cosine retrieval → top-200 →
  * lexical rerank + min-max → budget/median price anchor → Bayesian
  * rating, popularity, Gaussian price-fit → weighted blend → top-k →
  * stable price-presence partition. q40 is the λ=1 (pure-relevance)
  * variant, fully declarative and DuckDB-oracled; q41 runs real greedy
  * MMR diversification over the collected top-200 (driver-side, like the
  * reference) and gets the driver's rows-only check.
  */
object RankQueries {
  import Helpers._

  val QueryText = "best value spark table under 300"
  private val qTokens = QueryText.split(" ").toSeq // parsed budget: 300.0

  private def inputs(s: SparkSession, dir: String): (DataFrame, DataFrame, Array[Double]) = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), VectorOps.asDouble(col("embedding")).as("vec"))
    val meta = metaAnalog(Tables.documents(s, dir))
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(VectorOps.asDouble(col("embedding")))
      .head().getSeq[Double](0).toArray
    (emb, meta, qv)
  }

  /** Shared WITH-chain through the `scored` CTE (all topK candidates,
    * id/price/score) — the prefix both the λ=1 oracle and the MMR oracle
    * build on.
    */
  private val oracleScoredPrefix: String = {
    val rerankVocab = qTokens.distinct.map(t => s"'$t'").mkString(",")
    val docText = cleanTextSql("coalesce(m.title, '') || ' ' || coalesce(m.summary, '')")
    s"""WITH meta AS ($metaAnalogSql),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       |sims AS (SELECT vec_id AS id,
       |   round(${cosineSql("CAST(embedding AS DOUBLE[])", "qv")}, 6) AS sim
       |  FROM embeddings CROSS JOIN q),
       |top AS (SELECT id, sim FROM sims ORDER BY sim DESC, id ASC LIMIT 200),
       |cand AS (SELECT t.id, t.sim, m.rating, m.review_count, m.price,
       |   CAST(len(list_intersect(list_distinct(string_split($docText, ' ')),
       |     [$rerankVocab])) AS DOUBLE) AS rerank
       |  FROM top t LEFT JOIN meta m ON m.id = t.id),
       |s AS (SELECT median(price) AS mprice, stddev_pop(price) AS sigma FROM cand),
       |f AS (SELECT cand.*, sigma,
       |   (CASE WHEN 300.0 <> 0.0 THEN 300.0 ELSE mprice END) AS anchor,
       |   ${bayesSql("rating", "review_count")}/5.0 AS bayes,
       |   ${popularitySql("review_count")} AS pop
       |  FROM cand CROSS JOIN s),
       |b AS (SELECT quantile_cont(pop, 0.01) AS pop_lo, quantile_cont(pop, 0.99) AS pop_hi,
       |   quantile_cont(rerank, 0.01) AS rr_lo, quantile_cont(rerank, 0.99) AS rr_hi FROM f),
       |scored AS MATERIALIZED (SELECT id, price,
       |   round(0.4*sim + 0.2*bayes + 0.1*${minMaxSql("pop", "pop_lo", "pop_hi")} +
       |     0.15*${priceFitSql("price", "anchor", "sigma")} +
       |     0.15*${minMaxSql("rerank", "rr_lo", "rr_hi")}, 6) AS score
       |  FROM f CROSS JOIN b)""".stripMargin
  }

  private val oracleQ40: String =
    s"""$oracleScoredPrefix,
       |ranked AS (SELECT id, score,
       |   row_number() OVER (ORDER BY score DESC, id ASC) AS pos,
       |   (price IS NOT NULL) AS has_price
       |  FROM scored)
       |SELECT id, score, pos, has_price FROM ranked WHERE pos <= 10
       |ORDER BY has_price DESC, pos ASC""".stripMargin

  /** Greedy-MMR oracle: the sequential argmax loop unrolled as finalK
    * chained MATERIALIZED CTEs (each step picks the remaining candidate
    * maximizing λ·score − (1−λ)·max-cosine-to-selected; ties resolve
    * score DESC, id ASC — the reference's strict-`>` scan order,
    * rank.py:297-325). Every constant is emitted from the Scala values so
    * the double arithmetic (incl. 1−λ's representation) is bit-identical.
    */
  private val oracleQ41: String = {
    val lam = graft.rank.Features.MmrLambda
    val oneMinus = 1 - lam // 0.33999999999999997, NOT nearest-double(0.34)
    def dotSqlPair(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> p[1]*p[2]))"
    val k = 10
    val steps = (2 to k).map { i =>
      val p = i - 1
      s"""sel$i AS MATERIALIZED (
         |  SELECT n.id, n.score, n.price, n.nv, $i AS step
         |  FROM nrm n, (SELECT list(id) AS ids, list(nv) AS vs FROM picked$p) pp
         |  WHERE NOT list_contains(pp.ids, n.id)
         |  ORDER BY ($lam*n.score - $oneMinus*list_max(list_transform(pp.vs, sv -> ${dotSqlPair("n.nv", "sv")}))) DESC,
         |    n.score DESC, n.id ASC
         |  LIMIT 1),
         |picked$i AS MATERIALIZED (SELECT * FROM picked$p UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""$oracleScoredPrefix,
       |vecs AS MATERIALIZED (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |nrm AS MATERIALIZED (SELECT s.id, s.score, s.price,
       |  list_transform(v.vec, x -> x / (sqrt(list_sum(list_transform(v.vec, y -> y*y))) + 1e-9)) AS nv
       |  FROM scored s JOIN vecs v USING (id)),
       |sel1 AS MATERIALIZED (SELECT id, score, price, nv, 1 AS step FROM nrm ORDER BY score DESC, id ASC LIMIT 1),
       |picked1 AS MATERIALIZED (SELECT * FROM sel1),
       |$steps
       |SELECT id, score, CAST(step AS BIGINT) AS mmr_pos, (price IS NOT NULL) AS has_price
       |FROM picked$k ORDER BY has_price DESC, mmr_pos ASC""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("q40_recommend_top10", (s, dir) => {
      val (emb, meta, qv) = inputs(s, dir)
      Ranker.recommendTopKPlan(emb, meta, QueryText, qv)
    }, Some(oracleQ40)),

    Q("q41_recommend_mmr", (s, dir) => {
      val (emb, meta, qv) = inputs(s, dir)
      Ranker.recommend(s, emb, meta, QueryText, qv)
    }, Some(oracleQ41)))
}
