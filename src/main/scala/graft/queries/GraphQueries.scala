package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Graph analytics over the co-purchase graph (parts co-ordered within
  * an order), complementing the PageRank of q84: exact triangle counting
  * with the degree-orientation trick — the skew killer that makes
  * distributed triangle enumeration feasible (Suri & Vassilvitskii,
  * WWW'11 "Counting Triangles and the Curse of the Last Reducer").
  */
object GraphQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Canonical (u < v) co-purchase edge set — q100/q152's shared input. */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
  }

  private def coEdgesCte: String =
    """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v
      |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)""".stripMargin

  /** Chained-CTE k-core peel: d_i = surviving degrees of e_{i-1},
    * e_i = edges with both endpoints surviving — generated from one
    * template so the SQL twin cannot drift from the Spark loop.
    */
  private def kcoreSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder(s"WITH $coEdgesCte,\ne0 AS (SELECT u, v FROM e)")
    for (i <- 1 to rounds) sb.append(s""",
      |d$i AS (SELECT x, count(*) AS dg FROM
      |          (SELECT u AS x FROM e${i - 1} UNION ALL SELECT v AS x FROM e${i - 1})
      |        GROUP BY x HAVING count(*) >= $k),
      |e$i AS (SELECT e${i - 1}.u, e${i - 1}.v FROM e${i - 1}
      |        JOIN d$i a ON e${i - 1}.u = a.x JOIN d$i b ON e${i - 1}.v = b.x),
      |r$i AS (SELECT CAST($i AS BIGINT) AS round,
      |          (SELECT count(*) FROM d$i) AS n_nodes, count(*) AS n_edges
      |        FROM e$i)""".stripMargin)
    sb.append("\nSELECT round, n_nodes, n_edges FROM (" +
      (1 to rounds).map(i => s"SELECT * FROM r$i").mkString(" UNION ALL ") +
      ") ORDER BY round")
    sb.toString
  }

  val all: Seq[Q] = Seq(

    // Exact triangle count + global transitivity. Edges are oriented
    // from the lower-(degree, id) endpoint to the higher, so every
    // wedge join fans out by ORIENTED out-degree — bounded by O(√m) on
    // any graph — instead of raw degree: the hub vertex that would
    // produce deg² candidate pairs (the "last reducer" at 100 TB)
    // produces almost none. Each triangle is counted exactly once, at
    // its unique rank-minimal apex. The closing-edge probe joins the
    // canonical (u<v) undirected edge set; wedge count Σ d(d-1)/2 is an
    // exact integer, so transitivity = 3T/W matches bit-for-bit.
    Q("q100_triangle_count", (s, dir) => {
      // undirected edge set, canonical u < v; feeds degree, orientation,
      // and the closing-edge probe — one build, three consumers
      val e = coEdges(s, dir).persist()
      val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy("x").agg(count(lit(1)).as("dg"))
      val lower = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val ori = e
        .join(broadcast(deg.select(col("x").as("u"), col("dg").as("du"))), "u")
        .join(broadcast(deg.select(col("x").as("v"), col("dg").as("dv"))), "v")
        .select(when(lower, col("u")).otherwise(col("v")).as("src"),
          when(lower, col("v")).otherwise(col("u")).as("dst"))
        .persist()
      // Closing-edge probe: the wedge stream is the big side (Σ C(out,2)
      // rows) — BROADCAST the canonical edge set so the wedges are probed
      // map-side and never cross an exchange; the wedge self-join shuffles
      // only the oriented edges themselves. The probe joins on the raw
      // (u, v) pair — a two-column hash key, safe at any id range (an
      // arithmetic u·2^32+v pack would silently collide once ids reach
      // 2^32, exactly at the scales this orientation targets).
      val tri = ori.as("e1").join(ori.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
        .select(col("e1.dst").as("u"), col("e2.dst").as("v"))
        .join(broadcast(e), Seq("u", "v"))
        .agg(count(lit(1)).as("n_triangles"))
      val wd = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      tri.crossJoin(wd).crossJoin(ne)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          col("n_wedges"),
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
            .as("transitivity"))
    }, Some(
      s"""WITH $coEdgesCte,
        |deg AS (SELECT x, count(*) AS dg FROM
        |          (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |        GROUP BY x),
        |ori AS (SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |                 THEN e.u ELSE e.v END AS src,
        |               CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |                 THEN e.v ELSE e.u END AS dst
        |        FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM ori e1 JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst
        |        JOIN e ON e.u = e1.dst AND e.v = e2.dst),
        |wd AS (SELECT count(*) AS n_nodes,
        |         CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |ne AS (SELECT count(*) AS n_edges FROM e)
        |SELECT wd.n_nodes AS n_nodes, ne.n_edges AS n_edges,
        |  tri.n_triangles AS n_triangles, wd.n_wedges AS n_wedges,
        |  round(3.0 * tri.n_triangles / wd.n_wedges, 6) AS transitivity
        |FROM tri, wd, ne""".stripMargin)),

    // k-core peeling (k=3, 4 synchronous rounds): each round drops
    // vertices below degree k, then edges touching a dropped vertex —
    // the community/spam-screen primitive (Batagelj & Zaveršnik's peel,
    // unrolled). Per round: one degree aggregate + two semi-join-shaped
    // probes; every round's output is a single census row, so the query
    // emits the CONVERGENCE TRAJECTORY (nodes/edges remaining per
    // round) deterministically even before the peel reaches fixpoint —
    // the honest contract for a bounded-round distributed peel at
    // 100 TB, where iterate-to-fixpoint is a driver-side loop over
    // exactly this plan.
    Q("q152_kcore", (s, dir) => {
      val k = 3
      var e = coEdges(s, dir).persist()
      val rounds = (1 to 4).map { i =>
        val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy("x").agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k)
        val e2 = e.join(deg.select(col("x").as("u")), "u")
          .join(deg.select(col("x").as("v")), "v")
          .select("u", "v").persist()
        val row = e2.agg(count(lit(1)).as("n_edges"))
          .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
          .select(lit(i.toLong).as("round"), col("n_nodes"), col("n_edges"))
        e = e2
        row
      }
      rounds.reduce(_ unionByName _).orderBy("round")
    }, Some(kcoreSql(3, 4))))
}
