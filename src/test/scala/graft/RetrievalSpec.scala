package graft

import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the round-3 retrieval/stat/graph
  * operators at sf0.001 — independent of the DuckDB oracle, these pin
  * the ALGORITHMS (prefix-filter completeness, k-core peel, bootstrap
  * weight distribution, phrase-match overlap semantics) against naive
  * reference implementations small enough to be obviously correct.
  */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("prefix-filtered set-similarity join finds EXACTLY the brute-force pairs") {
    // naive all-pairs Jaccard over the same shingle sets
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(graft.text.TextOps.cleanText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), expr(
        "transform(sequence(0, size(toks) - 5), i -> concat_ws(' ', slice(toks, i + 1, 5)))")
        .as("shs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val brute = (for {
      (da, sa) <- docs; (db, sb) <- docs if da < db
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.5
    } yield (da, db)).toSet
    val got = q("q154_setsim_join").map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("set-sim join canonical branch (material dup group) matches brute force") {
    // a corpus where the q154 cost census flips to the exact-first
    // canonical path: an 8-member identical group (28 saved pairs ≥ 11
    // docs), one near-dup of it, two unrelated docs. The expanded
    // output (ids, n_a/n_b, n_inter, jaccard) must equal brute force:
    // the group's 28 within-pairs pin the jaccard-1.0 expansion and
    // the near-dup's 8 cross-pairs pin the rep-pair expansion.
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val rows = (1 to 8).map(i => (i.toLong, base)) ++ Seq((20L, near),
      (21L, "one two three four five six seven eight nine ten"),
      (22L, "red green blue yellow purple orange pink brown black white"))
    val tmp = java.nio.file.Files.createTempDirectory("q154canon").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sets = rows.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(5).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (da, sa) <- sets; (db, sb) <- sets if da < db
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (da, db) -> (sa.size.toLong, sb.size.toLong, inter.toLong, jr)).toMap
    val got = SparkEntry.queries("q154_setsim_join")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got == want,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
  }

  test("k-core census matches a driver-side iterative peel") {
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .groupBy("o").agg(collect_set("p").as("ps"))
      .collect()
      .flatMap(_.getSeq[Long](1).sorted.combinations(2).map(c => (c(0), c(1))))
      .toSet
    var e = edges
    val expected = (1 to 4).map { round =>
      val deg = e.toSeq.flatMap(t => Seq(t._1, t._2)).groupBy(identity)
        .view.mapValues(_.size).filter(_._2 >= 3).keySet
      e = e.filter(t => deg.contains(t._1) && deg.contains(t._2))
      (round.toLong, deg.size.toLong, e.size.toLong)
    }
    val got = q("q152_kcore")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("phrase search counts OVERLAPPING occurrences") {
    // "table table table" contains the phrase "table table" twice
    val got = q("q148_phrase_search")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(graft.text.TextOps.cleanText(col("text")), " ").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    docs.foreach { case (id, toks) =>
      val n = toks.sliding(2).count(w => w.length == 2 &&
        w.head == "table" && w(1) == "table")
      assert(got.getOrElse(id, 0L) == n.toLong, s"doc $id: ${got.get(id)} vs $n")
    }
  }

  test("bootstrap weights are hash-balanced and the CI brackets the exact mean") {
    val row = q("q155_bootstrap_ci").head
    val lo = row.getAs[Double]("ci_lo")
    val hi = row.getAs[Double]("ci_hi")
    val exact = row.getAs[Double]("exact_mean")
    val boot = row.getAs[Double]("boot_mean")
    assert(lo < hi)
    assert(lo < exact && exact < hi,
      s"CI [$lo, $hi] should bracket the exact mean $exact")
    assert(math.abs(boot - exact) < (hi - lo),
      s"bootstrap mean $boot implausibly far from exact mean $exact")
  }

  test("IVF-PQ search is self-consistent: the query prices itself at zero") {
    val rows = q("q160_ivfpq_search")
    assert(rows.length == 10)
    // query = seed vector 0: its own PQ codes reconstruct exactly, so it
    // must rank first with both ADC and exact distance zero
    val first = rows.find(_.getAs[Long]("rank") == 1L).get
    assert(first.getAs[Long]("vec_id") == 0L)
    assert(first.getAs[Double]("approx_d2") == 0.0)
    assert(first.getAs[Double]("exact_d2") == 0.0)
    // ADC ordering is monotone in rank, and candidates come from <= 2 cells
    val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("approx_d2"))
    assert(byRank.sameElements(byRank.sorted))
    assert(rows.map(_.getAs[Long]("cell")).distinct.length <= 2)
  }

  test("BM25 scores decrease with document length at equal tf") {
    // recompute one doc's score from first principles
    val rows = q("q146_bm25")
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(graft.text.TextOps.cleanText(col("text")), " ").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.length >= 3))
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length).sum.toDouble / n
    val qterms = Seq("spark", "vector", "customer")
    val df = qterms.map(t => t -> toks.count(_._2.contains(t))).toMap
    def bm25(id: Long): BigDecimal = {
      val dl = toks.find(_._1 == id).get._2.length
      qterms.map { t =>
        val tf = toks.find(_._1 == id).get._2.count(_ == t)
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
    }
    rows.take(3).foreach { r =>
      val expected = bm25(r.getLong(0)).toDouble
      assert(math.abs(r.getAs[Double]("score") - expected) < 1e-6,
        s"doc ${r.getLong(0)}: ${r.getAs[Double]("score")} vs $expected")
    }
  }
}
