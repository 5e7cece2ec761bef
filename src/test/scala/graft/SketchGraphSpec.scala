package graft

import graft.queries.{GraphQueries, SketchQueries}
import org.apache.spark.sql.Row

/** Driver-side brute-force cross-checks for the sketch and graph
  * operators at sf0.001 — independent of the DuckDB oracle, these pin
  * the ALGORITHMS (CMS one-sided error, HLL accuracy, degree-oriented
  * triangle enumeration, staircase skyline, binned interval join)
  * against naive reference implementations small enough to be obviously
  * correct.
  */
class SketchGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("CMS estimates are one-sided: est >= exact for every reported user") {
    val rows = q("q98_cms_heavy_hitters")
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"user ${r.get(0)}: est $est < exact $exact")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("HLL estimate lands within 30% of the exact distinct count") {
    q("q99_hll_cardinality").foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact < 0.30,
        s"${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("triangle count matches a brute-force enumeration of the edge set") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    val edges = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val tri = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(u, Set.empty).count(w => w > v && edges.contains((v, w)))
    }.sum
    val Array(row) = q("q100_triangle_count")
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_triangles") == tri.toLong)
  }

  test("skyline equals the brute-force non-dominated set") {
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)) = parts.exists { o =>
      o._2 <= p._2 && o._3 >= p._3 && (o._2 < p._2 || o._3 > p._3)
    }
    val expected = parts.filterNot(dominated).map(_._1).toSet
    val got = q("q104_skyline").map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expected)
  }

  test("binned interval join equals the naive range-predicate join") {
    val win = 30L * 86400L
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter("o_orderpriority = '1-URGENT' AND o_totalprice > 480000.0")
      .selectExpr("o_orderkey", "unix_timestamp(o_orderdate) AS t0").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ship = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("unix_timestamp(l_shipdate) AS ts").collect().map(_.getLong(0))
    val expected = ord.map { case (k, t0) =>
      k -> ship.count(ts => ts >= t0 && ts < t0 + win).toLong
    }.filter(_._2 > 0).toMap
    val got = q("q101_interval_join")
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("n_shipped")).toMap
    assert(got == expected)
  }

  test("Bloom filter admits every member and reports zero false negatives") {
    val Array(r) = q("q106_bloom_semijoin")
    assert(r.getAs[Long]("n_false_neg") == 0L)
    assert(r.getAs[Long]("n_pass") ==
      r.getAs[Long]("n_members") + r.getAs[Long]("n_false_pos"))
    assert(r.getAs[Long]("n_members") <= r.getAs[Long]("n_probe"))
  }

  test("KMV set-algebra estimates agree with exact overlap within 35%") {
    val Array(r) = q("q107_kmv_setops")
    val exactU = r.getAs[Long]("exact_union").toDouble
    assert(math.abs(r.getAs[Double]("est_union") - exactU) / exactU < 0.35)
    assert(r.getAs[Double]("est_jaccard") >= 0.0 &&
      r.getAs[Double]("est_jaccard") <= 1.0)
  }

  test("dataset fingerprint matches a driver-side mod-2^64 recompute") {
    val M = BigInt(1) << 64
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val s = rows.map { case (_, id, text) =>
        BigInt(java.lang.Long.toUnsignedString(
          graft.text.StableHash.hash64(s"$id:${md5hex(text)}")))
      }.sum % M
      src -> ((s >> 32).toLong, (s % BigInt(4294967296L)).toLong)
    }
    val got = q("q108_dataset_fingerprint").map(r =>
      r.getAs[String]("source") ->
        ((r.getAs[Long]("fp_hi"), r.getAs[Long]("fp_lo")))).toMap
    assert(got == expected)
  }

  test("MAD anomaly counts are consistent with a driver-side recompute") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      val h = (n - 1) * 0.5
      val lo = s(h.toInt)
      val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val expected = ev.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2)
      val med = median(xs)
      val mad = median(xs.map(v => math.abs(v - med)))
      t -> xs.count(v => math.abs(v - med) > 3.0 * mad).toLong
    }
    val got = q("q103_mad_anomaly")
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_outliers")).toMap
    assert(got == expected)
  }
}
