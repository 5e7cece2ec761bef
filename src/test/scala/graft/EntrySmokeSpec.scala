package graft

/** End-to-end smoke over the sf0.001 testdata (driver t1 contract). */
class EntrySmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("flagship recommend returns finalK rows with stable partition order") {
    val rows = SparkEntry.queries("q40_recommend_top10")(spark, sf).collect()
    assert(rows.length == 10)
    // with-price block strictly precedes without-price block
    val flags = rows.map(_.getAs[Boolean]("has_price")).toSeq
    assert(flags == flags.sortBy(!_))
  }

  test("mmr recommend returns rows and is a subset of candidates") {
    val rows = SparkEntry.queries("q41_recommend_mmr")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).distinct.length == 10)
  }

  test("every registered query carries an exact DuckDB oracle") {
    // 100% oracle coverage is a project invariant as of round 2 — a new
    // query landing without its SQL twin should fail here, not at the
    // driver's correctness gate
    val missing = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("every registered query yields a schema and rows on sf0.001") {
    SparkEntry.allQueries.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, q.name)
      assert(df.count() > 0, q.name)
    }
  }
}
