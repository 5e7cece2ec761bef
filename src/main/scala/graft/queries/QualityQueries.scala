package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Engine tooling over the data itself: ANALYZE-style column statistics
  * (the optimizer food every warehouse gathers) and a Deequ-style
  * data-quality validation suite (the constraint gate every production
  * pipeline runs before publishing a table).
  */
object QualityQueries {

  val all: Seq[Q] = Seq(

    // Column statistics collector: count / nulls / exact NDV / min / max
    // per column of lineitem, one row per column (values surfaced as
    // strings so heterogeneous column types share one schema — the
    // catalog-stats shape). One pass; the multi-distinct plans as one
    // Expand. At 100 TB the NDVs swap to sketches (q67/q99) — same
    // output contract.
    Q("q123_column_stats", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val agg = li.agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("ndv_orderkey"),
        countDistinct(col("l_partkey")).as("ndv_partkey"),
        countDistinct(col("l_returnflag")).as("ndv_returnflag"),
        countDistinct(col("l_quantity")).as("ndv_quantity"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("null_returnflag"),
        min("l_quantity").as("min_quantity"), max("l_quantity").as("max_quantity"),
        min("l_extendedprice").as("min_price"), max("l_extendedprice").as("max_price"))
      agg.selectExpr("n", "stack(4, " +
          "'l_orderkey',   ndv_orderkey,   0L,              CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'l_partkey',    ndv_partkey,    0L,              CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'l_returnflag', ndv_returnflag, null_returnflag, CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'l_quantity',   ndv_quantity,   0L, CAST(min_quantity AS STRING), CAST(max_quantity AS STRING)" +
          ") AS (column_name, ndv, n_nulls, min_value, max_value)")
        .select(col("column_name"), col("n"), col("ndv"), col("n_nulls"),
          col("min_value"), col("max_value"))
        .orderBy("column_name")
    }, Some(
      """WITH a AS (SELECT count(*) AS n,
        |    count(DISTINCT l_orderkey) AS ndv_orderkey,
        |    count(DISTINCT l_partkey) AS ndv_partkey,
        |    count(DISTINCT l_returnflag) AS ndv_returnflag,
        |    count(DISTINCT l_quantity) AS ndv_quantity,
        |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_returnflag,
        |    min(l_quantity) AS min_quantity, max(l_quantity) AS max_quantity
        |  FROM lineitem),
        |s AS (
        |  SELECT n, 'l_orderkey' AS column_name, ndv_orderkey AS ndv,
        |    CAST(0 AS BIGINT) AS n_nulls, CAST(NULL AS VARCHAR) AS min_value,
        |    CAST(NULL AS VARCHAR) AS max_value FROM a
        |  UNION ALL SELECT n, 'l_partkey', ndv_partkey, 0, NULL, NULL FROM a
        |  UNION ALL SELECT n, 'l_returnflag', ndv_returnflag, null_returnflag,
        |    NULL, NULL FROM a
        |  UNION ALL SELECT n, 'l_quantity', ndv_quantity, 0,
        |    CAST(min_quantity AS VARCHAR), CAST(max_quantity AS VARCHAR) FROM a)
        |SELECT column_name, n, ndv, n_nulls, min_value, max_value
        |FROM s ORDER BY column_name""".stripMargin)),

    // Data-quality constraint suite: primary-key uniqueness, referential
    // integrity (lineitem→orders, orders→customer), value-range and
    // non-negativity checks — each one census row (violations + pass
    // flag). The checks share scans where possible; every check is a
    // semi/anti-join or aggregate the optimizer lays out as usual. At
    // 100 TB this replaces "trust the upstream" with one audited pass.
    Q("q124_dq_checks", (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val c = Tables.customer(s, dir)
      val pkDup = o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).agg(count(lit(1)).as("v"))
        .select(lit("orders_pk_unique").as("check_name"),
          coalesce(col("v"), lit(0L)).as("n_violations"))
      val fkLi = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v"))
        .select(lit("lineitem_fk_orders").as("check_name"),
          col("v").as("n_violations"))
      val fkO = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v"))
        .select(lit("orders_fk_customer").as("check_name"),
          col("v").as("n_violations"))
      val nonNeg = li.agg(
        sum(when(col("l_extendedprice") < 0 || col("l_quantity") <= 0, 1L)
          .otherwise(0L)).as("v"))
        .select(lit("lineitem_amounts_positive").as("check_name"),
          col("v").as("n_violations"))
      val discount = li.agg(
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("v"))
        .select(lit("lineitem_discount_in_unit_range").as("check_name"),
          col("v").as("n_violations"))
      pkDup.unionAll(fkLi).unionAll(fkO).unionAll(nonNeg).unionAll(discount)
        .withColumn("passed",
          when(col("n_violations") === 0L, 1L).otherwise(0L))
        .orderBy("check_name")
    }, Some(
      """WITH checks AS (
        |  SELECT 'orders_pk_unique' AS check_name,
        |    CAST(count(*) AS BIGINT) AS n_violations
        |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey
        |        HAVING count(*) > 1) d
        |  UNION ALL
        |  SELECT 'lineitem_fk_orders', CAST(count(*) AS BIGINT)
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_fk_customer', CAST(count(*) AS BIGINT)
        |  FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'lineitem_amounts_positive',
        |    CAST(sum(CASE WHEN l_extendedprice < 0 OR l_quantity <= 0
        |         THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_discount_in_unit_range',
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
        |         THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem)
        |SELECT check_name, n_violations,
        |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM checks ORDER BY check_name""".stripMargin)))
}
