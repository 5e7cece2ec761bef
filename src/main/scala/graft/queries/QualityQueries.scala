package graft.queries

import graft.sources.Tables
import graft.text.TextOps
import Helpers.cleanTextSql
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine tooling over the data itself: ANALYZE-style column statistics
  * (the optimizer food every warehouse gathers), a Deequ-style
  * data-quality validation suite (the constraint gate every production
  * pipeline runs before publishing a table), and content-quality
  * metrics (ROUGE summary overlap, readability).
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
        |FROM checks ORDER BY check_name""".stripMargin)),

    // ROUGE-1 / ROUGE-2 overlap between each document's head (reference
    // "title") and tail ("candidate summary") — the summary-quality
    // census, set-based (distinct n-grams) so every per-doc count is an
    // exact integer. Per-doc P/R/F round to 9dp, corpus means are exact
    // decimal sums — one map-only pass plus a 4-row aggregate.
    Q("q188_rouge_overlap", (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextOps.cleanText(substring(col("text"), 1, 80)).as("c1"),
        TextOps.cleanText(substring(col("text"), 81, 80)).as("c2"))
      def arr(c: String) =
        when(length(col(c)) === 0, typedLit(Seq.empty[String]))
          .otherwise(split(col(c), " "))
      def big(a: String) =
        when(size(col(a)) < 2, typedLit(Seq.empty[String]))
          .otherwise(array_distinct(expr(
            s"transform(sequence(1, size($a) - 1), " +
              s"i -> concat(element_at($a, i), ' ', element_at($a, i + 1)))")))
      val grams = d
        .withColumn("a1", arr("c1")).withColumn("a2", arr("c2"))
        .withColumn("t1", array_distinct(col("a1")))
        .withColumn("t2", array_distinct(col("a2")))
        .withColumn("b1", big("a1")).withColumn("b2", big("a2"))
        .select(col("source"),
          size(array_intersect(col("t1"), col("t2"))).as("i1"),
          size(col("t1")).as("n1"), size(col("t2")).as("n2"),
          size(array_intersect(col("b1"), col("b2"))).as("ib"),
          size(col("b1")).as("m1"), size(col("b2")).as("m2"))
      val scored = grams.select(col("source"),
        round(when(col("n2") === 0, 0.0)
          .otherwise(col("i1").cast("double") / col("n2")), 9).as("p1"),
        round(when(col("n1") === 0, 0.0)
          .otherwise(col("i1").cast("double") / col("n1")), 9).as("r1"),
        round(when(col("n1") + col("n2") === 0, 0.0)
          .otherwise(lit(2.0) * col("i1") / (col("n1") + col("n2"))), 9).as("f1"),
        round(when(col("m1") + col("m2") === 0, 0.0)
          .otherwise(lit(2.0) * col("ib") / (col("m1") + col("m2"))), 9).as("f2"))
      def m(c: String) = round(
        sum(col(c).cast(DecimalType(20, 12))).cast("double") / count(lit(1)), 6)
      scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), m("p1").as("rouge1_p"),
          m("r1").as("rouge1_r"), m("f1").as("rouge1_f"), m("f2").as("rouge2_f"))
        .orderBy("source")
    }, Some {
      def dm(e: String) =
        s"round(CAST(sum(CAST($e AS DECIMAL(20,12))) AS DOUBLE) / count(*), 6)"
      s"""WITH d AS (SELECT doc_id, source,
         |    ${cleanTextSql("substr(text, 1, 80)")} AS c1,
         |    ${cleanTextSql("substr(text, 81, 80)")} AS c2
         |  FROM documents),
         |ar AS (SELECT source,
         |    CASE WHEN length(c1) = 0 THEN [] ELSE string_split(c1, ' ') END AS a1,
         |    CASE WHEN length(c2) = 0 THEN [] ELSE string_split(c2, ' ') END AS a2
         |  FROM d),
         |gr AS (SELECT source,
         |    list_distinct(a1) AS t1, list_distinct(a2) AS t2,
         |    CASE WHEN len(a1) < 2 THEN []
         |      ELSE list_distinct(list_transform(range(1, len(a1)),
         |        i -> a1[i] || ' ' || a1[i + 1])) END AS b1,
         |    CASE WHEN len(a2) < 2 THEN []
         |      ELSE list_distinct(list_transform(range(1, len(a2)),
         |        i -> a2[i] || ' ' || a2[i + 1])) END AS b2
         |  FROM ar),
         |cnts AS (SELECT source,
         |    len(list_intersect(t1, t2)) AS i1, len(t1) AS n1, len(t2) AS n2,
         |    len(list_intersect(b1, b2)) AS ib, len(b1) AS m1, len(b2) AS m2
         |  FROM gr),
         |sc AS (SELECT source,
         |    round(CASE WHEN n2 = 0 THEN 0.0 ELSE CAST(i1 AS DOUBLE) / n2 END, 9) AS p1,
         |    round(CASE WHEN n1 = 0 THEN 0.0 ELSE CAST(i1 AS DOUBLE) / n1 END, 9) AS r1,
         |    round(CASE WHEN n1 + n2 = 0 THEN 0.0
         |      ELSE 2.0 * i1 / (n1 + n2) END, 9) AS f1,
         |    round(CASE WHEN m1 + m2 = 0 THEN 0.0
         |      ELSE 2.0 * ib / (m1 + m2) END, 9) AS f2
         |  FROM cnts)
         |SELECT source, count(*) AS n_docs, ${dm("p1")} AS rouge1_p,
         |  ${dm("r1")} AS rouge1_r, ${dm("f1")} AS rouge1_f, ${dm("f2")} AS rouge2_f
         |FROM sc GROUP BY source ORDER BY source""".stripMargin
    }),

    // Flesch reading-ease per source: words from the cleaned text,
    // syllables ≈ vowel runs (the standard heuristic), sentences from
    // terminal-punctuation runs in the RAW text (floored at 1). The
    // score is per-doc closed-form over three exact integers, rounded
    // 6dp; per-source means are exact decimal sums. One map-only pass.
    Q("q189_flesch_readability", (s, dir) => {
      val clean = TextOps.cleanText(col("text"))
      val d = Tables.documents(s, dir).select(col("source"),
        size(split(clean, " ")).cast("long").as("w"),
        regexp_count(clean, lit("[aeiouy]+")).cast("long").as("syl"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long").as("sent"))
      val scored = d.select(col("source"), col("w"),
        round(lit(206.835) - lit(1.015) * col("w") / col("sent") -
          lit(84.6) * col("syl") / col("w"), 6).as("flesch"))
      scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("w")).cast("double") / count(lit(1)), 2).as("avg_words"),
          round(sum(col("flesch").cast(DecimalType(20, 6))).cast("double") /
            count(lit(1)), 6).as("avg_flesch"))
        .orderBy("source")
    }, Some(
      s"""WITH d AS (SELECT source,
         |    CAST(len(string_split(${cleanTextSql("text")}, ' ')) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(${cleanTextSql("text")}, '[aeiouy]+')) AS BIGINT) AS syl,
         |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sent
         |  FROM documents),
         |sc AS (SELECT source, w,
         |    round(206.835 - 1.015 * w / sent - 84.6 * syl / w, 6) AS flesch
         |  FROM d)
         |SELECT source, count(*) AS n_docs,
         |  round(CAST(sum(w) AS DOUBLE) / count(*), 2) AS avg_words,
         |  round(CAST(sum(CAST(flesch AS DECIMAL(20,6))) AS DOUBLE) / count(*), 6)
         |    AS avg_flesch
         |FROM sc GROUP BY source ORDER BY source""".stripMargin)))
}
