package graft

import graft.vector.{CosineFusion, CosineSim, VectorOps}
import org.apache.spark.sql.functions._

/** CosineFusion rule: the declarative HOF cosine is rewritten to the
  * fused codegen CosineSim with bit-identical results, and non-matching
  * aggregate shapes are left alone. The rule is injected into the shared
  * session's experimental optimizations (same effect as the
  * GraftExtensions `injectOptimizerRule` wiring, which needs session
  * construction we can't redo mid-JVM).
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  spark.experimental.extraOptimizations =
    (spark.experimental.extraOptimizations :+ CosineFusion).distinct

  // spark.range-backed (a local Seq would be constant-folded into a
  // LocalRelation before user-provided rules run, hiding the pattern)
  private def vecs = spark.range(1, 50)
    .select(
      array(col("id").cast("double"), (col("id") * 7 % 13).cast("double"),
        (col("id") * -3 + 2).cast("double")).as("a"),
      array((col("id") % 5 + 1).cast("double"), lit(2.5),
        (col("id") * 11 % 17).cast("double")).as("b"))

  test("HOF cosine pattern is rewritten to CosineSim in the optimized plan") {
    val df = vecs.select(VectorOps.cosineHof(col("a"), col("b")).as("c"))
    val optimized = df.queryExecution.optimizedPlan
    val fused = optimized.expressions.exists(_.exists(_.isInstanceOf[CosineSim]))
    assert(fused, s"expected CosineSim in:\n$optimized")
  }

  test("rewritten plan returns bit-identical values to the native expression") {
    val hof = vecs.select(VectorOps.cosineHof(col("a"), col("b"))).collect().map(_.getDouble(0))
    val native = vecs.select(VectorOps.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    hof.zip(native).foreach { case (h, n) =>
      assert(java.lang.Double.doubleToLongBits(h) == java.lang.Double.doubleToLongBits(n))
    }
  }

  test("ragged input stays null through the rewrite") {
    val ragged = spark.range(1)
      .select(array(lit(1.0), lit(2.0)).as("a"),
        array(lit(1.0), lit(2.0), lit(3.0)).as("b"))
    val out = ragged.select(VectorOps.cosineHof(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("q25/q26 rerank on the native CosineSim path, not an interpreted UDF") {
    for (q <- Seq("q25_ann_topk", "q26_ivf_topk")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan
      val exprs = plan.collect { case p => p.expressions }.flatten
      assert(exprs.exists(_.exists(_.isInstanceOf[CosineSim])),
        s"$q: no CosineSim in optimized plan")
      assert(!exprs.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])),
        s"$q: interpreted ScalaUDF in the rerank path")
      spark.catalog.clearCache()
    }
  }

  test("plain HOF dot (no norm divide) is NOT rewritten") {
    val df = vecs.select(VectorOps.dot(col("a"), col("b")).as("d"))
    val untouched = !df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[CosineSim]))
    assert(untouched)
    // and a different zero literal breaks the pattern too
    val offZero = vecs.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0),
        (acc, v) => acc + v) /
        (sqrt(VectorOps.dot(col("a"), col("a"))) *
          sqrt(VectorOps.dot(col("b"), col("b"))))).as("c"))
    assert(!offZero.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[CosineSim])))
  }
}
