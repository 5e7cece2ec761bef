package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain("formatted")` for the named queries
  * (or a representative default set) against a given sf directory —
  * the tool used to keep scans pruned (PushedFilters/ReadSchema),
  * joins broadcast where a side is small, and hot expressions inside
  * WholeStageCodegen. Usage:
  *   sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_revenue_by_nation",
        "q03_top_orders_per_customer", "q15_exact_dedup", "q20_cosine_topk",
        "q30_events_hourly", "q40_recommend_top10", "q57_tfidf",
        "q58_salted_skew_join")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
