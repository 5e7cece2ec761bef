package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print `explain("formatted")` for the named queries (or all
  * with no args) against a small sf dir — the loop for checking that
  * filters push to the scan, small sides broadcast, and aggregates keep
  * their partial (map-side) phase before the shuffle.
  *
  * Usage: sbt "runMain graft.Explain q65_decontaminate q67_kmv_distinct"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
