package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * All tables are parquet; Catalyst pushes filters/column pruning into the
  * scan, so callers should select/filter as early as possible and let the
  * optimizer do the rest. At cluster scale these would be partitioned/bucketed
  * tables — the loader is the single seam where that changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP_NTZ(MICROS); surface it as
    * bigint nanoseconds (exact ×1000, no doubles, no timezone involved —
    * timestampdiff on NTZ is pure wall-clock arithmetic) so all downstream
    * time bucketing stays exact integer arithmetic and agrees bit-for-bit
    * with the DuckDB oracle, which reads the same column as naive TIMESTAMP
    * and treats it as UTC. */
  val TsToNanos = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr(TsToNanos))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
