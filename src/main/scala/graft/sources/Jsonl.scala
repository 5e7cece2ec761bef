package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Gzipped-JSONL source/sink — the reference's interchange format
  * (embed.py:54-62 reads reviews/meta, embed.py:84-86 writes the
  * embedding table as one JSON object per line, gzip-compressed).
  * Spark's JSON source decodes .gz transparently and splits work at
  * file granularity; at cluster scale prefer many moderate files over
  * one giant gz (gzip is not splittable).
  */
object Jsonl {

  /** One JSON object per line, gzip-compressed (embed.py:84-86). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** Schema-explicit scan — never infer on the hot path: inference costs
    * an extra full pass and silently widens types.
    */
  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)
}
