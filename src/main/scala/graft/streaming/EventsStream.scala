package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table: the streaming
  * twin of EventQueries.q30 — watermarked tumbling-window aggregation.
  *
  * The parquet files carry TIMESTAMP(NANOS) (read as bigint nanos via
  * `spark.sql.legacy.parquet.nanosAsLong`); the stream converts to a
  * proper timestamp for event-time semantics. At scale this is the
  * standard file-source → watermark → window → sink pipeline; swap the
  * source for Kafka and the sink for a Delta/parquet append without
  * touching the aggregation.
  */
object EventsStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** readStream over a directory of events parquet. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("event_ts", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Watermarked tumbling-window counts/sums per event_type. */
  def hourlyAgg(events: DataFrame, watermark: String = "1 hour",
                window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("value_sum"))

  /** Run the stream to completion against a static directory via the
    * memory sink (local smoke path); returns the materialized result.
    */
  def runOnce(spark: SparkSession, dir: String,
              queryName: String = "events_hourly"): DataFrame = {
    val q = hourlyAgg(source(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
