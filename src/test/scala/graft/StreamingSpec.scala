package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured Streaming over the events table: the streaming aggregate
  * must agree with its batch twin on the same files.
  */
class StreamingSpec extends SparkSpec {

  test("watermarked hourly window agg matches batch totals") {
    val dir = Files.createTempDirectory("events-stream").toString
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val result = EventsStream.runOnce(spark, dir, queryName = "t_events_hourly")
    val streamTotal = result.agg(sum("n")).head().getLong(0)

    val batch = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    assert(streamTotal == batch.count())

    // spot-check one (hour, type) bucket against the batch computation
    val NanosPerHour = 3600L * 1000000000L
    val batchBuckets = batch
      .withColumn("hour_epoch",
        ((col("ts") - pmod(col("ts"), lit(NanosPerHour))) / NanosPerHour).cast("long") * 3600)
      .groupBy("hour_epoch", "event_type").count()
    val b = batchBuckets.orderBy("hour_epoch", "event_type").head()
    val fromStream = result
      .filter(col("hour_epoch") === b.getLong(0) && col("event_type") === b.getString(1))
      .head().getAs[Long]("n")
    assert(fromStream == b.getLong(2))
  }
}
