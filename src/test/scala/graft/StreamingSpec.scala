package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Structured Streaming over the events table: the streaming aggregate
  * must agree with its batch twin on the same files.
  */
class StreamingSpec extends SparkSpec {

  /** Batch lag/cumsum sessionization twin: (user_id, session_start,
    * n_events) triples over the sf0.001 events file.
    */
  private def batchSessionSet: Set[(Long, Long, Long)] = {
    val NanosPerSec = 1000000000L
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > lit(1800L * NanosPerSec), 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(expr("min(ts) DIV 1000000000").as("session_start"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("sentinel-flushed sessionization equals batch sessionization exactly") {
    val staged = EventsStream.stageWithSentinel(
      spark, "/root/testdata/sf0.001/events.parquet")
    val q = EventsStream.sessionize(EventsStream.source(spark, staged))
      .writeStream.outputMode("append").format("memory")
      .queryName("t_sessions_full").start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("t_sessions_full").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("n_events"))).toSet
    val batch = batchSessionSet
    assert(emitted == batch,
      s"stream-batch= ${(emitted -- batch).take(3)} batch-stream= ${(batch -- emitted).take(3)}")
  }

  test("flatMapGroupsWithState sessionization emits valid closed sessions") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("events-sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val q = graft.streaming.EventsStream
      .sessionize(graft.streaming.EventsStream.source(spark, dir), gapSec = 1800)
      .writeStream.outputMode("append").format("memory")
      .queryName("t_sessions").start()
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("t_sessions").collect()
    assert(sessions.nonEmpty)
    assert(sessions.forall { r =>
      r.getAs[Long]("n_events") >= 1 && r.getAs[Long]("duration_sec") >= 0
    })

    // every emitted session must equal a batch-derived session
    // (lag-gap cumulative-sum sessionization over the same file)
    val batchSet = batchSessionSet
    val emitted = sessions
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("n_events")))
    assert(emitted.forall(batchSet.contains),
      s"emitted not subset: ${emitted.filterNot(batchSet.contains).take(3).mkString(",")}")
  }

  test("sessionization under the RocksDB state store matches the default provider") {
    // the 100 TB state backend (spark.graft.stateStore=rocksdb): same
    // stateful query, same sentinel staging, state held in RocksDB
    // instead of the executor-heap default — output must be identical.
    val staged = EventsStream.stageWithSentinel(
      spark, "/root/testdata/sf0.001/events.parquet")
    val ckpt = Files.createTempDirectory("graft-rocksdb-ckpt")
    spark.conf.set("spark.graft.stateStore", "rocksdb")
    try {
      EventsStream.withStreamShufflePartitions(spark) {
        // the seam must actually pin the provider at start
        assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
          .contains("RocksDBStateStoreProvider"))
        val q = EventsStream.sessionize(EventsStream.source(spark, staged))
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation", ckpt.toString)
          .queryName("t_sessions_rocksdb").start()
        q.processAllAvailable()
        q.stop()
      }
      // conf restored after the wrapper: back to the HDFS default
      // (the key always resolves — SQLConf supplies the default value)
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("HDFSBackedStateStoreProvider"))
      // ...and restored to truly-UNSET, not pinned to the resolved
      // default: conf.getAll carries only explicitly-set entries, so a
      // dead restore branch (the round-9 advice item) would show up here
      assert(!spark.conf.getAll.contains(
        "spark.sql.streaming.stateStore.providerClass"),
        "wrapper left the provider key explicitly pinned after restore")
      val emitted = spark.table("t_sessions_rocksdb").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("n_events"))).toSet
      assert(emitted == batchSessionSet)
      // structural proof RocksDB ran: its state checkpoint uploads
      // versioned snapshot/changelog artifacts the default provider
      // never writes (the default writes bare <version>.delta files)
      import scala.jdk.CollectionConverters._
      val stateFiles = Files.walk(ckpt.resolve("state")).iterator().asScala
        .map(_.getFileName.toString).toSet
      assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
        s"no RocksDB snapshot/changelog artifacts under $ckpt: $stateFiles")
    } finally {
      spark.conf.unset("spark.graft.stateStore")
      deleteRecursively(ckpt)
    }
  }

  test("sessionization survives a mid-stream kill + restart from checkpoint") {
    // The 100 TB operational property: a stateful query killed between
    // micro-batches and restarted from its checkpoint must produce
    // EXACTLY the batch result — no lost sessions (state + source
    // offsets recover) and no duplicates (the parquet sink's metadata
    // log commits files atomically per batch; readers see only
    // committed files). Memory sinks can't test this (they reset on
    // restart), so this is the one parquet-sink streaming spec.
    // four sentinel batches (identical far-future rows — each joins the
    // same open sentinel session, emitting nothing new) give the
    // restart leg guaranteed remaining work: the kill lands right after
    // the FIRST committed batch, a graceful stop can finish at most the
    // one batch already in flight, and three more staged files remain
    val staged = EventsStream.stageWithSentinel(
      spark, "/root/testdata/sf0.001/events.parquet", sentinelBatches = 4)
    val ckpt = Files.createTempDirectory("graft-restart-ckpt")
    val out = Files.createTempDirectory("graft-restart-out")
    try {
      def start() = EventsStream.withStreamShufflePartitions(spark) {
        EventsStream.sessionize(EventsStream.source(spark, staged))
          .writeStream.outputMode("append").format("parquet")
          .option("checkpointLocation", ckpt.toString)
          .option("path", out.toString)
          .start()
      }
      // total staged source files = total micro-batches (maxFilesPerTrigger=1)
      val totalBatches = {
        import scala.jdk.CollectionConverters._
        Files.list(Paths.get(staged)).iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet"))
      }
      // run until at least one micro-batch commits, then kill
      val q1 = start()
      val deadline = System.currentTimeMillis() + 60000
      while (q1.recentProgress.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(q1.recentProgress.nonEmpty, "first run never committed a batch")
      q1.stop()
      // Between the nonEmpty observation and stop() landing, a fast
      // machine can drain every remaining maxFilesPerTrigger=1 batch —
      // then run 2 legitimately has nothing to process. Record whether
      // work remained so the restart-progress assert below doesn't
      // flake; the exactly-once equality assert runs either way.
      val run1Committed = q1.lastProgress.batchId + 1
      val run1Drained = run1Committed >= totalBatches
      // restart from the same checkpoint; drain the rest
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      if (!run1Drained)
        assert(q2.recentProgress.nonEmpty, "restart processed nothing despite " +
          s"run 1 committing only $run1Committed of $totalBatches batches")
      val emitted = spark.read.parquet(out.toString)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("session_start"), r.getAs[Long]("n_events"))).toSet
      assert(emitted == batchSessionSet,
        s"stream-batch= ${(emitted -- batchSessionSet).take(3)} " +
          s"batch-stream= ${(batchSessionSet -- emitted).take(3)}")
    } finally {
      deleteRecursively(ckpt)
      deleteRecursively(out)
    }
  }

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
