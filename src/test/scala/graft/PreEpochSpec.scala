package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-1970 regression fixture for the hour/day-bucketed joins
  * (q39 / q158 / q223): round 8 switched their bucket arithmetic from
  * `div` truncation to floor division on reasoning alone — no test
  * exercised negative timestamps. This fixture stages an events table
  * straddling the epoch (including exact hour/day boundary timestamps,
  * the adversarial cells of the bucket algebra) and pins each bucketed
  * join's output against its UNBUCKETED formulation on the same rows —
  * the bucketing must be a pure physical optimization.
  */
class PreEpochSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  override def afterAll(): Unit = {
    if (fixtureBuilt != null) deleteRecursively(fixtureBuilt)
    super.afterAll()
  }

  private var fixtureBuilt: java.nio.file.Path = null

  /** Events from 1969-12-30 to 1970-01-02: per user, a deterministic
    * spread of views/clicks/purchases at offsets chosen to hit exact
    * hour and day boundaries, ±1 µs off boundaries, and plain interior
    * points on both sides of the epoch.
    */
  private lazy val fixtureDir: String = {
    val HourUs = 3600L * 1000000L
    val DayUs = 86400L * 1000000L
    val offsets: Seq[Long] = Seq(
      -2L * DayUs, -2L * DayUs + 1L, -DayUs - 1L, -DayUs, -DayUs + HourUs,
      -25L * HourUs, -24L * HourUs, -23L * HourUs + 7L,
      -2L * HourUs, -HourUs - 1L, -HourUs, -HourUs + 1L,
      -30L * 60L * 1000000L, -1L, 0L, 1L,
      30L * 60L * 1000000L, HourUs - 1L, HourUs, HourUs + 1L,
      2L * HourUs + 11L, 23L * HourUs, DayUs - 1L, DayUs, DayUs + HourUs + 3L)
    val types = Seq("view", "purchase", "click")
    val rows = for {
      u <- 1L to 4L
      (off, i) <- offsets.zipWithIndex
    } yield (u * 1000L + i, off + u * 60L * 1000000L, u,
      types(((i + u).toInt) % 3), (i + u).toDouble / 7.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-preepoch")
    fixtureBuilt = dir
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"),
        expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')")
          .as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit(null).cast("string").as("props"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  /** Batch events with canonical bigint-nanos ts (negative pre-epoch). */
  private def ev: DataFrame = graft.sources.Tables.events(spark, fixtureDir)

  test("fixture actually spans the epoch") {
    val r = ev.agg(min("ts"), max("ts")).head()
    assert(r.getLong(0) < 0L && r.getLong(1) > 0L)
  }

  private val HourNs = 3600L * 1000000000L
  private val HourUsL = 3600000000L

  private def views: DataFrame = ev.filter(col("event_type") === "view")
    .select(col("user_id"), col("event_id").as("view_id"),
      expr("ts div 1000").as("vus"))
  private def purchases: DataFrame = ev.filter(col("event_type") === "purchase")
    .select(col("user_id").as("p_user"), col("event_id").as("purch_id"),
      expr("ts div 1000").as("pus"))

  /** The plain (unbucketed) attribution range join — ground truth. */
  private def plainPairs(joinType: String): Seq[(Long, Long, Long, Long)] =
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("pus") >= col("vus") && col("pus") <= col("vus") + HourUsL,
        joinType)
      .select(col("user_id"), col("view_id"),
        coalesce(col("purch_id"), lit(-1L)).as("purch_id"),
        coalesce(expr("(pus - vus) div 1000000"), lit(-1L)).as("gap_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("q39's hour-bucket algebra (batch twin) is exact on pre-epoch timestamps") {
    // the round-8 floor-division fix, pinned: the same bucket
    // expressions and (b, b+1) view replication q39 streams with, run
    // as a BATCH join on an epoch-straddling fixture, must equal the
    // plain range join — bucketing is a pure physical optimization
    val vB = views.withColumn("bkt", explode(array(
      expr(s"(vus - pmod(vus, $HourUsL)) div $HourUsL"),
      expr(s"(vus - pmod(vus, $HourUsL)) div $HourUsL") + 1L)))
    val pB = purchases.withColumn("bkt",
      expr(s"(pus - pmod(pus, $HourUsL)) div $HourUsL"))
    val got = vB.join(pB,
        col("user_id") === col("p_user") && vB("bkt") === pB("bkt") &&
          col("pus") >= col("vus") && col("pus") <= col("vus") + HourUsL)
      .select(col("user_id"), col("view_id"), col("purch_id"),
        expr("(pus - vus) div 1000000").as("gap_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val expected = plainPairs("inner")
    assert(expected.nonEmpty, "fixture produced no qualifying pairs")
    assert(expected.exists(_._4 > 0), "fixture needs non-trivial gaps")
    assert(got == expected,
      s"missing=${(expected.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("q158's outer (b, b-1) bucket algebra (batch twin) is exact pre-epoch") {
    // outer variant: preserved side single-bucketed, non-preserved side
    // replicated into (b, b-1) — each view must emit exactly once
    val vB = views.withColumn("bkt",
      expr(s"(vus - pmod(vus, $HourUsL)) div $HourUsL"))
    val pB = purchases.withColumn("bkt", explode(array(
      expr(s"(pus - pmod(pus, $HourUsL)) div $HourUsL"),
      expr(s"(pus - pmod(pus, $HourUsL)) div $HourUsL") - 1L)))
    val got = vB.join(pB,
        col("user_id") === col("p_user") && vB("bkt") === pB("bkt") &&
          col("pus") >= col("vus") && col("pus") <= col("vus") + HourUsL,
        "left_outer")
      .select(col("user_id"), col("view_id"),
        coalesce(col("purch_id"), lit(-1L)).as("purch_id"),
        coalesce(expr("(pus - vus) div 1000000"), lit(-1L)).as("gap_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val expected = plainPairs("left_outer")
    assert(expected.exists(_._3 == -1L), "fixture needs unmatched views")
    assert(expected.exists(_._3 != -1L), "fixture needs matched views")
    assert(got == expected,
      s"missing=${(expected.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("streaming watermark floor: pre-epoch rows are dropped by the ENGINE") {
    // Document-and-pin, not a graft defect: Spark initializes the
    // event-time watermark to 0 ms = 1970-01-01, so every pre-epoch row
    // is behind the watermark in its very first micro-batch and
    // stateful operators drop it as late — streaming q39 on this
    // fixture emits exactly the post-epoch subset of the batch result.
    // A corpus with pre-1970 event time must shift its epoch before
    // entering a watermarked stream (the batch twins above are exact).
    val got = SparkEntry.queries("q39_stream_stream_join")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val postEpochIds = ev.filter(col("ts") >= 0L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val expected = plainPairs("inner")
      .filter(p => postEpochIds.contains(p._2) && postEpochIds.contains(p._3))
    assert(got == expected,
      s"missing=${(expected.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- expected.toSet).take(3)}")
    assert(got.size < plainPairs("inner").size,
      "fixture must actually exercise the watermark floor")
  }

  test("pre-epoch guard (warn, default): observed metric counts the at-risk rows") {
    // the round-10 guard: a watermarked stream fed pre-1970 rows must
    // surface the loss — in warn mode as a per-batch observed metric
    // (graft_pre_epoch / pre_epoch_rows) summing to the exact count
    import graft.streaming.EventsStream
    val preEpochRows = ev.filter(col("ts") < 0L).count()
    assert(preEpochRows > 0L, "fixture must carry pre-epoch rows")
    val staged = EventsStream.stageWithSentinel(spark, s"$fixtureDir/events.parquet")
    val q = EventsStream.sessionize(EventsStream.source(spark, staged))
      .writeStream.outputMode("append").format("memory")
      .queryName("t_preepoch_warn").start()
    q.processAllAvailable()
    val observed = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get(EventsStream.PreEpochMetric)))
      .map(_.getAs[Long]("pre_epoch_rows")).sum
    q.stop()
    assert(observed == preEpochRows,
      s"guard observed $observed, fixture has $preEpochRows pre-epoch rows")
  }

  test("pre-epoch guard (fail): the query aborts loudly instead of dropping rows") {
    import graft.streaming.EventsStream
    val staged = EventsStream.stageWithSentinel(spark, s"$fixtureDir/events.parquet")
    spark.conf.set("spark.graft.preEpochGuard", "fail")
    try {
      val q = EventsStream.sessionize(EventsStream.source(spark, staged))
        .writeStream.outputMode("append").format("memory")
        .queryName("t_preepoch_fail").start()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      q.stop()
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("GRAFT_PRE_EPOCH")),
        s"expected the guard's marker in: ${messages(ex).mkString(" | ")}")
    } finally spark.conf.unset("spark.graft.preEpochGuard")
  }

  test("q223 day-bucketed attribution pairing is exact on pre-epoch timestamps") {
    // pin the REGISTERED (day-bucketed) query against the same
    // aggregation over a plain unbucketed user_id pairing
    val got = SparkEntry.queries("q223_attribution")(spark, fixtureDir)
      .collect().map(r => r.toSeq).toSeq
    val dayUs = 86400000000L
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("pts"),
        col("event_id").as("pid"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), expr("ts div 1000").as("tts"),
        col("event_type").as("channel"))
    val paired = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") <= col("pts") && col("tts") > col("pts") - dayUs)
      .select(col("pid"), col("channel"),
        round(pow(lit(2.0),
          -((col("pts") - col("tts")).cast("double") / lit(2.16e10))), 9)
          .as("w"))
    import org.apache.spark.sql.types.DecimalType
    val perPid = paired.groupBy("pid")
      .agg(count(lit(1)).as("k"),
        sum(col("w").cast(DecimalType(20, 12))).as("tw"))
    val perChan = paired.groupBy("pid", "channel")
      .agg(count(lit(1)).as("ck"),
        sum(col("w").cast(DecimalType(20, 12))).as("cw"))
    val attributed = perChan.join(perPid, Seq("pid"))
      .select(col("channel"),
        round(col("ck").cast("double") / col("k"), 9).as("lc"),
        round(col("cw").cast("double") / col("tw").cast("double"), 9).as("dc"),
        col("ck"))
      .groupBy("channel")
      .agg(sum(col("ck")).as("n_touches"),
        round(sum(col("lc").cast(DecimalType(20, 12))).cast("double"), 6)
          .as("linear_credit"),
        round(sum(col("dc").cast(DecimalType(20, 12))).cast("double"), 6)
          .as("decay_credit"))
    val direct = purchases.join(paired.select("pid").distinct(),
        Seq("pid"), "left_anti")
      .agg(count(lit(1)).as("nd"))
      .select(lit("direct").as("channel"), lit(0L).as("n_touches"),
        col("nd").cast("double").as("linear_credit"),
        col("nd").cast("double").as("decay_credit"))
    val expected = attributed.unionByName(direct).orderBy("channel")
      .collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty, "fixture produced no attribution rows")
    assert(got == expected, s"got=$got\nexpected=$expected")
  }
}
