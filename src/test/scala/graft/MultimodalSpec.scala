package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary columns, batched decode, feature schema. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fake decoder: brightness = mean unsigned byte") {
    val media = Seq((1L, "image", "abc".getBytes("UTF-8")))
      .toDF("id", "kind", "payload")
    val row = Multimodal.decodeFeatures(media).head()
    assert(row.getAs[Int]("n_bytes") == 3)
    assert(math.abs(row.getAs[Double]("brightness") - 294.0 / 3) < 1e-12)
  }

  test("kind cycling and payload round-trip from documents") {
    val docs = Seq((0L, "x"), (1L, "yy"), (2L, "zzz"), (3L, "w"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val media = Multimodal.mediaFromDocuments(docs)
    val kinds = media.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(kinds == Seq("image", "audio", "video", "image"))
    val feats = Multimodal.decodeFeatures(media, batchSize = 2)
    assert(feats.count() == 4)
    assert(feats.filter(col("id") === 2).head().getAs[Int]("n_bytes") == 3)
  }

  test("sampleFrames: stride skips bytes, last frame truncates") {
    // 100-byte payload, frameLen 32, stride 64 → frames at 0 (32 bytes)
    // and 64 (32 bytes); a 70-byte payload's second frame truncates to 6.
    val media = Seq(
      (1L, "video", Array.fill[Byte](100)('a'.toByte)),
      (2L, "video", Array.fill[Byte](70)('b'.toByte)))
      .toDF("id", "kind", "payload")
    val out = Multimodal.sampleFrames(media, frameLen = 32, stride = 64)
      .orderBy("id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 32L, 'a'.toDouble), (1L, 1L, 32L, 'a'.toDouble),
      (2L, 0L, 32L, 'b'.toDouble), (2L, 1L, 6L, 'b'.toDouble)))
  }

  test("audioWindows: exact squared-deviation sums, truncated tail window") {
    // 'a' = 97 → dev -31 → 961/byte; 300-byte payload at windowLen 256
    // gives a full window (256·961) and a 44-byte tail (44·961).
    val media = Seq((1L, "audio", Array.fill[Byte](300)('a'.toByte)))
      .toDF("id", "kind", "payload")
    val out = Multimodal.audioWindows(media, windowLen = 256)
      .orderBy("win_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 256L, 256L * 961), (1L, 44L, 44L * 961)))
  }
}
