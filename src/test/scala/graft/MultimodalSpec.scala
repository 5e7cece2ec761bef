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
}
