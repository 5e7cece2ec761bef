package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with batched decode/feature-extraction over partitions.
  *
  * The decode step itself is a STUB (this container has no image/audio
  * codecs): `FakeDecoder` derives deterministic "features" from the raw
  * bytes. Everything around it is the real production shape — binary
  * column + metadata schema, partition-wise batched iteration (the
  * Scala analog of `mapInPandas` batch inference), explicit feature
  * schema on the way out, and a downstream plan that joins features back
  * to relational metadata. Swapping `FakeDecoder` for a JNI/model decoder
  * changes no plumbing.
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      id: Long, kind: String, n_bytes: Int, brightness: Double)

  /** Decoder seam: bytes → fixed-width features. */
  trait Decoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): MediaFeatures2
  }
  final case class MediaFeatures2(nBytes: Int, brightness: Double)

  /** Deterministic stand-in: "brightness" = mean unsigned byte value.
    * For ASCII payloads this equals the mean codepoint, so the DuckDB
    * oracle can mirror it without any codec.
    */
  object FakeDecoder extends Decoder {
    def decode(kind: String, payload: Array[Byte]): MediaFeatures2 = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
      MediaFeatures2(payload.length, mean)
    }
  }

  /** Synthesize a media table from `documents` (text bytes as payload,
    * kind cycling image/audio/video) — deterministic and SQL-mirrorable.
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  final case class FrameFeatures(
      id: Long, frame_idx: Long, n_bytes: Long, brightness: Double)

  /** Frame sampling: slice each payload into `frameLen`-byte frames at
    * `stride`-byte intervals (stride > frameLen skips bytes — temporal
    * subsampling) and emit per-frame features. Narrow flatMap over the
    * scan with fan-out bounded by payload/stride; the video-pipeline
    * shape where a decoder replaces the byte-window feature.
    */
  def sampleFrames(media: DataFrame, frameLen: Int = 32,
                   stride: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      val n = row.payload.length
      (0 until n by stride).zipWithIndex.map { case (start, idx) =>
        val end = math.min(start + frameLen, n)
        var sum = 0L
        var i = start
        while (i < end) { sum += row.payload(i) & 0xff; i += 1 }
        FrameFeatures(row.id, idx.toLong, (end - start).toLong,
          sum.toDouble / (end - start))
      }
    }.toDF()
  }

  final case class ResizedMedia(
      id: Long, in_w: Long, in_h: Long, out_w: Long, out_h: Long,
      resized: String)

  /** Nearest-neighbor resize: interpret the payload as a row-major
    * `width`-byte grid (trailing partial row dropped) and keep every
    * `factor`-th byte in each dimension. The image-resize plumbing with
    * a byte grid standing in for pixels — swapping in a real raster
    * decoder changes the kernel, not the dataflow. Narrow map, output
    * size = input/factor², no shuffle.
    */
  def resizeGrid(media: DataFrame, width: Int = 16,
                 factor: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].map { row =>
      val h = row.payload.length / width
      val sb = new StringBuilder
      var i = 0
      while (i < h) {
        var j = 0
        while (j < width) {
          sb.append((row.payload(i * width + j) & 0xff).toChar)
          j += factor
        }
        i += factor
      }
      ResizedMedia(row.id, width.toLong, h.toLong,
        ((width + factor - 1) / factor).toLong,
        ((h + factor - 1) / factor).toLong, sb.toString)
    }.toDF()
  }

  final case class AudioWindow(
      id: Long, win_idx: Long, n_bytes: Long, sum_sq: Long)

  /** Audio energy windows: slice the payload into non-overlapping
    * `windowLen`-byte windows and emit the exact integer sum of squared
    * deviations from the 128 midpoint per window — the RMS-energy /
    * silence-detection front end of an audio pipeline, with the byte
    * stream standing in for PCM samples (a real codec replaces the
    * deviation kernel, not the dataflow). Narrow flatMap; the RMS
    * itself is computed downstream from the exact integers so both
    * engines take the same sqrt.
    */
  def audioWindows(media: DataFrame, windowLen: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      val n = row.payload.length
      (0 until n by windowLen).zipWithIndex.map { case (start, idx) =>
        val end = math.min(start + windowLen, n)
        var ss = 0L
        var i = start
        while (i < end) {
          val d = (row.payload(i) & 0xff) - 128
          ss += d.toLong * d
          i += 1
        }
        AudioWindow(row.id, idx.toLong, (end - start).toLong, ss)
      }
    }.toDF()
  }

  /** Batched partition-wise decode: groups rows into `batchSize` chunks
    * (the shape a vectorized/model decoder wants), decodes, emits typed
    * features. No shuffle — narrow transformation over the scan.
    */
  def decodeFeatures(media: DataFrame, decoder: Decoder = FakeDecoder,
                     batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.as[MediaRow]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val f = decoder.decode(row.kind, row.payload)
          MediaFeatures(row.id, row.kind, f.nBytes, f.brightness)
        }
      }
    }.toDF()
  }
}
