package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** TEST HELPER ONLY (round 13): the deterministic fake decode that used
  * to live in [[graft.operators.Multimodal]] before every registered
  * multimodal path got a REAL codec. Kept here because its md5/length
  * arithmetic makes cheap, fully-predictable fixtures for specs that
  * test PLUMBING (resize geometry, frame-sample arithmetic, media
  * routing) rather than codecs. Nothing in main source references it. */
object FakeMedia {

  /** One decoded media row — the fake-decode output contract. */
  final case class FakeDecoded(
      doc_id: Long, media_type: String, byte_len: Long, content_md5: String,
      width: Long, height: Long, n_frames: Long)

  private def hexVal(c: Char): Int = "0123456789abcdef".indexOf(c)

  /** The deterministic FAKE decode: features derived only from payload
    * length and MD5 so any engine can replicate them. */
  def fakeDecode(docId: Long, mediaType: String, payload: Array[Byte]): FakeDecoded = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val len = payload.length.toLong
    FakeDecoded(
      doc_id = docId,
      media_type = mediaType,
      byte_len = len,
      content_md5 = hex,
      width = 64L + 16L * hexVal(hex.charAt(0)),
      height = 64L + 16L * hexVal(hex.charAt(1)),
      n_frames = if (mediaType == "video") 1L + len % 240L else 1L)
  }

  /** Media table from `documents`: payload = UTF-8 bytes of the text,
    * media_type cycled by doc_id. */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Fake decode over the media frame (same typed mapPartitions shape
    * as the real decoders). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[FakeDecoded] = {
    import spark.implicits._
    media
      .repartition(spark.sparkContext.defaultParallelism,
        col("media_type"), pmod(xxhash64(col("doc_id")), lit(64)))
      .select(col("doc_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(batch =>
        batch.map { case (id, mt, bytes) => fakeDecode(id, mt, bytes) })
  }

  /** One resized media row: original + fitted dimensions. */
  final case class ResizedMedia(
      doc_id: Long, media_type: String, width: Long, height: Long,
      out_w: Long, out_h: Long)

  /** Box-fit GEOMETRY over fake-decoded dims (the real raster resize is
    * [[graft.operators.Multimodal.resizeImages]]). */
  def resizeFeatures(spark: SparkSession, decoded: Dataset[FakeDecoded],
                     target: Long): Dataset[ResizedMedia] = {
    import spark.implicits._
    decoded.mapPartitions { batch =>
      batch.map { d =>
        val m = math.max(d.width, d.height)
        ResizedMedia(d.doc_id, d.media_type, d.width, d.height,
          d.width * target / m, d.height * target / m)
      }
    }
  }

  /** Evenly-spaced frame indices over fake frame counts (the real path
    * is [[graft.operators.Multimodal.sampleVideoFrames]]). */
  def sampleFrames(spark: SparkSession, decoded: Dataset[FakeDecoded],
                   k: Int): Dataset[Multimodal.FrameRef] = {
    import spark.implicits._
    decoded.mapPartitions { batch =>
      batch.flatMap { d =>
        if (d.media_type != "video") Iterator.empty
        else {
          val idx = (0 until k).map(i => i.toLong * d.n_frames / k).distinct
          idx.iterator.map(Multimodal.FrameRef(d.doc_id, _, d.n_frames))
        }
      }
    }
  }
}
