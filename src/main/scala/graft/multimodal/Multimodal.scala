package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, flowing through typed Dataset partitions.
  *
  * The actual media codecs are NOT in this container, so [[StubDecoder]] is
  * a clearly-marked deterministic fake (a pure function of the bytes); the
  * Spark-side plumbing — binary schema, partition-wise batch decode via
  * mapPartitions, typed output schema — is real and tested. Swapping in a
  * real decoder changes one function.
  *
  * Scale notes: decode runs per-partition (one decoder instance per task,
  * amortized over the batch), never per-row-lambda-per-field; binary columns
  * are never shuffled post-decode (features only).
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      frames: Int,
      decoded_mean: Double)

  /** Media decoder interface: bytes -> (width, height, frames, mean). */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Double)
  }

  /** STUB: deterministic fake decoder — a pure function of the byte
    * content standing in for the absent image/audio libs. width/height/
    * frames are derived from the length; decoded_mean is the mean of the
    * first 16 bytes (so correctness of the plumbing is still checkable
    * end-to-end against an independent engine).
    */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val n = bytes.length
      val head = bytes.take(16)
      val mean = if (head.isEmpty) 0.0
        else head.map(b => (b & 0xff).toDouble).sum / head.length
      ((n % 640) + 1, (n * 7 % 480) + 1, (n % 30) + 1, mean)
    }
  }

  /** Attach a binary media column (UTF-8 bytes of text stand in for real
    * blobs) + a media_type derived from the id.
    */
  def attachBinary(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(
      col(id), col(text),
      encode(col(text), "UTF-8").as("content"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(id), lit(3)) + 1).cast("int")).as("media_type"))

  /** Partition-wise decode: binary rows -> typed feature rows. */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder,
      id: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // one decoder per partition — amortized setup, batch-shaped access
        val d = decoder
        it.map { case (docId, mt, bytes) =>
          val (w, h, f, mean) = d.decode(mt, bytes)
          MediaFeatures(docId, mt, bytes.length.toLong, w, h, f, mean)
        }
      }
  }
}
