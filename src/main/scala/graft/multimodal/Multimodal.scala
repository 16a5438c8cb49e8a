package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition so per-executor
  * resources (decoders, models) initialize once per partition — the
  * Scala analog of `mapInPandas` batch processing.
  *
  * The actual media decoding is STUBBED (this container has no
  * image/audio libraries): [[MediaDecoder.Stub]] produces
  * deterministic fake dimensions/frames from the bytes. The Spark
  * plumbing — schema, binary transport, partition-wise batch shape,
  * UDF signatures — is real and tested, and a real decoder drops in
  * behind the same trait.
  */
final case class MediaRow(
    media_id: Long,
    media_type: String, // image | audio | video
    content: Array[Byte],
    mimetype: String,
    meta: Map[String, String])

final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    embedding: Array[Float])

/** Decode boundary. A production implementation wraps an image/audio
  * codec; the stub derives deterministic pseudo-metadata. */
trait MediaDecoder extends Serializable {
  def decodeDims(content: Array[Byte]): (Int, Int)
  def embed(content: Array[Byte]): Array[Float]
}

object MediaDecoder {
  /** Deterministic fake: dims from byte stats, embedding =
    * [size, first byte, last byte] — chosen so an external oracle can
    * reproduce the values exactly. */
  object Stub extends MediaDecoder {
    def decodeDims(content: Array[Byte]): (Int, Int) =
      (content.length % 1024, (content.headOption.getOrElse(0: Byte) & 0xff) + 1)
    def embed(content: Array[Byte]): Array[Float] = Array(
      content.length.toFloat,
      (content.headOption.getOrElse(0: Byte) & 0xff).toFloat,
      (content.lastOption.getOrElse(0: Byte) & 0xff).toFloat)
  }
}

object Multimodal {

  implicit val mediaRowEncoder: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeatEncoder: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Batch ingest shape: binary files -> MediaRow table. With a real
    * corpus this is `spark.read.format("binaryFile")`; the driver
    * testdata has no media, so callers synthesize content columns. */
  def fromBinaryColumns(df: DataFrame, idCol: String, contentCol: String,
      mediaType: String, mimetype: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(mediaType).as("media_type"),
        col(contentCol).cast("binary").as("content"),
        lit(mimetype).as("mimetype"),
        map().cast("map<string,string>").as("meta"))
      .as[MediaRow]
  }

  /** Partition-wise featurization: the decoder initializes once per
    * partition (the expensive-model pattern), rows stream through. */
  def featurize(media: Dataset[MediaRow], decoder: MediaDecoder = MediaDecoder.Stub): Dataset[MediaFeatures] = {
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder warm-up, model load)
      val d = decoder
      rows.map { m =>
        val (w, h) = d.decodeDims(m.content)
        MediaFeatures(m.media_id, m.media_type, m.content.length.toLong, w, h, d.embed(m.content))
      }
    }
  }

  /** Resize stub: records the target dims in metadata; a real
    * implementation transforms `content`. Plumbing (binary in/out,
    * metadata update) is real. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] =
    media.map(m => m.copy(meta = m.meta ++ Map(
      "resized_w" -> width.toString, "resized_h" -> height.toString)))

  /** Frame sampling stub for video: emits every k-th "frame" as a
    * byte slice — the exploded one-row-per-frame shape is the real
    * contract. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val frames = m.content.grouped(math.max(1, m.content.length / 8)).toSeq
      frames.zipWithIndex.collect {
        case (bytes, i) if i % everyK == 0 => (m.media_id, i, bytes)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
