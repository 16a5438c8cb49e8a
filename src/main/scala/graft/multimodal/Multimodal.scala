package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition so per-executor
  * resources (decoders, models) initialize once per partition — the
  * Scala analog of `mapInPandas` batch processing.
  *
  * All three modalities decode REAL formats with zero external libs:
  * images via [[MediaDecoder.JdkImageIO]] (the JDK's bundled
  * `javax.imageio` readers — PNG/JPEG/BMP/GIF), audio via
  * [[MediaDecoder.JdkWavPcm]] (`javax.sound.sampled` WAV/PCM), video
  * via [[MediaDecoder.JdkAviDib]] ([[VideoCodec]]'s RIFF/AVI chunk
  * walker over uncompressed DIB frames). [[MediaDecoder.Stub]]
  * remains as the documented seam for formats that need codec libs
  * (e.g. H.264): deterministic fake dimensions/frames from the
  * bytes. The Spark plumbing — schema, binary transport,
  * partition-wise batch shape, UDF signatures — is identical for all.
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

  /** Real audio decoder on the JDK's bundled `javax.sound.sampled`
    * WAV/PCM reader (no external libs). decodeDims = (sample rate,
    * frame count); `embed` is a 4-dim quarter-segment sample-sum
    * signature — integer sums over the four n/4 sample ranges, exact
    * and replayable by an external oracle. */
  object JdkWavPcm extends MediaDecoder {
    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val (fmt, samples) = AudioCodec.decodeWav(content)
      (fmt.getSampleRate.toInt, samples.length)
    }
    def embed(content: Array[Byte]): Array[Float] =
      AudioCodec.quarterSums(AudioCodec.decodeWav(content)._2).map(_.toFloat)
  }

  /** Real video decoder over [[VideoCodec]]'s RIFF/AVI + uncompressed
    * DIB frames (pure JDK — no codec libs). decodeDims = frame
    * (width, height); `embed` = 4-dim quadrant-gray sums accumulated
    * over ALL frames — integer, exact, oracle-replayable. */
  object JdkAviDib extends MediaDecoder {
    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val (w, h, _) = VideoCodec.decodeAvi(content)
      (w, h)
    }
    def embed(content: Array[Byte]): Array[Float] = {
      val (w, h, frames) = VideoCodec.decodeAvi(content)
      val (hw, hh) = (w / 2, h / 2)
      val sums = new Array[Long](4)
      for (px <- frames) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val q = (if (x >= hw) 1 else 0) + (if (y >= hh) 2 else 0)
            sums(q) += px(y * w + x) & 0xff // gray = blue channel (r=g=b)
            x += 1
          }
          y += 1
        }
      }
      sums.map(_.toFloat)
    }
  }

  /** Real decoder on the JDK's bundled image readers (PNG/JPEG/BMP/GIF
    * via `javax.imageio` — no external libs). `embed` is a 4-dim
    * quadrant-gray-sum signature: integer sums of the luminance plane
    * over the four (w/2, h/2) quadrants, exact and replayable. */
  object JdkImageIO extends MediaDecoder {
    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val img = ImageCodec.decode(content)
      (img.getWidth, img.getHeight)
    }
    def embed(content: Array[Byte]): Array[Float] = {
      val img = ImageCodec.decode(content)
      val (w, h) = (img.getWidth, img.getHeight)
      val (hw, hh) = (w / 2, h / 2)
      val sums = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val q = (if (x >= hw) 1 else 0) + (if (y >= hh) 2 else 0)
          sums(q) += ImageCodec.gray(img, x, y)
          x += 1
        }
        y += 1
      }
      sums.map(_.toFloat)
    }
  }
}

/** JDK-only pixel codec used by [[MediaDecoder.JdkImageIO]] and
  * [[Multimodal.resizePixels]]. All operations are bit-exact: PNG is
  * lossless, resize is manual nearest-neighbor (`src = dst * srcDim /
  * dstDim`, integer floor — no AWT rendering-hint ambiguity), gray is
  * the blue channel of the packed RGB (callers write r=g=b). */
object ImageCodec {
  import java.awt.image.BufferedImage

  // ImageIO defaults to a disk-backed stream cache: every read/write
  // on a raw Byte stream creates (and deletes) a temp FILE. At
  // corpus scale that is millions of file creates competing for the
  // tmp dir — measured super-linear on the x30 bench. The codec works
  // on small in-memory buffers; force the heap cache once per JVM.
  javax.imageio.ImageIO.setUseCache(false)

  def decode(content: Array[Byte]): BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, s"undecodable image bytes (${content.length} bytes)")
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def gray(img: BufferedImage, x: Int, y: Int): Int = img.getRGB(x, y) & 0xff

  /** Grayscale image from a pixel function; pixel (x,y) gets
    * r=g=b=f(x,y)&0xff. */
  def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = f(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  def resizeNearest(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = y * sh / h
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * sw / w, sy))
        x += 1
      }
      y += 1
    }
    out
  }
}

/** JDK-only WAV/PCM codec used by [[MediaDecoder.JdkWavPcm]]. 16-bit
  * signed little-endian mono PCM in a standard RIFF/WAVE container —
  * lossless, so synthesized integer waveforms decode back bit-exact
  * and an external oracle can replay every derived feature.
  *
  * The hot path writes and walks the RIFF container directly (like
  * [[VideoCodec]] does for AVI): `AudioSystem.getAudioInputStream` /
  * `AudioSystem.write` go through synchronized SPI provider discovery
  * on EVERY call, which serializes a 32-thread executor — measured 50 s
  * for 150k small clips at x30 vs ~3 s for the direct chunk walk. The
  * JDK decoder stays as [[decodeWavJdk]]/[[encodeWavJdk]], and a spec
  * asserts byte/sample parity both ways, so the container remains a
  * real WAV any javax.sound consumer opens. */
object AudioCodec {
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  private def u32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rdU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rdU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def cc(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  /** Canonical 44-byte-header RIFF/WAVE, fmt(PCM) + data chunks —
    * byte-identical to what `AudioSystem.write(..., Type.WAVE, ...)`
    * emits for the same samples (spec-asserted). */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put(o: Int, a: Array[Byte]): Unit = System.arraycopy(a, 0, out, o, a.length)
    put(0, "RIFF".getBytes("US-ASCII")); put(4, u32(36L + dataLen))
    put(8, "WAVE".getBytes("US-ASCII"))
    put(12, "fmt ".getBytes("US-ASCII")); put(16, u32(16))
    put(20, u16(1)) // PCM
    put(22, u16(1)) // mono
    put(24, u32(sampleRate.toLong))
    put(28, u32(sampleRate.toLong * 2)) // byte rate
    put(32, u16(2)) // block align
    put(34, u16(16)) // bits/sample
    put(36, "data".getBytes("US-ASCII")); put(40, u32(dataLen.toLong))
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode a WAV container to (format, 16-bit samples) by walking the
    * RIFF chunk list (tolerates extra chunks / extended fmt). Requires
    * 16-bit little-endian PCM (signed, mono or interleaved — samples
    * returned in frame order). */
  def decodeWav(content: Array[Byte]): (AudioFormat, Array[Short]) = {
    require(content.length >= 12 && cc(content, 0) == "RIFF" && cc(content, 8) == "WAVE",
      s"not a RIFF/WAVE container (${content.length} bytes)")
    var sampleRate = -1; var channels = 1; var bits = -1
    var dataOff = -1; var dataLen = -1
    var o = 12
    while (o + 8 <= content.length) {
      val id = cc(content, o)
      val len = rdU32(content, o + 4).toInt
      id match {
        case "fmt " =>
          val tag = rdU16(content, o + 8)
          require(tag == 1 || tag == 0xfffe, s"expected PCM fmt tag, got $tag")
          channels = rdU16(content, o + 10)
          sampleRate = rdU32(content, o + 12).toInt
          bits = rdU16(content, o + 22)
        case "data" => dataOff = o + 8; dataLen = len
        case _ => ()
      }
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(bits == 16, s"expected 16-bit PCM, got $bits-bit")
    require(dataOff >= 0, "no data chunk")
    val n = math.min(dataLen, content.length - dataOff) / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((content(dataOff + 2 * i + 1) & 0xff) << 8) | (content(dataOff + 2 * i) & 0xff)).toShort
      i += 1
    }
    (new AudioFormat(sampleRate.toFloat, 16, channels, true, false), out)
  }

  /** Reference JDK paths (SPI discovery per call — parity-spec only;
    * too contended for a 32-thread hot loop). */
  def encodeWavJdk(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def decodeWavJdk(content: Array[Byte]): (AudioFormat, Array[Short]) = {
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    val out = new Array[Short](n)
    var i = 0
    if (fmt.isBigEndian)
      while (i < n) { out(i) = (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort; i += 1 }
    else
      while (i < n) { out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort; i += 1 }
    (fmt, out)
  }

  /** Integer sums over four sample quarters (sample i belongs to
    * quarter floor(4i/n)) — the audio analog of the image
    * quadrant-gray signature. */
  def quarterSums(samples: Array[Short]): Array[Long] = {
    val n = samples.length
    val sums = new Array[Long](4)
    var i = 0
    while (i < n) {
      sums(i * 4 / n) += samples(i)
      i += 1
    }
    sums
  }
}

/** JDK-only AVI video codec used by [[MediaDecoder.JdkAviDib]]: a
  * standard RIFF/AVI container carrying uncompressed bottom-up 24-bit
  * BGR frames (the 'DIB '/BI_RGB codec — a real, spec-conformant AVI
  * any player opens). Lossless, so synthesized integer frames decode
  * back bit-exact and an external oracle can replay every derived
  * feature. Writer emits the full hdrl (avih/strh/strf) + movi
  * structure; reader walks the RIFF chunk tree. */
object VideoCodec {
  import java.awt.image.BufferedImage

  private def u32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ u32(body.length.toLong) ++ body ++ pad
  }
  private def list(kind: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(kind) ++ body)

  private def rowSize(w: Int): Int = (w * 3 + 3) / 4 * 4

  /** One frame as a bottom-up padded BGR DIB payload. */
  private def dibFrame(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val rs = rowSize(w)
    val out = new Array[Byte](rs * h)
    var y = 0
    while (y < h) {
      val destRow = (h - 1 - y) * rs // bottom-up
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(destRow + 3 * x) = (rgb & 0xff).toByte // B
        out(destRow + 3 * x + 1) = ((rgb >> 8) & 0xff).toByte // G
        out(destRow + 3 * x + 2) = ((rgb >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  def encodeAvi(frames: Seq[BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "empty video")
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    val frameBytes = rowSize(w) * h
    val avih = u32(1000000L / fps) ++ u32(frameBytes.toLong * fps) ++ u32(0) ++
      u32(0x10 /*AVIF_HASINDEX off; none*/ & 0) ++ u32(frames.length.toLong) ++
      u32(0) ++ u32(1) ++ u32(frameBytes.toLong) ++ u32(w.toLong) ++ u32(h.toLong) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val strh = fourcc("vids") ++ fourcc("DIB ") ++ u32(0) ++ u16(0) ++ u16(0) ++
      u32(0) ++ u32(1) ++ u32(fps.toLong) ++ u32(0) ++ u32(frames.length.toLong) ++
      u32(frameBytes.toLong) ++ u32(0xffffffffL) ++ u32(0) ++
      u16(0) ++ u16(0) ++ u16(w) ++ u16(h)
    val strf = u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(24) ++
      u32(0 /*BI_RGB*/) ++ u32(frameBytes.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00db", dibFrame(f))).toArray)
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32(riffBody.length.toLong) ++ riffBody
  }

  private def rdU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Decode an AVI/DIB container: (width, height, frames), each frame
    * a row-major top-down packed-RGB array (y*w + x). */
  def decodeAvi(bytes: Array[Byte]): (Int, Int, Seq[Array[Int]]) = {
    require(cc(bytes, 0) == "RIFF" && cc(bytes, 8) == "AVI ",
      s"not a RIFF/AVI container (${bytes.length} bytes)")
    var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    def walk(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = cc(bytes, o)
        val sz = rdU32(bytes, o + 4).toInt
        val body = o + 8
        id match {
          case "LIST" => walk(body + 4, body + sz)
          case "strf" =>
            w = rdU32(bytes, body + 4).toInt
            h = rdU32(bytes, body + 8).toInt
            require(rdU32(bytes, body + 16) == 0L, "not BI_RGB")
          case "00db" | "00dc" =>
            require(w > 0 && h > 0, "frame before strf header")
            val rs = rowSize(w)
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              val srcRow = body + (h - 1 - y) * rs
              var x = 0
              while (x < w) {
                px(y * w + x) = ((bytes(srcRow + 3 * x + 2) & 0xff) << 16) |
                  ((bytes(srcRow + 3 * x + 1) & 0xff) << 8) |
                  (bytes(srcRow + 3 * x) & 0xff)
                x += 1
              }
              y += 1
            }
            frames += px
          case _ => ()
        }
        o = body + sz + (sz % 2)
      }
    }
    walk(12, bytes.length)
    require(w > 0 && frames.nonEmpty, "no video stream found")
    (w, h, frames.toSeq)
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

  /** REAL pixel resize for decodable images: decode with the JDK
    * codec, nearest-neighbor remap, re-encode PNG. Map-only (no
    * shuffle); the source dims are preserved in `meta` so downstream
    * stages don't need a join back to the originals. */
  def resizePixels(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] =
    media.map { m =>
      val img = ImageCodec.decode(m.content)
      val out = ImageCodec.resizeNearest(img, width, height)
      m.copy(
        content = ImageCodec.encodePng(out),
        mimetype = "image/png",
        meta = m.meta ++ Map(
          "orig_w" -> img.getWidth.toString, "orig_h" -> img.getHeight.toString))
    }

  /** 64-bit average-hash (aHash) of a decodable image, returned as
    * FOUR 16-bit band values instead of one packed long. The split is
    * load-bearing twice over: (a) the near-dup candidate join keys on
    * band equality, and with Hamming threshold t < #bands the
    * pigeonhole principle makes banding LOSSLESS — any pair within t
    * bit flips shares at least one untouched band, so recall is
    * deterministic (unlike probabilistic cosine LSH, where banding
    * trades recall); (b) 16-bit values never touch the sign bit, so
    * the same integer math replays in engines with checked 64-bit
    * shifts.
    *
    * Hash definition (exact integer arithmetic, oracle-replayable):
    * decode → nearest-neighbor resize to 8×8 (src = dst*srcDim/dstDim,
    * the [[ImageCodec.resizeNearest]] mapping) → bit(x,y) = 1 iff
    * 64·gray(x,y) > Σgray (strict, division-free mean compare) →
    * band j (j = y/2) packs rows 2j..2j+1 as bits (y%2)*8 + x. */
  def aHashBands(content: Array[Byte]): Array[Int] = {
    val small = ImageCodec.resizeNearest(ImageCodec.decode(content), 8, 8)
    val g = Array.tabulate(64)(i => ImageCodec.gray(small, i % 8, i / 8))
    var sum = 0L
    var i = 0
    while (i < 64) { sum += g(i); i += 1 }
    val bands = new Array[Int](4)
    i = 0
    while (i < 64) {
      if (64L * g(i) > sum) {
        val y = i / 8
        bands(y / 2) |= 1 << ((y % 2) * 8 + (i % 8))
      }
      i += 1
    }
    bands
  }

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
