package graft

import graft.multimodal.{ImageCodec, MediaDecoder, MediaRow, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The JDK image codec is bit-exact: PNG round-trips losslessly,
  * nearest-neighbor resize uses the integer-floor mapping the q101
  * oracle replays, and the decoder trait surfaces real dims/pixels. */
class MultimodalSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int) =
    ImageCodec.grayImage(w, h)((x, y) => (x * 7 + y * 13) % 256)

  test("PNG encode/decode round-trips every pixel") {
    val img = gradient(23, 17)
    val back = ImageCodec.decode(ImageCodec.encodePng(img))
    assert(back.getWidth == 23 && back.getHeight == 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert(ImageCodec.gray(back, x, y) == (x * 7 + y * 13) % 256)
  }

  test("resizeNearest maps dst pixel to src floor(dst*srcDim/dstDim)") {
    val img = gradient(31, 19)
    val out = ImageCodec.resizeNearest(img, 16, 12)
    assert(out.getWidth == 16 && out.getHeight == 12)
    for (y <- 0 until 12; x <- 0 until 16) {
      val (sx, sy) = (x * 31 / 16, y * 19 / 12)
      assert(ImageCodec.gray(out, x, y) == (sx * 7 + sy * 13) % 256)
    }
  }

  test("JdkImageIO decodes real dims and quadrant-gray-sum embedding") {
    val png = ImageCodec.encodePng(gradient(10, 8))
    assert(MediaDecoder.JdkImageIO.decodeDims(png) == ((10, 8)))
    val e = MediaDecoder.JdkImageIO.embed(png)
    assert(e.length == 4)
    // quadrant split at (5, 4); recompute independently
    val expect = new Array[Long](4)
    for (y <- 0 until 8; x <- 0 until 10)
      expect((if (x >= 5) 1 else 0) + (if (y >= 4) 2 else 0)) += (x * 7 + y * 13) % 256
    assert(e.map(_.toLong).toSeq == expect.toSeq)
  }

  test("JdkImageIO rejects undecodable bytes") {
    intercept[IllegalArgumentException] {
      MediaDecoder.JdkImageIO.decodeDims("not an image".getBytes)
    }
  }

  test("resizePixels re-encodes resized content and keeps source dims in meta") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val media = (0L until 3L).map { id =>
      MediaRow(id, "image", ImageCodec.encodePng(gradient(20 + id.toInt, 15)),
        "image/png", Map("k" -> "v"))
    }.toDS()
    val out = Multimodal.resizePixels(media, 8, 6).collect().sortBy(_.media_id)
    for (m <- out) {
      assert(m.meta("orig_w") == (20 + m.media_id).toString && m.meta("orig_h") == "15")
      assert(m.meta("k") == "v") // pre-existing metadata preserved
      val img = ImageCodec.decode(m.content)
      assert(img.getWidth == 8 && img.getHeight == 6)
      val sw = 20 + m.media_id.toInt
      for (y <- 0 until 6; x <- 0 until 8)
        assert(ImageCodec.gray(img, x, y) == ((x * sw / 8) * 7 + (y * 15 / 6) * 13) % 256)
    }
  }

  test("aHashBands: hash matches independent recompute, invariant to uniform brightness") {
    val png = ImageCodec.encodePng(
      ImageCodec.grayImage(32, 24)((x, y) => (x * 7 + y * 13) % 256))
    val bands = Multimodal.aHashBands(png)
    // independent recompute from the synth function via the NN mapping
    val g = Array.tabulate(64)(i => ((i % 8) * 4 * 7 + (i / 8) * 3 * 13) % 256)
    val sum = g.map(_.toLong).sum
    val expect = new Array[Int](4)
    for (i <- 0 until 64 if 64L * g(i) > sum) {
      val y = i / 8
      expect(y / 2) |= 1 << ((y % 2) * 8 + (i % 8))
    }
    assert(bands.toSeq == expect.toSeq)
    assert(bands.forall(b => b >= 0 && b <= 0xffff), "bands are 16-bit")
    // uniform brightness shift (no clamping) leaves every bit unchanged:
    // 64*(g+c) > sum+64c  <=>  64*g > sum
    val brighter = ImageCodec.encodePng(
      ImageCodec.grayImage(32, 24)((x, y) => (x * 7 + y * 13) % 256 / 2 + 40))
    val base = ImageCodec.encodePng(
      ImageCodec.grayImage(32, 24)((x, y) => (x * 7 + y * 13) % 256 / 2))
    assert(Multimodal.aHashBands(brighter).toSeq == Multimodal.aHashBands(base).toSeq)
  }

  test("aHash banding is lossless for Hamming <= 3 (pigeonhole: 4 bands)") {
    // flip any 3 bits of a hash: at least one band must stay exactly
    // equal, so the band-equality join can never miss a t<=3 pair
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val h = Array.fill(4)(rnd.nextInt(0x10000))
      val flipped = h.clone()
      val bits = rnd.shuffle((0 until 64).toList).take(3)
      for (b <- bits) flipped(b / 16) ^= 1 << (b % 16)
      assert((0 until 4).exists(j => h(j) == flipped(j)),
        s"no shared band after flipping $bits")
    }
  }

  test("AudioCodec: WAV/PCM round-trip is bit-exact, quarter sums replayable") {
    val samples = Array.tabulate(1001)(i => (((i * 7 + 31) % 2003) - 1001).toShort)
    val wav = graft.multimodal.AudioCodec.encodeWav(samples, 8000)
    val (fmt, back) = graft.multimodal.AudioCodec.decodeWav(wav)
    assert(fmt.getSampleRate.toInt == 8000 && fmt.getChannels == 1)
    assert(back.toSeq == samples.toSeq, "PCM must round-trip losslessly")
    val qs = graft.multimodal.AudioCodec.quarterSums(samples)
    val expect = samples.zipWithIndex.groupBy { case (_, i) => i * 4 / samples.length }
      .view.mapValues(_.map(_._1.toLong).sum).toMap
    assert(qs.toSeq == (0 to 3).map(expect))
  }

  test("AudioCodec: direct RIFF walk is parity with javax.sound both ways") {
    import graft.multimodal.AudioCodec
    for (n <- Seq(1, 2, 800, 1057)) {
      val samples = Array.tabulate(n)(i => (((i * 13 + 17) % 2003) - 1001).toShort)
      // our container must be byte-identical to the JDK writer's
      val ours = AudioCodec.encodeWav(samples, 8000)
      val jdk = AudioCodec.encodeWavJdk(samples, 8000)
      assert(ours.toSeq == jdk.toSeq, s"container bytes diverge at n=$n")
      // the JDK reader must accept our container, and our reader theirs
      val (fmtJ, backJ) = AudioCodec.decodeWavJdk(ours)
      assert(fmtJ.getSampleRate.toInt == 8000 && backJ.toSeq == samples.toSeq)
      val (fmtO, backO) = AudioCodec.decodeWav(jdk)
      assert(fmtO.getSampleRate.toInt == 8000 && fmtO.getChannels == 1
        && backO.toSeq == samples.toSeq)
    }
  }

  test("JdkWavPcm decoder drives the generic featurize path") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.multimodal.AudioCodec
    val media = (0L until 3L).map { id =>
      val samples = Array.tabulate(800 + id.toInt)(i => ((id * 31 + i * 7) % 512 - 256).toShort)
      MediaRow(id, "audio", AudioCodec.encodeWav(samples, 8000), "audio/wav", Map.empty)
    }.toDS()
    val out = Multimodal.featurize(media, MediaDecoder.JdkWavPcm)
      .collect().sortBy(_.media_id)
    for (f <- out) {
      assert(f.width == 8000, "width slot carries the sample rate")
      assert(f.height == 800 + f.media_id.toInt, "height slot carries the frame count")
      val samples = Array.tabulate(800 + f.media_id.toInt)(i => ((f.media_id * 31 + i * 7) % 512 - 256).toShort)
      assert(f.embedding.toSeq == AudioCodec.quarterSums(samples).map(_.toFloat).toSeq)
    }
  }

  test("VideoCodec: AVI/DIB round-trip is pixel-exact across frames") {
    val frames = (0 until 4).map { f =>
      ImageCodec.grayImage(17, 13)((x, y) => (f * 17 + x * 7 + y * 13) % 256)
    }
    val avi = graft.multimodal.VideoCodec.encodeAvi(frames)
    // container sanity: RIFF/AVI magic, readable by the chunk walker
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val (w, h, back) = graft.multimodal.VideoCodec.decodeAvi(avi)
    assert(w == 17 && h == 13 && back.length == 4)
    for (f <- 0 until 4; y <- 0 until 13; x <- 0 until 17)
      assert((back(f)(y * 17 + x) & 0xff) == (f * 17 + x * 7 + y * 13) % 256,
        s"pixel mismatch at f=$f x=$x y=$y")
  }

  test("JdkAviDib decoder drives the generic featurize path") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val media = (0L until 2L).map { id =>
      val frames = (0 until 3).map { f =>
        ImageCodec.grayImage(10, 8)((x, y) => (id.toInt + f + x + y) % 256)
      }
      MediaRow(id, "video", graft.multimodal.VideoCodec.encodeAvi(frames),
        "video/x-msvideo", Map.empty)
    }.toDS()
    val out = Multimodal.featurize(media, MediaDecoder.JdkAviDib)
      .collect().sortBy(_.media_id)
    for (v <- out) {
      assert(v.width == 10 && v.height == 8)
      var expect = Array.fill(4)(0L)
      for (f <- 0 until 3; y <- 0 until 8; x <- 0 until 10)
        expect((if (x >= 5) 1 else 0) + (if (y >= 4) 2 else 0)) += (v.media_id.toInt + f + x + y) % 256
      assert(v.embedding.toSeq == expect.map(_.toFloat).toSeq)
    }
  }
}
