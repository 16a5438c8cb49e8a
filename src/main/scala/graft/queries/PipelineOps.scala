package graft.queries

import graft.multimodal.{MediaDecoder, Multimodal}
import graft.text.LanguageId
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Multimodal + language-ID pipeline operators through the gate.
  * Media content is synthesized (no media in the testdata): q32/q46/
  * q65 drive the stub decode boundary over document text bytes, and
  * q101 drives the REAL JDK image codec over generated PNGs whose
  * pixels are integer functions of doc_id, so DuckDB replays every
  * output exactly.
  */
object PipelineOps {

  /** Binary-column featurization: text bytes -> MediaRow -> partition-
    * wise stub decode -> embedding norm. */
  def q32Multimodal(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromBinaryColumns(
      documents(s, dir), "doc_id", "text", "image", "image/fake")
    val feats = Multimodal.featurize(media, MediaDecoder.Stub)
    feats.toDF()
      .select(col("media_id").as("doc_id"), col("n_bytes"), col("width"), col("height"),
        round(sqrt(
          col("embedding")(0).cast("double") * col("embedding")(0).cast("double") +
            col("embedding")(1).cast("double") * col("embedding")(1).cast("double") +
            col("embedding")(2).cast("double") * col("embedding")(2).cast("double")), 4)
          .as("embedding_norm"))
      .orderBy("doc_id")
  }

  /** Resize plumbing: binary in/out with target dims recorded in the
    * typed metadata map (the decode itself is the documented stub
    * boundary — no media libs in this sandbox). */
  def q65MediaResize(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromBinaryColumns(
      documents(s, dir), "doc_id", "text", "image", "image/fake")
    Multimodal.resize(media, 64, 48).toDF()
      .select(col("media_id"),
        col("meta")("resized_w").as("w"), col("meta")("resized_h").as("h"),
        length(col("content")).cast("long").as("n_bytes"))
      .orderBy("media_id")
  }

  /** Video frame sampling plumbing: text bytes as fake video content,
    * exploded to one row per sampled frame (every 2nd of 8 slices) —
    * the frame-table contract a real codec drops into. DuckDB replays
    * the slicing with substr + md5. */
  def q46FrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromBinaryColumns(
      documents(s, dir), "doc_id", "text", "video", "video/fake")
    Multimodal.sampleFrames(media, everyK = 2)
      .select(col("media_id"), col("frame_no"),
        md5(col("frame_bytes")).as("frame_md5"),
        length(col("frame_bytes")).cast("long").as("n_bytes"))
      .orderBy("media_id", "frame_no")
  }

  /** REAL image decode under the oracle: synthesize a deterministic
    * grayscale PNG per document (dims and pixels are integer functions
    * of doc_id), then run the genuine pixel path — ImageIO decode →
    * nearest-neighbor resize to 16x12 → PNG re-encode → re-decode →
    * quadrant-gray-sum embedding. Every output value is exact integer
    * math DuckDB replays from doc_id alone, so the gate proves the
    * codec round-trip (encode/decode/resize) bit-for-bit, not just
    * plumbing. Map-only until the final sort. */
  def q101ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          // 16..32 x 12..24 px; gray(x,y) = (id*31 + x*7 + y*13) % 256
          val w = 16 + (id % 17).toInt
          val h = 12 + (id % 13).toInt
          val img = graft.multimodal.ImageCodec.grayImage(w, h) { (x, y) =>
            ((id * 31 + x * 7 + y * 13) % 256).toInt
          }
          graft.multimodal.MediaRow(id, "image",
            graft.multimodal.ImageCodec.encodePng(img), "image/png", Map.empty)
        }
      }
    val resized = graft.multimodal.Multimodal.resizePixels(media, 16, 12)
    resized.map { m =>
      val (rw, rh) = graft.multimodal.MediaDecoder.JdkImageIO.decodeDims(m.content)
      val e = graft.multimodal.MediaDecoder.JdkImageIO.embed(m.content).map(_.toLong)
      (m.media_id, m.meta("orig_w").toInt, m.meta("orig_h").toInt, rw, rh,
        e(0), e(1), e(2), e(3), e.sum)
    }.toDF("media_id", "width", "height", "rw", "rh",
        "q00", "q10", "q01", "q11", "gray_sum")
      .orderBy("media_id")
  }

  /** Real WAV/PCM audio decode — the audio analog of q101's image
    * path, closing the audio half of the Stub boundary: synthesize a
    * deterministic integer waveform per document (sample i of doc id:
    * (id·31 + i·7) % 2003 − 1001, n = 800 + id%257 samples at 8 kHz),
    * encode a real RIFF/WAVE container, decode it back through
    * `javax.sound.sampled`, and emit integer features (quarter-segment
    * sums + peak). PCM is lossless, so the DuckDB oracle replays the
    * synth math directly — a codec round-trip error of even one sample
    * fails the hash. Map-only until the output sort. */
  def q115AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 800 + (id % 257).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i.toLong * 7) % 2003) - 1001).toShort)
          graft.multimodal.MediaRow(id, "audio",
            graft.multimodal.AudioCodec.encodeWav(samples, 8000), "audio/wav", Map.empty)
        }
      }
    media.map { m =>
      val (fmt, samples) = graft.multimodal.AudioCodec.decodeWav(m.content)
      val qs = graft.multimodal.AudioCodec.quarterSums(samples)
      (m.media_id, fmt.getSampleRate.toInt, samples.length.toLong,
        qs(0), qs(1), qs(2), qs(3), samples.map(x => math.abs(x.toLong)).max)
    }.toDF("media_id", "sample_rate", "n_samples", "q0", "q1", "q2", "q3", "peak_abs")
      .orderBy("media_id")
  }

  /** Real AVI video decode + frame sampling — closes the video Stub:
    * synthesize a deterministic multi-frame video per document (frame
    * f, pixel (x,y) of doc id: gray = (id·31 + f·17 + x·7 + y·13) %
    * 256; w = 16+id%9, h = 12+id%7, frames = 6+id%5), pack a
    * spec-conformant RIFF/AVI container with uncompressed DIB frames,
    * decode it back through the chunk-tree parser, sample every 2nd
    * frame, and emit integer quadrant-gray sums per sampled frame.
    * DIB is lossless, so the DuckDB oracle replays the synth math —
    * one wrong pixel in any frame fails the hash. Map-only (flatMap
    * fan-out is the sampled-frame count) until the output sort. */
  def q116VideoDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 9).toInt
          val h = 12 + (id % 7).toInt
          val n = 6 + (id % 5).toInt
          val frames = (0 until n).map { f =>
            graft.multimodal.ImageCodec.grayImage(w, h) { (x, y) =>
              ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt
            }
          }
          graft.multimodal.MediaRow(id, "video",
            graft.multimodal.VideoCodec.encodeAvi(frames), "video/x-msvideo", Map.empty)
        }
      }
    media.flatMap { m =>
      val (w, h, frames) = graft.multimodal.VideoCodec.decodeAvi(m.content)
      val (hw, hh) = (w / 2, h / 2)
      frames.zipWithIndex.collect { case (px, f) if f % 2 == 0 =>
        val sums = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sums((if (x >= hw) 1 else 0) + (if (y >= hh) 2 else 0)) += px(y * w + x) & 0xff
            x += 1
          }
          y += 1
        }
        (m.media_id, f, w, h, frames.length, sums(0), sums(1), sums(2), sums(3))
      }
    }.toDF("media_id", "frame_no", "width", "height", "n_frames",
        "q00", "q10", "q01", "q11")
      .orderBy("media_id", "frame_no")
  }

  private val streamSinkCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run a finite gate stream with a bounded state-partition count.
    * Streaming state partitioning is pinned at first start from
    * spark.sql.shuffle.partitions and every micro-batch pays one state
    * store commit PER PARTITION — for the finite gate inputs 8 is
    * plenty (a long-lived production stream sizes this to its key
    * cardinality, not to the batch-side default). The override lives
    * in a CLONED session (inherits conf, shares the context), so a
    * concurrent batch or stream query planned on `s` never observes
    * the stream's partition count and there is no set/restore race
    * on the shared session conf. The closure must build its stream
    * (and read its memory sink — temp views are session-scoped) from
    * the session it receives. */
  private def withStreamSession[A](s: SparkSession, n: Int)(f: SparkSession => A): A = {
    // newSession: same context/shared state, fresh conf + temp-view
    // catalog (cloneSession is private[sql]); runtime conf the caller
    // set on `s` is copied over, static conf set attempts skipped
    val ss = s.newSession()
    for ((k, v) <- s.conf.getAll)
      try ss.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    ss.conf.set("spark.sql.shuffle.partitions", n.toString)
    f(ss)
  }

  /** Structured Streaming under the oracle: the watermarked tumbling-
    * window aggregation (`Streaming.eventWindowCounts`, the streaming
    * form of q11) executed as a REAL streaming query — parquet
    * readStream → Trigger.AvailableNow → memory sink — and compared
    * against the same DuckDB SQL as the batch plan. Complete output
    * mode drains every window at end-of-stream for the finite gate
    * input; the production path is append mode + watermark-expired
    * emission, identical logical plan. */
  /** Streaming sessionization under the oracle: real
    * flatMapGroupsWithState custom state (Streaming.streamSessions)
    * over an events readStream — Append mode emissions are sessions
    * closed by a same-user successor event or by the event-time
    * timeout when the final watermark (max ts, 0s delay) passes the
    * session gap. The DuckDB oracle replays exactly that emission
    * rule against the batch session construction. */
  def q119StreamSessionize(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sink = s"q119_sink_${streamSinkCounter.incrementAndGet()}"
    withStreamSession(s, 8) { ss =>
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = ss.read.parquet(s"$dir/events.parquet").schema
      val eventsPath = s"$dir/events.parquet"
      val src =
        if (new java.io.File(eventsPath).isDirectory)
          ss.readStream.schema(schema).parquet(eventsPath)
        else
          ss.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir)
      val stream = Tables.normalizeEventTs(src)
      val out = graft.streaming.Streaming.streamSessions(stream, gapSeconds = 1800L)
      val query = out.toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      ss.table(sink)
        .select(col("user_id"), col("session_start_s"), col("session_end_s"),
          col("n_events"))
        .orderBy("user_id", "session_start_s")
    }
  }

  def q85StreamWindows(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sink = s"q85_sink_${streamSinkCounter.incrementAndGet()}"
    withStreamSession(s, 8) { ss =>
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = ss.read.parquet(s"$dir/events.parquet").schema
      // events.parquet is a single file and FileStreamSource anchors
      // basePath at the source path — stream the directory and glob-
      // filter to the one table instead
      // testdata ships events.parquet as a single FILE (FileStreamSource
      // anchors basePath at the source path, so stream the parent dir
      // with a name glob); scaled/materialized data is a parquet
      // DIRECTORY (stream it directly — the glob would match nothing
      // and silently yield an empty stream)
      val eventsPath = s"$dir/events.parquet"
      val src =
        if (new java.io.File(eventsPath).isDirectory)
          ss.readStream.schema(schema).parquet(eventsPath)
        else
          ss.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir)
      // ts decode branches on the type the reader produced (nanos-
      // as-long vs micros NTZ), exactly as in Tables.events
      val stream = Tables.normalizeEventTs(src)
      val out = graft.streaming.Streaming.eventWindowCounts(stream, "1 hour", "1 hour")
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      ss.table(sink)
        .select(col("window_start").cast("long").as("window_start_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start_s", "event_type")
    }
  }

  /** Streaming decontamination under the oracle: the stream-static
    * n-gram probe (`Streaming.decontaminateStream`, streaming form of
    * the batch q67) over a documents readStream — append mode works
    * because dropDuplicatesWithinWatermark emits first-seen rows
    * immediately (state eviction is the only watermark effect), and
    * the CONTAMINATED-DOC SET is arrival-order-independent, so the
    * DuckDB replay is exact. */
  def q86StreamDecon(s: SparkSession, dir: String): DataFrame = {
    val sink = s"q86_sink_${streamSinkCounter.incrementAndGet()}"
    withStreamSession(s, 8) { ss =>
      val schema = ss.read.parquet(s"$dir/documents.parquet").schema
      val docs = ss.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .where(col("doc_id") % 50 =!= 0)
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      val bench = documents(ss, dir).where(col("doc_id") % 50 === 0)
        .select(explode(TextOps.shingleArray(split(col("text"), " "), 3)).as("g"))
        .distinct()
      val out = graft.streaming.Streaming.decontaminateStream(docs, bench)
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      ss.table(sink).select(col("doc_id")).orderBy("doc_id")
    }
  }

  /** Marker-word language ID vs the labeled lang column. */
  def q33LangId(s: SparkSession, dir: String): DataFrame = {
    val detect = udf((text: String) => LanguageId.detect(text))
    documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled"), detect(col("text")).as("predicted"))
      .withColumn("agree", (col("labeled") === col("predicted")).cast("int"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal" -> (q32Multimodal _),
    "q33_lang_id" -> (q33LangId _),
    "q46_frame_sample" -> (q46FrameSample _),
    "q65_media_resize" -> (q65MediaResize _),
    "q101_image_decode" -> (q101ImageDecode _),
    "q115_audio_decode" -> (q115AudioDecode _),
    "q116_video_decode" -> (q116VideoDecode _),
    "q85_stream_windows" -> (q85StreamWindows _),
    "q86_stream_decon" -> (q86StreamDecon _),
    "q119_stream_sessionize" -> (q119StreamSessionize _))

  private def markerList(lang: String): String =
    LanguageId.markers.toMap.apply(lang).toSeq.sorted.map(w => s"'$w'").mkString(", ")

  val oracle: Map[String, String] = Map(
    // replays synth (gray = (id*31 + x*7 + y*13) % 256 at 16+id%17 x
    // 12+id%13) + nearest-neighbor (src = dst*srcDim//dstDim) + the
    // 16x12 quadrant split — all integer math, so a codec round-trip
    // error of even one pixel level fails the hash
    "q101_image_decode" ->
      """WITH px AS (
        |  SELECT doc_id,
        |         CAST(rx.range AS INT) AS x, CAST(ry.range AS INT) AS y,
        |         (doc_id * 31
        |          + ((CAST(rx.range AS BIGINT) * (16 + doc_id % 17)) // 16) * 7
        |          + ((CAST(ry.range AS BIGINT) * (12 + doc_id % 13)) // 12) * 13) % 256 AS g
        |  FROM documents CROSS JOIN range(0, 16) rx CROSS JOIN range(0, 12) ry)
        |SELECT doc_id AS media_id,
        |  CAST(16 + doc_id % 17 AS INT) AS width,
        |  CAST(12 + doc_id % 13 AS INT) AS height,
        |  16 AS rw, 12 AS rh,
        |  CAST(SUM(CASE WHEN x < 8 AND y < 6 THEN g ELSE 0 END) AS BIGINT) AS q00,
        |  CAST(SUM(CASE WHEN x >= 8 AND y < 6 THEN g ELSE 0 END) AS BIGINT) AS q10,
        |  CAST(SUM(CASE WHEN x < 8 AND y >= 6 THEN g ELSE 0 END) AS BIGINT) AS q01,
        |  CAST(SUM(CASE WHEN x >= 8 AND y >= 6 THEN g ELSE 0 END) AS BIGINT) AS q11,
        |  CAST(SUM(g) AS BIGINT) AS gray_sum
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // replays the frame synth (gray = (id*31 + f*17 + x*7 + y*13) %
    // 256 over w=16+id%9, h=12+id%7, frames=6+id%5, every 2nd frame)
    // — all integer, so an AVI round-trip error of one pixel in any
    // frame fails the hash
    "q116_video_decode" ->
      """WITH px AS (
        |  SELECT doc_id, CAST(rf.range AS INT) AS f,
        |         CAST(rx.range AS INT) AS x, CAST(ry.range AS INT) AS y,
        |         16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
        |         6 + doc_id % 5 AS n,
        |         (doc_id * 31 + rf.range * 17 + rx.range * 7 + ry.range * 13) % 256 AS g
        |  FROM documents
        |  CROSS JOIN range(0, 11) rf CROSS JOIN range(0, 25) rx CROSS JOIN range(0, 19) ry
        |  WHERE rf.range < 6 + doc_id % 5 AND rf.range % 2 = 0
        |    AND rx.range < 16 + doc_id % 9 AND ry.range < 12 + doc_id % 7)
        |SELECT doc_id AS media_id, f AS frame_no,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(n AS INT) AS n_frames,
        |  CAST(SUM(CASE WHEN x < w // 2 AND y < h // 2 THEN g ELSE 0 END) AS BIGINT) AS q00,
        |  CAST(SUM(CASE WHEN x >= w // 2 AND y < h // 2 THEN g ELSE 0 END) AS BIGINT) AS q10,
        |  CAST(SUM(CASE WHEN x < w // 2 AND y >= h // 2 THEN g ELSE 0 END) AS BIGINT) AS q01,
        |  CAST(SUM(CASE WHEN x >= w // 2 AND y >= h // 2 THEN g ELSE 0 END) AS BIGINT) AS q11
        |FROM px GROUP BY doc_id, f, w, h, n ORDER BY media_id, frame_no""".stripMargin,
    // replays the waveform synth (sample i = (id*31 + i*7) % 2003 -
    // 1001 over n = 800 + id%257 samples) — all integer, so a WAV
    // codec round-trip error of even one sample fails the hash
    "q115_audio_decode" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(r.range AS BIGINT) AS i,
        |         (doc_id * 31 + r.range * 7) % 2003 - 1001 AS v,
        |         800 + doc_id % 257 AS n
        |  FROM documents CROSS JOIN range(0, 1057) r
        |  WHERE r.range < 800 + doc_id % 257)
        |SELECT doc_id AS media_id, 8000 AS sample_rate,
        |  CAST(MAX(n) AS BIGINT) AS n_samples,
        |  CAST(SUM(CASE WHEN i * 4 // n = 0 THEN v ELSE 0 END) AS BIGINT) AS q0,
        |  CAST(SUM(CASE WHEN i * 4 // n = 1 THEN v ELSE 0 END) AS BIGINT) AS q1,
        |  CAST(SUM(CASE WHEN i * 4 // n = 2 THEN v ELSE 0 END) AS BIGINT) AS q2,
        |  CAST(SUM(CASE WHEN i * 4 // n = 3 THEN v ELSE 0 END) AS BIGINT) AS q3,
        |  CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs
        |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // replays streamSessions' emission rule: batch-construct the gap
    // sessions, emit every session with a same-user successor, plus
    // the final session iff end + gap < corpus max ts (the final
    // 0s-delay watermark; Spark fires the event-time timeout on
    // STRICTLY-passed timestamps)
    "q119_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s FROM events),
        |mx AS (SELECT MAX(ts_s) AS max_s FROM e),
        |t AS (
        |  SELECT *, LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_s
        |  FROM e),
        |s AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |n AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM s),
        |per AS (
        |  SELECT user_id, session_no, MIN(ts_s) AS session_start_s,
        |         MAX(ts_s) AS session_end_s, COUNT(*) AS n_events
        |  FROM n GROUP BY 1, 2),
        |lastno AS (SELECT user_id, MAX(session_no) AS max_no FROM per GROUP BY 1)
        |SELECT p.user_id, p.session_start_s, p.session_end_s,
        |       CAST(p.n_events AS BIGINT) AS n_events
        |FROM per p JOIN lastno l USING (user_id) CROSS JOIN mx
        |WHERE p.session_no < l.max_no OR p.session_end_s + 1800 < mx.max_s
        |ORDER BY p.user_id, p.session_start_s""".stripMargin,
    "q86_stream_decon" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, GREATEST(len(w) - 2, 1) + 1),
        |    i -> array_to_string(w[i:i+2], ' ')))) AS g
        |  FROM t),
        |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0)
        |SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (g)
        |WHERE sh.doc_id % 50 <> 0 ORDER BY doc_id""".stripMargin,
    "q85_stream_windows" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_s,
        |event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start_s, event_type""".stripMargin,
    "q65_media_resize" ->
      """SELECT doc_id AS media_id, '64' AS w, '48' AS h,
        |CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,
    "q46_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, text, strlen(text) AS L,
        |         GREATEST(CAST(strlen(text) // 8 AS INT), 1) AS fs
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, CAST(r.range AS INT) AS frame_no,
        |         substr(text, CAST(r.range * fs + 1 AS INT), fs) AS fb
        |  FROM d CROSS JOIN range(0, 100) r WHERE r.range * fs < L)
        |SELECT doc_id AS media_id, frame_no, md5(fb) AS frame_md5,
        |       CAST(strlen(fb) AS BIGINT) AS n_bytes
        |FROM f WHERE frame_no % 2 = 0 ORDER BY media_id, frame_no""".stripMargin,
    "q32_multimodal" ->
      """SELECT doc_id,
        |CAST(strlen(text) AS BIGINT) AS n_bytes,
        |CAST(strlen(text) % 1024 AS INT) AS width,
        |CAST(ascii(substr(text, 1, 1)) + 1 AS INT) AS height,
        |ROUND(SQRT(
        |  CAST(strlen(text) AS DOUBLE) * CAST(strlen(text) AS DOUBLE) +
        |  CAST(ascii(substr(text, 1, 1)) AS DOUBLE) * CAST(ascii(substr(text, 1, 1)) AS DOUBLE) +
        |  CAST(ascii(substr(text, -1, 1)) AS DOUBLE) * CAST(ascii(substr(text, -1, 1)) AS DOUBLE)), 4) AS embedding_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_lang_id" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang AS labeled, text,
        |    len(list_filter(string_split(lower(text), ' '), w -> w IN (${markerList("en")}))) AS s_en,
        |    len(list_filter(string_split(lower(text), ' '), w -> w IN (${markerList("es")}))) AS s_es,
        |    len(list_filter(string_split(lower(text), ' '), w -> w IN (${markerList("de")}))) AS s_de,
        |    len(list_filter(string_split(lower(text), ' '), w -> w IN (${markerList("fr")}))) AS s_fr
        |  FROM documents)
        |SELECT doc_id, labeled,
        |  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |       WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
        |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de'
        |       ELSE 'fr' END AS predicted,
        |  CAST(CASE WHEN labeled = (CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |       WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
        |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de'
        |       ELSE 'fr' END) THEN 1 ELSE 0 END AS INT) AS agree
        |FROM scored ORDER BY doc_id""".stripMargin)
}
