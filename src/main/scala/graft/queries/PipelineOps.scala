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
    val media = documentsFanned(s, dir).select(col("doc_id")).as[Long]
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
    val media = documentsFanned(s, dir).select(col("doc_id")).as[Long]
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
    val media = documentsFanned(s, dir).select(col("doc_id")).as[Long]
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

  /** Perceptual-hash image near-dup — the multimodal member of the
    * dedup family: synthesize one 32×24 grayscale PNG per document
    * where near-duplicate groups exist BY CONSTRUCTION (group
    * doc_id%997 shares a base pattern; doc_id%3 adds a small clamped
    * brightness offset — a real brightness edit that aHash should
    * absorb), run the REAL codec path (PNG decode → 8×8 NN resize →
    * average-hash as four 16-bit bands), then find near-dups by
    * banded Hamming join: candidates share ≥1 exact band, verified at
    * Hamming ≤ 3 over all 64 bits.
    *
    * Recall is DETERMINISTIC, not probabilistic: threshold 3 < 4
    * bands, so any pair within 3 bit flips shares an untouched band
    * (pigeonhole) — the Hamming analog of MinHash banding with the
    * recall guarantee the cosine-LSH family can only approximate.
    *
    * Scale shape: hash computation is map-only; identical hashes are
    * COLLAPSED to one representative before pair enumeration (the
    * exact-first discipline of q19/q44/q104 — a duplicate-heavy
    * corpus must not grow the band join quadratically), so the
    * candidate join is a keyed equi-join on (band_no, 16-bit value)
    * over DISTINCT hashes, whose bucket sizes are bounded by distinct
    * near-dup variants + 2^-16 random collisions; verify is a codegen
    * popcount per representative pair; group adjacency then expands
    * back to per-doc clusters by two bounded joins on the hash key.
    * The tiny bands table is localCheckpoint'd so the codec runs
    * once, not once per join branch. */
  def q122ImageAhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = documentsFanned(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val grp = id % 997
          val delta = (id % 3).toInt
          val img = graft.multimodal.ImageCodec.grayImage(32, 24) { (x, y) =>
            math.min(((grp * 37 + x * 7 + y * 13) % 256).toInt + delta, 255)
          }
          val b = graft.multimodal.Multimodal.aHashBands(
            graft.multimodal.ImageCodec.encodePng(img))
          (id, b(0), b(1), b(2), b(3))
        }
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
      .localCheckpoint(true)
    val hashCols = (0 to 3).map(i => col(s"b$i"))
    // exact-first collapse: one representative per distinct hash
    val groups = bands.groupBy(hashCols: _*)
      .agg(min("doc_id").as("rep"), min("doc_id").as("min_doc"),
        count(lit(1)).as("n_docs"))
      .localCheckpoint(true)
    val gx = groups.select(col("rep"),
      posexplode(array(hashCols: _*)).as(Seq("band_no", "v")))
    val cand = gx.as("a").join(gx.as("b"),
        col("a.band_no") === col("b.band_no") && col("a.v") === col("b.v") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("ra"), col("b.rep").as("rb"))
      .distinct()
    val xa = groups.select(col("rep").as("ra"), col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"), col("min_doc").as("amin"), col("n_docs").as("an"))
    val xb = groups.select(col("rep").as("rb"), col("b0").as("x0"), col("b1").as("x1"),
      col("b2").as("x2"), col("b3").as("x3"), col("min_doc").as("xmin"), col("n_docs").as("xn"))
    val hamming = (0 to 3).map(i =>
      expr(s"bit_count(cast(a$i as bigint) ^ cast(x$i as bigint))")).reduce(_ + _)
    val nbr = cand.join(xa, "ra").join(xb, "rb")
      .where(hamming <= 3)
    // symmetric group adjacency: per group, the min doc id and doc
    // count over all ADJACENT groups (distinct hashes within t bits)
    val sym = nbr.select(col("ra").as("g"), col("xmin").as("omin"), col("xn").as("on"))
      .union(nbr.select(col("rb"), col("amin"), col("an")))
    val adj = sym.groupBy("g").agg(min("omin").as("nbr_min"), sum("on").as("nbr_n"))
    // expand back to documents: group-mates are Hamming-0 neighbors,
    // adjacent groups contribute their full membership
    val withStats = bands
      .join(groups.select(hashCols :+ col("rep") :+ col("min_doc") :+ col("n_docs"): _*),
        (0 to 3).map(i => bands(s"b$i") === groups(s"b$i")).reduce(_ && _))
      .join(adj, col("rep") === col("g"), "left")
    withStats
      .select(bands("doc_id"), bands("b0"), bands("b1"), bands("b2"), bands("b3"),
        least(col("min_doc"), coalesce(col("nbr_min"), col("min_doc"))).as("cluster_id"),
        (col("n_docs") - 1L + coalesce(col("nbr_n"), lit(0L))).cast("int").as("n_neighbors"))
      .orderBy("doc_id")
  }

  /** Audio activity analysis — the quality-filter stage an audio
    * training corpus needs (drop silent/low-energy clips): synthesize
    * a waveform per document with silence regions BY CONSTRUCTION
    * (every 100-sample frame where (frame+id)%3 == 0 carries only
    * ±10 noise; active frames carry the q115 ±1001 ramp), round-trip
    * a real RIFF/WAVE container through `javax.sound.sampled`, and
    * emit integer activity features: active-frame count (frame mean
    * |v| > 50, i.e. Σ|v| > 5000), whole-clip zero-crossing count
    * (v·prev < 0, strict), and peak amplitude. PCM is lossless, so
    * the DuckDB oracle replays the synth math — one wrong sample
    * flips a crossing or a frame verdict and fails the hash.
    * Map-only until the output sort. */
  def q123AudioActivity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 600 + (id % 301).toInt
          val samples = Array.tabulate(n) { i =>
            val active = ((i / 100) + id) % 3 != 0
            if (active) (((id * 31 + i.toLong * 7) % 2003) - 1001).toShort
            else (((id + i.toLong * 3) % 21) - 10).toShort
          }
          graft.multimodal.MediaRow(id, "audio",
            graft.multimodal.AudioCodec.encodeWav(samples, 8000), "audio/wav", Map.empty)
        }
      }
    media.map { m =>
      val samples = graft.multimodal.AudioCodec.decodeWav(m.content)._2
      val n = samples.length
      val nFrames = (n + 99) / 100
      var zc = 0L
      var peak = 0L
      var nActive = 0
      var f = 0
      while (f < nFrames) {
        var sumAbs = 0L
        var i = f * 100
        val end = math.min(n, i + 100)
        while (i < end) {
          val v = samples(i).toLong
          sumAbs += math.abs(v)
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && v * samples(i - 1).toLong < 0L) zc += 1
          i += 1
        }
        if (sumAbs > 5000L) nActive += 1
        f += 1
      }
      (m.media_id, n.toLong, nFrames, nActive, zc, peak)
    }.toDF("media_id", "n_samples", "n_frames", "n_active", "zc", "peak_abs")
      .orderBy("media_id")
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

  /** CHECKPOINT-RESTART recovery under the oracle — the one
    * Structured-Streaming property the single-process replay gates
    * (q85/q86/q119/q125/q144/q163) cannot see: a production stream
    * dies and restarts, and the answer must come out as if it never
    * had. The gate runs q119's stateful sessionizer
    * (flatMapGroupsWithState, the state-heaviest operator here) in TWO
    * query incarnations against one checkpoint + file sink:
    *
    *   1. stream over the FIRST HALF of events (split by event time),
    *      Trigger.AvailableNow drains it and the query stops — open
    *      sessions live only in the checkpointed state store;
    *   2. the second half is appended to the source dir and the SAME
    *      query (same checkpoint, same sink) restarts: sessions
    *      spanning the split must continue from recovered state.
    *
    * The oracle is q119's VERBATIM (single-run emission rule on the
    * full corpus), so the gate is exactly restart-equivalence. The
    * time split makes recovery provably lossless under the 0s
    * watermark: run 1's final watermark is maxTs(A) ≤ mid, so a
    * session that times out in run 1 has end + gap < maxTs(A) < every
    * batch-B timestamp — any batch-B same-user event would start a
    * new session in a single run too, and no batch-B row is ever
    * late. The parquet sink's commit log makes the two runs' output
    * exactly-once; the batch read-back honors _spark_metadata. */
  def q186StreamRecovery(s: SparkSession, dir: String): DataFrame = {
    withStreamSession(s, 8) { ss =>
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = Tables.events(ss, dir)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("event_id").cast("long").as("event_id"))
      val b = ev.agg(min(col("ts").cast("long")), max(col("ts").cast("long"))).head()
      val mid = (b.getLong(0) + b.getLong(1)) / 2
      val base = java.nio.file.Files.createTempDirectory("graft_q186_").toString
      val srcDir = s"$base/src"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
      ev.where(col("ts").cast("long") <= mid).write.mode("overwrite").parquet(srcDir)
      val schema = ss.read.parquet(srcDir).schema
      def runOnce(): Unit = {
        val src = ss.readStream.schema(schema).parquet(srcDir)
        val out = graft.streaming.Streaming.streamSessions(src, gapSeconds = 1800L)
        val q = out.toDF().writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce() // first incarnation: drains batch A, stops
      ev.where(col("ts").cast("long") > mid).write.mode("append").parquet(srcDir)
      runOnce() // restart: state + source offsets recover from ckpt
      ss.read.parquet(outDir)
        .select(col("user_id"), col("session_start_s"), col("session_end_s"),
          col("n_events"))
        .orderBy("user_id", "session_start_s")
    }
  }

  /** Stream-stream interval join under the oracle: REAL self-join of
    * two streaming legs off one events readStream (click→purchase
    * attribution within 30 min, `Streaming.attributionJoin`), Append
    * mode — the DuckDB oracle replays the same integer-second range
    * join in batch SQL. The watermark delay exceeds the corpus span,
    * so the finite AvailableNow replay emits every matching pair
    * regardless of file arrival order. */
  def q125StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val sink = s"q125_sink_${streamSinkCounter.incrementAndGet()}"
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
      val out = graft.streaming.Streaming.attributionJoin(stream, windowSeconds = 1800L)
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      ss.table(sink)
        .select(col("user_id"), col("click_id"), col("purchase_id"), col("delay_s"))
        .orderBy("click_id", "purchase_id")
    }
  }

  def q85StreamWindows(s: SparkSession, dir: String): DataFrame = {
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
      val bench = documentsFanned(ss, dir).where(col("doc_id") % 50 === 0)
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

  /** Streaming content dedup under the oracle: `Streaming.dedupStream`
    * (md5 content hash → watermark → dropDuplicatesWithinWatermark)
    * run as a REAL streaming query over the events stream, content key
    * = (user_id, event_type, value-cents). Which physical row survives
    * a duplicate group is arrival-order-dependent, so the gate hashes
    * the SET of surviving content hashes — exactly the operator's
    * contract (emit each content exactly once per watermark window) —
    * which the DuckDB oracle replays as SELECT DISTINCT md5(key).
    * State story at scale: per-key state is one timestamp, evicted at
    * the watermark — state size is bounded by keys-per-window, not by
    * stream length. */
  def q144StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val sink = s"q144_sink_${streamSinkCounter.incrementAndGet()}"
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
      val docs = Tables.normalizeEventTs(src)
        .select(col("ts"),
          concat_ws("|", col("user_id"), col("event_type"),
            floor(col("value") * 100)).as("text"))
      val out = graft.streaming.Streaming.dedupStream(docs, "365 days")
      val query = out.select("content_hash").writeStream
        .format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      ss.table(sink).select("content_hash").orderBy("content_hash")
    }
  }

  /** Complete-output-mode streaming aggregation — the last streaming
    * output surface after Append (q85/q119/q125/q144) and the
    * foreachBatch/update paths (q86): a running global aggregate whose
    * FULL result is re-emitted per micro-batch, exactly what a live
    * dashboard sinks. State is one row per group key (bounded by
    * |event types|), independent of stream length; the finite
    * AvailableNow replay makes the final emission equal the batch
    * aggregate, which the oracle checks. */
  def q163StreamCompleteAgg(s: SparkSession, dir: String): DataFrame = {
    val sink = s"q163_sink_${streamSinkCounter.incrementAndGet()}"
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
      val out = Tables.normalizeEventTs(src)
        .select(col("event_type"), floor(col("value") * 100).as("vq"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("vq").as("sum_vq"))
      val query = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      ss.table(sink).orderBy("event_type")
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_stream_dedup" -> (q144StreamDedup _),
    "q163_stream_complete_agg" -> (q163StreamCompleteAgg _),
    "q32_multimodal" -> (q32Multimodal _),
    "q33_lang_id" -> (q33LangId _),
    "q46_frame_sample" -> (q46FrameSample _),
    "q65_media_resize" -> (q65MediaResize _),
    "q101_image_decode" -> (q101ImageDecode _),
    "q115_audio_decode" -> (q115AudioDecode _),
    "q116_video_decode" -> (q116VideoDecode _),
    "q122_image_ahash_dedup" -> (q122ImageAhashDedup _),
    "q123_audio_activity" -> (q123AudioActivity _),
    "q85_stream_windows" -> (q85StreamWindows _),
    "q125_stream_join" -> (q125StreamJoin _),
    "q86_stream_decon" -> (q86StreamDecon _),
    "q119_stream_sessionize" -> (q119StreamSessionize _),
    "q186_stream_recovery" -> (q186StreamRecovery _))

  private def markerList(lang: String): String =
    LanguageId.markers.toMap.apply(lang).toSeq.sorted.map(w => s"'$w'").mkString(", ")

  /** Shared by q119 (single-run) and q186 (checkpoint restart) — the
    * restart gate's contract IS that one oracle body fits both. */
  private val streamSessionOracle: String =
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
      |ORDER BY p.user_id, p.session_start_s""".stripMargin

  val oracle: Map[String, String] = Map(
    // the complete-mode final emission equals the batch aggregate
    "q163_stream_complete_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_vq
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the distinct surviving content-hash set (arrival-independent)
    "q144_stream_dedup" ->
      """SELECT DISTINCT md5(CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
        |  CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)) AS content_hash
        |FROM events ORDER BY content_hash""".stripMargin,
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
    // replays the aHash pipeline end-to-end from doc_id alone: the
    // 8x8 NN subsample of the 32x24 synth (sx=4x, sy=3y -> g =
    // least((grp*37 + 28x + 39y) % 256 + delta, 255)), the strict
    // division-free mean compare, the 4x16-bit band packing, the
    // band-equality candidate join, the Hamming<=3 verify, and the
    // per-doc cluster rollup — a codec error of one gray level that
    // crosses the mean flips a band value and fails the hash
    "q122_image_ahash_dedup" ->
      """WITH px AS (
        |  SELECT doc_id, CAST(rx.range AS INT) AS x, CAST(ry.range AS INT) AS y,
        |         LEAST(((doc_id % 997) * 37 + rx.range * 28 + ry.range * 39) % 256
        |               + doc_id % 3, 255) AS g
        |  FROM documents CROSS JOIN range(0, 8) rx CROSS JOIN range(0, 8) ry),
        |tot AS (SELECT doc_id, SUM(g) AS s FROM px GROUP BY 1),
        |bands AS (
        |  SELECT px.doc_id, y // 2 AS band_no,
        |         CAST(SUM(CASE WHEN 64 * g > s THEN 1 << ((y % 2) * 8 + x)
        |                       ELSE 0 END) AS INT) AS v
        |  FROM px JOIN tot USING (doc_id) GROUP BY 1, 2),
        |doc AS (
        |  SELECT doc_id,
        |         MAX(CASE WHEN band_no = 0 THEN v END) AS b0,
        |         MAX(CASE WHEN band_no = 1 THEN v END) AS b1,
        |         MAX(CASE WHEN band_no = 2 THEN v END) AS b2,
        |         MAX(CASE WHEN band_no = 3 THEN v END) AS b3
        |  FROM bands GROUP BY 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM bands a JOIN bands b
        |    ON a.band_no = b.band_no AND a.v = b.v AND a.doc_id < b.doc_id),
        |nbr AS (
        |  SELECT da, db FROM cand
        |  JOIN doc xa ON xa.doc_id = cand.da
        |  JOIN doc xb ON xb.doc_id = cand.db
        |  WHERE bit_count(xor(CAST(xa.b0 AS BIGINT), CAST(xb.b0 AS BIGINT)))
        |      + bit_count(xor(CAST(xa.b1 AS BIGINT), CAST(xb.b1 AS BIGINT)))
        |      + bit_count(xor(CAST(xa.b2 AS BIGINT), CAST(xb.b2 AS BIGINT)))
        |      + bit_count(xor(CAST(xa.b3 AS BIGINT), CAST(xb.b3 AS BIGINT))) <= 3),
        |sym AS (SELECT da AS d, db AS o FROM nbr UNION ALL SELECT db, da FROM nbr),
        |agg AS (SELECT d, MIN(o) AS mn, COUNT(*) AS c FROM sym GROUP BY 1)
        |SELECT doc.doc_id, b0, b1, b2, b3,
        |  CAST(LEAST(doc.doc_id, COALESCE(agg.mn, doc.doc_id)) AS BIGINT) AS cluster_id,
        |  CAST(COALESCE(agg.c, 0) AS INT) AS n_neighbors
        |FROM doc LEFT JOIN agg ON agg.d = doc.doc_id
        |ORDER BY doc_id""".stripMargin,
    // replays the activity synth (frame f active iff (f+id)%3 != 0;
    // active sample = (id*31+i*7)%2003-1001, silent = (id+i*3)%21-10
    // over n = 600+id%301), the frame energy verdict (sum|v| > 5000),
    // the strict zero-crossing rule (v*prev < 0, clip-wide), and the
    // peak — all integer, so a WAV round-trip error of one sample
    // fails the hash
    "q123_audio_activity" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(r.range AS BIGINT) AS i,
        |         600 + doc_id % 301 AS n,
        |         CASE WHEN ((r.range // 100) + doc_id) % 3 <> 0
        |              THEN (doc_id * 31 + r.range * 7) % 2003 - 1001
        |              ELSE (doc_id + r.range * 3) % 21 - 10 END AS v
        |  FROM documents CROSS JOIN range(0, 901) r
        |  WHERE r.range < 600 + doc_id % 301),
        |w AS (
        |  SELECT *, LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s),
        |fr AS (
        |  SELECT doc_id, i // 100 AS f, MAX(n) AS n, SUM(ABS(v)) AS sa,
        |         SUM(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END) AS zc,
        |         MAX(ABS(v)) AS pk
        |  FROM w GROUP BY 1, 2)
        |SELECT doc_id AS media_id, CAST(MAX(n) AS BIGINT) AS n_samples,
        |  CAST(COUNT(*) AS INT) AS n_frames,
        |  CAST(SUM(CASE WHEN sa > 5000 THEN 1 ELSE 0 END) AS INT) AS n_active,
        |  CAST(SUM(zc) AS BIGINT) AS zc,
        |  CAST(MAX(pk) AS BIGINT) AS peak_abs
        |FROM fr GROUP BY doc_id ORDER BY media_id""".stripMargin,
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
    "q119_stream_sessionize" -> streamSessionOracle,
    // RESTART-EQUIVALENCE by construction: q186 runs the same
    // sessionizer through a kill + checkpoint-recovery, and its oracle
    // is the single-run rule VERBATIM — any state lost or replayed
    // across the restart shows as a hash mismatch on this row
    "q186_stream_recovery" -> streamSessionOracle,
    // replays the interval join on integer seconds: purchase in
    // [click, click+1800) same user — the batch form of the
    // watermarked stream-stream join
    "q125_stream_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         epoch_ns(ts) // 1000000000 AS ts_s FROM events)
        |SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       CAST(p.ts_s - c.ts_s AS BIGINT) AS delay_s
        |FROM e c JOIN e p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts_s >= c.ts_s AND p.ts_s < c.ts_s + 1800
        |ORDER BY click_id, purchase_id""".stripMargin,
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
