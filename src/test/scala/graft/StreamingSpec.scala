package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.spark.MarcSchema
import Fixtures._

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("watermarked window counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = graft.streaming.Streaming.eventWindowCounts(stream.toDF(), "10 minutes", "1 hour")
    val query = out.writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    stream.addData(
      Ev(1, ts("2026-01-01T00:10:00Z"), 1, "click", 1.0),
      Ev(2, ts("2026-01-01T00:20:00Z"), 1, "click", 2.0),
      Ev(3, ts("2026-01-01T01:05:00Z"), 2, "view", 3.0))
    query.processAllAvailable()
    // advance watermark past the first window so it emits
    stream.addData(Ev(4, ts("2026-01-01T03:00:00Z"), 2, "view", 4.0))
    query.processAllAvailable()
    val rows = spark.sql("SELECT * FROM wincounts").collect()
    query.stop()
    val clicks = rows.find(_.getAs[String]("event_type") == "click")
    assert(clicks.isDefined)
    assert(clicks.get.getAs[Long]("n") == 2L)
  }

  test("stream-stream interval join attributes purchases to in-window clicks only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = graft.streaming.Streaming.attributionJoin(stream.toDF(), windowSeconds = 1800L)
    val query = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    stream.addData(
      Ev(1, ts("2026-01-01T00:00:00Z"), 1, "click", 0.0),
      Ev(2, ts("2026-01-01T00:10:00Z"), 1, "purchase", 9.0), // in window (600s)
      Ev(3, ts("2026-01-01T01:00:00Z"), 1, "purchase", 9.0), // outside (3600s)
      Ev(4, ts("2026-01-01T00:05:00Z"), 2, "purchase", 9.0), // other user
      Ev(5, ts("2026-01-01T00:20:00Z"), 2, "click", 0.0))    // click after purchase
    query.processAllAvailable()
    val rows = spark.sql("SELECT * FROM attrib").collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"),
        r.getAs[Long]("delay_s")))
    query.stop()
    assert(rows.toSeq == Seq((1L, 2L, 600L)),
      s"exactly the in-window same-user pair must match: ${rows.toSeq}")
  }

  test("flatMapGroupsWithState sessionization: in-batch gap closes, timeout closes, open survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val out = graft.streaming.Streaming.streamSessions(stream.toDF(), gapSeconds = 1800L)
    val query = out.toDF().writeStream.format("memory").queryName("sessout")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // user 1: two events 10 min apart (one session), then an event 2h
    // later in the SAME batch -> the first session closes by in-batch
    // gap; user 2: one event
    stream.addData(
      Ev(1, ts("2026-01-01T00:00:00Z"), 1, "click", 1.0),
      Ev(2, ts("2026-01-01T00:10:00Z"), 1, "click", 1.0),
      Ev(3, ts("2026-01-01T02:00:00Z"), 1, "click", 1.0),
      Ev(4, ts("2026-01-01T02:00:00Z"), 2, "view", 1.0))
    query.processAllAvailable()
    val afterBatch1 = spark.sql("SELECT * FROM sessout").collect()
    assert(afterBatch1.length == 1, s"only the in-batch-closed session emits, got ${afterBatch1.length}")
    assert(afterBatch1.head.getAs[Long]("user_id") == 1L &&
      afterBatch1.head.getAs[Long]("n_events") == 2L)
    // an event far in the future advances the watermark past both open
    // sessions' gaps -> both time out and emit
    stream.addData(Ev(5, ts("2026-01-01T09:00:00Z"), 3, "view", 1.0))
    query.processAllAvailable()
    val afterBatch2 = spark.sql("SELECT * FROM sessout").collect()
    query.stop()
    assert(afterBatch2.length == 3, s"timed-out sessions must emit, got ${afterBatch2.length}")
    val u1Last = afterBatch2.find(r => r.getAs[Long]("user_id") == 1L && r.getAs[Long]("n_events") == 1L)
    assert(u1Last.isDefined, "user 1's 02:00 singleton session times out")
    assert(afterBatch2.exists(r => r.getAs[Long]("user_id") == 2L), "user 2's session times out")
    // user 3's session is still open (no emission for it)
    assert(!afterBatch2.exists(r => r.getAs[Long]("user_id") == 3L))
  }

  test("checkpointed restart: sessions spanning two kills recover from state, exactly once") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // user 1's FIRST session spans incarnations 1+2 (00:00, 00:10 |
    // 00:20) and its second spans 2+3 (02:00 | 02:10); user 2 lives
    // entirely in incarnation 1 and times out at the final watermark.
    // Any lost state splits a spanning session in two (wrong n_events,
    // extra row); any replayed input double-emits (dup rows) — both
    // fail the set equality below.
    val slices: Seq[Seq[Ev]] = Seq(
      Seq(Ev(1, ts("2026-01-01T00:00:00Z"), 1, "click", 1.0),
        Ev(2, ts("2026-01-01T00:10:00Z"), 1, "click", 1.0),
        Ev(3, ts("2026-01-01T00:05:00Z"), 2, "view", 1.0)),
      Seq(Ev(4, ts("2026-01-01T00:20:00Z"), 1, "click", 1.0),
        Ev(5, ts("2026-01-01T02:00:00Z"), 1, "click", 1.0)),
      Seq(Ev(6, ts("2026-01-01T02:10:00Z"), 1, "click", 1.0),
        Ev(7, ts("2026-01-01T09:00:00Z"), 3, "view", 1.0)))
    val base = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    val srcDir = s"$base/src"; val ckpt = s"$base/ckpt"; val outDir = s"$base/out"
    slices.head.toDF().write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runIncarnation(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val out = graft.streaming.Streaming.streamSessions(src, gapSeconds = 1800L)
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runIncarnation() // dies with user 1+2's sessions open in state
    val afterRun1 = spark.read.parquet(outDir).count()
    slices(1).toDF().write.mode("append").parquet(srcDir)
    runIncarnation() // recovers; user 1's session continues across the kill
    slices(2).toDF().write.mode("append").parquet(srcDir)
    runIncarnation()
    val rows = spark.read.parquet(outDir)
      .select("user_id", "session_start_s", "session_end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def s(t: String) = ts(t).toInstant.getEpochSecond
    // single-run emission rule: user 1's two closed sessions (the first
    // stitched ACROSS the first kill: 3 events), user 2's timed-out
    // singleton; user 3's stays open (end + gap not strictly passed)
    val expected = Set(
      (1L, s("2026-01-01T00:00:00Z"), s("2026-01-01T00:20:00Z"), 3L),
      (1L, s("2026-01-01T02:00:00Z"), s("2026-01-01T02:10:00Z"), 2L),
      (2L, s("2026-01-01T00:05:00Z"), s("2026-01-01T00:05:00Z"), 1L))
    assert(rows.length == rows.toSet.size, s"restart double-emitted: ${rows.toSeq}")
    assert(rows.toSet == expected, s"restart-equivalence broken: ${rows.toSeq}")
    // the spanning session must NOT have been emitted before the kill —
    // i.e. it really lived in the checkpointed state store, not the sink
    assert(afterRun1 == 0, s"incarnation 1 emitted $afterRun1 rows; nothing should close yet")
  }

  test("streaming exact dedup keeps the first-seen doc per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = stream.toDF().toDF("doc_id", "ts", "text")
    val out = graft.streaming.Streaming.dedupStream(docs, "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    stream.addData((1L, ts("2026-01-01T00:00:00Z"), "alpha"),
      (2L, ts("2026-01-01T00:01:00Z"), "alpha"),
      (3L, ts("2026-01-01T00:02:00Z"), "beta"))
    query.processAllAvailable()
    stream.addData((4L, ts("2026-01-01T00:03:00Z"), "beta"),
      (5L, ts("2026-01-01T00:04:00Z"), "gamma"))
    query.processAllAvailable()
    val rows = spark.sql("SELECT doc_id FROM dedup").collect().map(_.getLong(0)).toSet
    query.stop()
    assert(rows == Set(1L, 3L, 5L)) // dup texts 2 and 4 dropped across batches
  }

  test("streaming decontamination flags docs sharing an n-gram with the static bench set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = stream.toDF().toDF("doc_id", "ts", "text")
    val bench = Seq("the quick fox", "lazy dog naps").toDF("g")
    val out = graft.streaming.Streaming.decontaminateStream(docs, bench, "10 minutes")
    val query = out.writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    stream.addData(
      (1L, ts("2026-01-01T00:00:00Z"), "see the quick fox jump"), // contaminated
      (2L, ts("2026-01-01T00:01:00Z"), "nothing shared here at all"),
      (3L, ts("2026-01-01T00:02:00Z"), "the quick fox and lazy dog naps")) // two hits, one row
    query.processAllAvailable()
    stream.addData((4L, ts("2026-01-01T00:03:00Z"), "lazy dog naps again")) // next batch
    query.processAllAvailable()
    val rows = spark.sql("SELECT doc_id FROM decon").collect().map(_.getLong(0))
    query.stop()
    assert(rows.sorted.toSeq == Seq(1L, 3L, 4L))
    assert(rows.length == 3) // doc 3 emitted once despite two matching n-grams
  }

  test("incremental tag index maintenance via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_idx").toString
    val indexPath = s"$dir/tag_index"
    val stream = MemoryStream[Int]
    // batches of record ids -> MarcRow stream
    val rows = MarcSchema.toDataset(spark, Seq(bib1, bib2)).collect()
    val recordStream = stream.toDF().withColumn("idx", col("value"))
    val query = graft.streaming.Streaming.maintainTagIndex(
      recordStream.join(
        spark.createDataset(rows.toSeq).toDF().withColumn("idx", col("_id").cast("int")), "idx"),
      indexPath, s"$dir/chk").start()
    stream.addData(1)
    query.processAllAvailable()
    val after1 = spark.read.parquet(indexPath)
    assert(after1.where(col("tag") === "245").count() == 1)
    stream.addData(2)
    query.processAllAvailable()
    spark.catalog.refreshByPath(indexPath)
    val after2 = spark.read.parquet(indexPath)
    assert(after2.where(col("tag") === "245").count() == 2)
    assert(after2.where(col("tag") === "650").count() == 1) // same raw text merged
    query.stop()
  }

  test("streaming commit maintains the store + history per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_store").toString
    val store = new graft.store.MarcStore(spark, dir)
    store.commit(MarcSchema.toDataset(spark, Seq(auth1, auth2)), user = "seed")
    val rows = MarcSchema.toDataset(spark, Seq(bib1, bib2)).collect()
    val stream = MemoryStream[Int]
    val recordStream = stream.toDF().withColumn("idx", col("value"))
      .join(spark.createDataset(rows.toSeq).toDF().withColumn("idx", col("_id").cast("int")), "idx")
      .drop("value", "idx")
    val query = graft.streaming.Streaming.commitStream(
      recordStream, store, user = "streamer", s"$dir/chk").start()
    stream.addData(1)
    query.processAllAvailable()
    assert(store.read("bib").count() == 1L)
    stream.addData(1, 2) // re-commit bib1 (version 2) + new bib2
    query.processAllAvailable()
    query.stop()
    assert(store.read("bib").count() == 2L)
    val hist = store.readHistory("bib")
    assert(hist.where(col("_id") === 1L).count() == 2L)
    assert(hist.where(col("_id") === 2L).count() == 1L)
    assert(store.read("bib").head().user == "streamer")
  }
}
