package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers shared by the driver-facing query catalog.
  *
  * Numeric discipline: the driver hash-compares our parquet output
  * against DuckDB running the oracle SQL. Double-sum is order-dependent,
  * so every money/quantity aggregate is computed over DECIMAL-cast
  * inputs (exact, order-independent) and only the final value is cast
  * back to DOUBLE — mirrored verbatim in the oracle SQL. Every query
  * ends in a deterministic ORDER BY.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  /** events.ts has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader only loads as INT64 under the legacy nanosAsLong flag —
    * and plain TIMESTAMP(micros, NTZ). Branch on the type the reader
    * actually produced rather than assuming either. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // harmless when the data is already micros; required for nanos
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(s, dir, "events"))
  }

  /** Normalize the `ts` column of an events frame to TimestampType.
    * LongType → the value is epoch NANOS (legacy nanosAsLong read);
    * integer-div to micros (double division would lose precision at
    * 1e18 ns). TIMESTAMP_NTZ → cast; the session timezone is pinned
    * to UTC everywhere, so the cast is an identity relabel. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  // Scan-width probe, cached per (dir, table): a gate-scale corpus is
  // one single-row-group parquet file, so its scan is ONE task and all
  // map-side work (tokenize, shingle, md5) of every consumer runs on
  // one core (round 13, guide §2.5 "input skew: one huge unsplittable
  // file — repartition immediately after the read"). When the scan's
  // own parallelism is already within 4x of the session's cores (the
  // production case: many files/row groups), this is a NO-OP — no
  // exchange is added, so the fan-out can never hurt a wide scan.
  private val fanOutDecision =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), Boolean]

  private def fanOut(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(s, dir, s"$name")
    val cores = math.max(s.sparkContext.defaultParallelism, 1)
    val narrow = fanOutDecision.getOrElseUpdate((dir, name, cores),
      df.rdd.getNumPartitions < math.max(cores / 4, 2))
    // round-robin, NOT keyed: a key column would be forced into every
    // consumer's ReadSchema even when pruned otherwise (guide §2.3
    // "project before the exchange"); round-robin spreads rows without
    // widening the scan, and sort-before-repartition (on by default)
    // keeps task retries deterministic
    if (narrow) df.repartition(cores) else df
  }

  /** Plain documents scan. Round 13 fanned EVERY consumer out, which
    * cost ~15-20 sub-second queries a fixed repartition they never
    * amortize (round-13 verdict finding #1): the fan-out pays only
    * when the consumer does heavy per-row map work (tokenize, shingle,
    * md5, decode) after the scan. Consumers now opt in per call site
    * via `documentsFanned` — classification from the committed r12/r13
    * per-query medians, re-measured this round. At production scan
    * widths both entry points are identical (fanOut is a no-op). */
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")

  /** Documents scan for heavy map-work consumers: round-robin fan-out
    * to session cores when (and only when) the scan itself is narrower
    * than cores/4 — see fanOut above. */
  def documentsFanned(s: SparkSession, dir: String): DataFrame = fanOut(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  /** Embeddings scan for heavy map-work consumers (the PQ/IVF-PQ
    * encode+score pipelines, round 14): same width-gated round-robin
    * fan-out as documentsFanned — the sf0.1 embeddings table is one
    * parquet file, so the per-row codebook argmin otherwise runs as
    * ONE task (measured: q113/q117 peak_tasks = 1, ~1.0-1.2 s of
    * task time serial). No-op at production scan widths. */
  def embeddingsFanned(s: SparkSession, dir: String): DataFrame = fanOut(s, dir, "embeddings")

  /** Run independent warm-phase tasks concurrently and propagate the
    * first failure (guide §2.6: overlap independent jobs so one task's
    * straggler tail back-fills with the next task's work). Bounded
    * fixed pool — warm tasks are few and coarse. */
  def awaitAll(tasks: Seq[() => Unit]): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      import scala.jdk.CollectionConverters._
      val futures = pool.invokeAll(
        tasks.map(t => new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        }).asJava)
      // rethrow the ORIGINAL task failure, not Future.get's
      // ExecutionException wrapper (round-13 advice: Verify/driver
      // callers outside Bench's catch-all saw the wrapped type)
      futures.asScala.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException
              if e.getCause != null => throw e.getCause
        }
      }
    } finally pool.shutdown()
  }
}
