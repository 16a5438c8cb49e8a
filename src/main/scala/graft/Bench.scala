package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with the headline
  * total plus per-query medians. A small untimed warmup (trivial job
  * + one scan of each input) separates JVM/codegen/IO cold-start from
  * per-query cost.
  *
  * Two lessons from earlier rounds are baked in:
  *  - The harness that collects this output keeps only the LAST 2000
  *    characters of stdout, so the 114-query map cannot ride on the
  *    headline line. The headline stays compact (total, counts,
  *    errors, slowest-8); the complete per-query medians + min/max
  *    spread + error messages are written to BENCH_DETAIL.json in
  *    the repo root, which the headline names.
  *  - A thrown query must NOT look like a fast query. Failures are
  *    recorded as {"err": message} per query, surfaced on the
  *    headline line, and the process exits nonzero if any occurred.
  */
object Bench {

  /** Silence TWO known-benign teardown races (r11 verdict finding #3,
    * r12 finding #3): when a query's last tasks finish after the query
    * is torn down, DAGScheduler logs ERROR "Failed to update
    * accumulator … non-existent accumulator" per task, and
    * AccumulatorContext logs WARN "garbage collected accumulator" per
    * GC'd handle — hundreds of lines that drown the captured bench
    * tail. Message-targeted log4j2 DENY filters drop exactly those;
    * every other event on both loggers (and all real failures, which
    * also propagate as exceptions → rc!=0) still prints. Call AFTER
    * setLogLevel (which reconfigures levels). Idempotent: the bench
    * tools run several mains in one RoundArtifacts JVM, and repeated
    * calls must not stack duplicate filters (round-12 advice). */
  def silenceTeardownNoise(): Unit =
    if (noiseFiltersInstalled.compareAndSet(false, true)) {
      denyMessage("org.apache.spark.scheduler.DAGScheduler",
        "Failed to update accumulator")
      denyMessage("org.apache.spark.util.AccumulatorContext",
        "garbage collected accumulator")
    }

  private val noiseFiltersInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def denyMessage(loggerName: String, substring: String): Unit = {
    import org.apache.logging.log4j.{Level => L4JLevel}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.AbstractFilter
    import org.apache.logging.log4j.core.{Filter, LogEvent}
    val ctx = LoggerContext.getContext(false)
    val cfg = ctx.getConfiguration
    val lc = cfg.getLoggers.get(loggerName) match {
      case existing: LoggerConfig if existing.getName == loggerName => existing
      case _ =>
        val fresh = new LoggerConfig(loggerName, L4JLevel.WARN, true)
        cfg.addLogger(loggerName, fresh)
        fresh
    }
    lc.addFilter(new AbstractFilter() {
      override def filter(event: LogEvent): Filter.Result =
        if (event.getMessage != null &&
            event.getMessage.getFormattedMessage.contains(substring))
          Filter.Result.DENY
        else Filter.Result.NEUTRAL
    })
    // REQUIRED: already-created Logger instances keep their cached
    // config until updateLoggers() — without this the filter is inert
    // (verified against log4j-core 2.24.3)
    ctx.updateLoggers()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // store tables are bucket-partitioned dirs (64 buckets > the
      // 32-path default): list them on the driver instead of paying a
      // Spark job per table read
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceTeardownNoise()

    // warmup: JVM + whole-stage codegen + parquet footers
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }

    // n=1 bench numbers on this rig vary ±30% on heavy queries —
    // enough to fake a regression (or an improvement). Run the WHOLE
    // battery `reps` times (pass-level repetition keeps within-pass
    // cache semantics identical to a single driver run; gate caches
    // are dropped between passes so every pass is equally cold) and
    // report the per-query MEDIAN, with min/max spread alongside.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val battery = SparkEntry.queries.toSeq.sortBy(_._1)
    // name -> error message from the LAST pass that threw; a query
    // that fails any pass is reported as failed, never as its time
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Shared-cache construction (MARC corpora, store lifecycles) is
    // timed as its own per-pass "warm" phase, NOT inside whichever
    // query happens to run first alphabetically — per-query medians
    // previously carried up to 10x attribution noise from it. The
    // headline total still INCLUDES warm (total = warm + sum of query
    // medians) so round-over-round totals stay comparable.
    val warmTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // per-pass observability (round 13): the median-of-passes design
    // assumed passes are iid; measured pass-to-pass degradation (sum of
    // pass walls drifting up across a run) needs per-pass totals + GC
    // walls in the detail artifact to be diagnosable at all
    val passWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passGc = scala.collection.mutable.ArrayBuffer.empty[Double]
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    // Per-query aggregate executor task-time + peak concurrent tasks
    // (round-13 verdict item 2: at sf0.1 the battery is fixed-cost
    // dominated, so wall-clock alone cannot show which queries
    // parallelize — the driver's low-core/high-core ratio heuristic
    // misread the honored $SPARK_GRAFT_CPUS contract as ignored).
    // task_s >> wall marks a genuinely parallel query; task_s ≈ 0
    // marks engine/protocol fixed cost. Listener events are posted
    // asynchronously; the per-query System.gc() pause below gives the
    // bus time to drain, and residual attribution error is well under
    // the rig's run-to-run noise.
    val taskMillis = new java.util.concurrent.atomic.AtomicLong(0)
    val activeTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val peakTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskStart(
          ts: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = {
        val a = activeTasks.incrementAndGet()
        peakTasks.getAndAccumulate(a, math.max)
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        activeTasks.decrementAndGet()
        val m = te.taskMetrics
        if (m != null) taskMillis.addAndGet(m.executorRunTime)
      }
    })
    // name -> per-pass task seconds / peak concurrent tasks
    val taskSecs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    val peaks = scala.collection.mutable.Map.empty[String, Int]
    val passes: Seq[Map[String, Double]] = (1 to reps).map { p =>
      if (p > 1) {
        graft.queries.MarcOps.clearGateCaches()
        graft.queries.StoreOps.clearGateCaches()
        graft.records.TableSerialization.clearHeaderSortCache()
      }
      val w0 = System.nanoTime()
      try {
        // the MARC corpora and the gate stores are independent — warm
        // them concurrently (guide §2.6); each helper parallelizes its
        // own independent members the same way
        graft.queries.Tables.awaitAll(Seq(
          () => graft.queries.MarcOps.prewarmGateCaches(spark, sfDir),
          () => graft.queries.StoreOps.prewarmGateCaches(spark, sfDir)))
      } catch { case _: Throwable => () } // a broken cache surfaces in its query
      warmTimes += (System.nanoTime() - w0) / 1e9
      val p0 = System.nanoTime()
      val gc0 = gcMillis()
      val passResult = battery.map { case (name, fn) =>
        val task0 = taskMillis.get()
        peakTasks.set(0)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              val msg = (Option(e.getMessage).getOrElse(e.getClass.getName))
                .replaceAll("\\s+", " ").take(200)
              errors(name) = s"${e.getClass.getSimpleName}: $msg"
              false
          }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
        // untimed: let ContextCleaner drop dead checkpoint/broadcast
        // blocks so one query's residue doesn't skew the next
        System.gc()
        taskSecs.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty) +=
          (taskMillis.get() - task0) / 1e3
        peaks(name) = math.max(peaks.getOrElse(name, 0), peakTasks.get())
        name -> dt
      }.toMap
      passWalls += (System.nanoTime() - p0) / 1e9
      passGc += (gcMillis() - gc0) / 1e3
      passResult
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    // Locale.ROOT: a comma-decimal default locale would emit "0,123"
    // and corrupt the committed JSON artifact
    def r3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    val names = battery.map(_._1)
    val good = names.filterNot(errors.contains)
    val med: Seq[(String, Double)] = good.map(n => n -> median(passes.map(_(n))))
    val warm = median(warmTimes.toSeq)
    val total = med.map(_._2).sum + warm

    // full detail file: medians, spread, errors — everything the
    // headline can't carry in 2000 chars
    val detailPath = "/root/repo/BENCH_DETAIL.json"
    val qDetail = med.map { case (n, v) =>
      val xs = passes.map(_(n))
      val ts = taskSecs.getOrElse(n, Seq(0.0d))
      s"${jstr(n)}:{\"median\":${r3(v)},\"min\":${r3(xs.min)},\"max\":${r3(xs.max)},\"passes\":[${xs.map(r3).mkString(",")}],\"task_s\":${r3(median(ts.toSeq))},\"peak_tasks\":${peaks.getOrElse(n, 0)}}"
    }.mkString(",")
    val eDetail = errors.map { case (n, m) => s"${jstr(n)}:${jstr(m)}" }.mkString(",")
    val passMeta =
      s""""pass_walls":[${passWalls.map(r3).mkString(",")}],"pass_gc_s":[${passGc.map(r3).mkString(",")}]"""
    val detail =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":${jstr(sfDir)},"reps":$reps,"warm_sec":${r3(warm)},$passMeta,"n_queries":${names.size},"n_ok":${good.size},"queries":{$qDetail},"errors":{$eDetail}${graft.tools.GitStamp.jsonField}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes("UTF-8"))

    // compact headline — MUST fit (with margin) in a 2000-char tail
    val slowest = med.sortBy(-_._2).take(8)
      .map { case (n, v) => s"${jstr(n)}:${r3(v)}" }.mkString("{", ",", "}")
    val errNames = errors.keys.take(5).map(jstr).mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":${jstr(sfDir)},"reps":$reps,"warm_sec":${r3(warm)},"n_queries":${names.size},"n_ok":${good.size},"n_err":${errors.size},"err_names":$errNames,"queries":$slowest,"queries_truncated":true,"detail":${jstr(detailPath)}${graft.tools.GitStamp.jsonField}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
