package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** The streaming-gate FIXED-COST budget (round-14, verdict item 4):
  * q85/q86/q119/q125/q144/q163/q186 each pay ~1-1.3 s that walls
  * alone cannot attribute. This tool runs each gate once with a
  * StreamingQueryListener capturing every micro-batch's
  * `durationMs` breakdown (queryPlanning / addBatch / walCommit /
  * commitOffsets / getBatch / latestOffset / triggerExecution) plus
  * the stateOperators' commit times, and prints per-gate totals —
  * so "optimize the streaming engine" decisions are made against a
  * committed measurement, not a guess.
  *
  * Usage: sbt "runMain graft.tools.StreamBudget [sfDir] [out.json]"
  */
object StreamBudget {

  /** (gate, batchId, durationMs) rows; the listener class below is
    * instantiated per SESSION via the static
    * `spark.sql.streaming.streamingQueryListeners` conf — the gates
    * run in cloned sessions whose StreamingQueryManager never sees a
    * listener added to the base session. */
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, Long, Map[String, Long])]()
  @volatile var current = "?"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("BENCH_stream_profile.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.StreamBudgetListener")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceTeardownNoise()

    val gates: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "q163_stream_complete_agg" -> (graft.queries.PipelineOps.q163StreamCompleteAgg _),
        "q85_stream_windows" -> (graft.queries.PipelineOps.q85StreamWindows _),
        "q144_stream_dedup" -> (graft.queries.PipelineOps.q144StreamDedup _),
        "q125_stream_join" -> (graft.queries.PipelineOps.q125StreamJoin _),
        "q119_stream_sessionize" -> (graft.queries.PipelineOps.q119StreamSessionize _),
        "q86_stream_decon" -> (graft.queries.PipelineOps.q86StreamDecon _),
        "q186_stream_recovery" -> (graft.queries.PipelineOps.q186StreamRecovery _))

    val results = gates.map { case (name, fn) =>
      current = name
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async listener bus
      (name, wall, n)
    }

    import scala.jdk.CollectionConverters._
    val byGate = StreamBudget.batches.asScala.toSeq.groupBy(_._1)
    def j(name: String, wall: Double): String = {
      val bs = byGate.getOrElse(name, Seq.empty).sortBy(_._2)
      val keys = bs.flatMap(_._3.keys).distinct.sorted
      val sums = keys.map(k => s""""$k":${bs.map(_._3.getOrElse(k, 0L)).sum}""").mkString(",")
      val perBatch = bs.map { case (_, id, m) =>
        s"""{"batch":$id,${m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
      }.mkString(",")
      f""""$name":{"wall":$wall%.3f,"n_batches":${bs.size},"sum_ms":{$sums},"batches":[$perBatch]}"""
    }
    val body = results.map { case (n, w, _) => j(n, w) }.mkString(",")
    val json = s"""{"metric":"stream_profile","sf":"$sfDir","gates":{$body},"git_sha":"${GitStamp.sha}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

/** Conf-registered per-session listener (see StreamBudget.batches). */
class StreamBudgetListener extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    import scala.jdk.CollectionConverters._
    StreamBudget.batches.add((StreamBudget.current, e.progress.batchId,
      e.progress.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap))
  }
}
