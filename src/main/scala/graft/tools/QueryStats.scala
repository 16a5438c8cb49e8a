package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-13 evidence helper: run named catalog queries once (after the
  * standard gate-cache prewarm) and report scheduler-level totals —
  * jobs, stages, tasks, shuffle bytes read/written — per query. For
  * iterative operators (PageRank, CC, BPE) whose per-step plans hide
  * behind localCheckpoint cuts in any explain output, these totals are
  * the observable before/after: a removed per-iteration shuffle shows
  * up as fewer stages and fewer shuffle bytes even though the final
  * frame's explain is just "Scan ExistingRDD".
  *
  * Usage: runMain graft.tools.QueryStats <sfDir> <q1,q2,...> [k=v,k=v]
  * The optional third arg sets runtime session confs before the run —
  * e.g. spark.graft.cc.localEdgeCap=0 replays a pre-regime-split
  * shape for an A/B without checking out old code.
  */
object QueryStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val extraConfs = args.lift(2).toSeq.flatMap(_.split(",")).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceTeardownNoise()
    extraConfs.foreach { case (k, v) => spark.conf.set(k, v) }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shufRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shufWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      graft.queries.MarcOps.prewarmGateCaches(spark, sfDir)
      graft.queries.StoreOps.prewarmGateCaches(spark, sfDir)
    } catch { case _: Throwable => () }

    for (n <- names) {
      // settle listener events from the previous query (listenerBus is
      // private[spark]; a short drain sleep is enough for a tool)
      Thread.sleep(500)
      jobs = 0; stages = 0; tasks = 0L; shufRead = 0L; shufWrite = 0L
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"STATS $n%s wall=$dt%.3f jobs=$jobs stages=$stages tasks=$tasks " +
        f"shuffle_read_mb=${shufRead / 1048576.0}%.1f shuffle_write_mb=${shufWrite / 1048576.0}%.1f")
      System.gc()
    }
    spark.stop()
  }
}
