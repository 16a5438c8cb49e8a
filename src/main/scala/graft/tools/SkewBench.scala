package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew bench for the band-join dedup family.
  *
  * SCALING.md claims AQE skew handling covers boilerplate-heavy
  * corpora in the q19/q43/q61 band joins; this tool MEASURES it. It
  * materializes a corpus where ~30% of documents are byte-identical
  * boilerplate (the worst case for LSH banding: every boilerplate doc
  * lands in the SAME band bucket in every band, so the self-join has
  * one hot key carrying C(0.3N, 2) candidate pairs), runs the dedup
  * family, and records per-stage task-time balance from a
  * SparkListener.
  *
  * Gate: for every stage with >= 8 tasks and a median task time
  * >= 100 ms, max task time must be <= 10x the stage median — i.e.
  * AQE's skew split (or the operator's own design) actually spreads
  * the hot bucket. Writes BENCH_skew.json + SKEW.md (numbers, task
  * balance table, and the post-AQE q19 plan with its skew markers).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(4)
    val outDir = args.lift(2).getOrElse(s"/tmp/graft_skew_x$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~60-word fixed boilerplate: enough 3-shingles to exercise the
    // real minhash path, identical bytes for every boilerplate doc
    val boiler = (1 to 60).map(i => s"boilerplate${i % 7} legal${i % 5} footer${i % 3}")
      .mkString(" ")

    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      println(s"materializing skewed corpus (${factor}x, ~30% identical) at $outDir ...")
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      val span = docs.agg(max("doc_id")).head().getLong(0) + 1L
      val rep = (0 until factor).map(r =>
          docs.withColumn("doc_id", col("doc_id") + lit(r.toLong * span)))
        .reduce(_ unionByName _)
      rep.withColumn("text",
          when(pmod(col("doc_id"), lit(10)) < 3, lit(boiler)).otherwise(col("text")))
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      println("materialized.")
    }

    // per-stage task durations via listener
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null)
          stageTasks.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]()).add(te.taskInfo.duration)
    })

    // q122's skew exposure is identical-image classes (hash collapse
    // must keep the band join flat) — its images derive from doc_id,
    // so the replicated corpus exercises it regardless of the text
    // boilerplate injection
    // q142's exposure is the inverse shape: the 30% identical docs
    // collapse to ONE representative before the prefix join (exact-
    // first), but the intra-cluster expansion then emits C(0.3N, 2)
    // pairs from one hash key — the member self-join must spread
    val family = Seq("q16_dedup_exact", "q19_minhash_lsh", "q43_simhash",
      "q56_dedup_clusters", "q61_dedup_pipeline", "q114_fuzzy_decon",
      "q122_image_ahash_dedup", "q142_set_sim_join")
    val queries = graft.SparkEntry.queries

    spark.read.parquet(s"$outDir/documents.parquet").count() // warm footers

    case class StageBal(stageId: Int, tasks: Int, medianMs: Long, maxMs: Long) {
      def ratio: Double = maxMs.toDouble / math.max(medianMs, 1L)
    }
    val results = family.map { name =>
      stageTasks.clear()
      val t0 = System.nanoTime()
      val df = queries(name)(spark, outDir)
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      import scala.jdk.CollectionConverters._
      val balances = stageTasks.asScala.toSeq.map { case (sid, q) =>
        val ds = q.asScala.toSeq.sorted
        StageBal(sid, ds.size, if (ds.nonEmpty) ds(ds.size / 2) else 0L,
          if (ds.nonEmpty) ds.last else 0L)
      }
      // balance gate only on stages big enough for the ratio to mean
      // anything (>=8 tasks, median >=100 ms)
      val gated = balances.filter(b => b.tasks >= 8 && b.medianMs >= 100L)
      val worst = (gated.sortBy(-_.ratio).headOption, balances.sortBy(-_.maxMs).headOption)
      System.gc()
      (name, rows, secs, gated, worst, plan)
    }

    val md = new StringBuilder
    md.append(s"# Skew bench — band-join dedup family on an adversarial corpus\n\n")
    md.append(s"Corpus: `$srcDir` x$factor with ~30% of documents replaced by ONE\n")
    md.append("byte-identical boilerplate paragraph — every boilerplate doc shares\n")
    md.append("its band bucket in EVERY band, so each band self-join has a single\n")
    md.append("hot key carrying C(0.3N, 2) candidate pairs. Gate: for every stage\n")
    md.append("with >=8 tasks and median >=100 ms, max task <= 10x median (AQE\n")
    md.append("skew split must actually spread the hot bucket).\n\n")
    md.append("| query | rows | secs | gated stages | worst max/median | verdict |\n")
    md.append("|---|---|---|---|---|---|\n")
    var failures = List.empty[String]
    for ((name, rows, secs, gated, worst, _) <- results) {
      val worstRatio = gated.map(_.ratio).maxOption.getOrElse(0.0)
      val ok = worstRatio <= 10.0
      if (!ok) failures ::= f"$name worst task-balance ratio $worstRatio%.1f"
      val worstStr = worst._1.map(b =>
        f"${b.ratio}%.1fx (stage ${b.stageId}: ${b.tasks} tasks, med ${b.medianMs} ms, max ${b.maxMs} ms)")
        .getOrElse("no gated stage (all tasks < 100 ms median)")
      md.append(f"| $name | $rows | $secs%.1f | ${gated.size} | $worstStr | ${if (ok) "OK" else "FAIL"} |\n")
      println(f"SKEW $name%-22s rows=$rows%9d ${secs}%6.1f s  $worstStr ${if (ok) "OK" else "FAIL"}")
    }
    val q19plan = results.find(_._1 == "q19_minhash_lsh").map(_._6).getOrElse("?")
    md.append("\n## q19 post-AQE executed plan (skew markers)\n\n```\n")
    md.append(q19plan.linesIterator.take(80).mkString("\n"))
    md.append("\n```\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SKEW.md"), md.result())

    val qs = results.map { case (name, _, secs, _, _, _) => s"\"$name\":$secs" }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"skew ($srcDir x$factor, 30% identical)"${GitStamp.jsonField}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_skew.json"), json + "\n")
    println("wrote BENCH_skew.json and SKEW.md")
    require(failures.isEmpty, s"task-balance gate failed: ${failures.mkString("; ")}")
    spark.stop()
  }
}
