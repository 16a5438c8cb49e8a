package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":...,"queries":{name:sec,...}}. A small untimed warmup
  * (trivial job + one scan of each input) separates JVM/codegen/IO
  * cold-start from per-query cost. */
object Bench {
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

    // warmup: JVM + whole-stage codegen + parquet footers
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings"))
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
    val passes: Seq[Map[String, Double]] = (1 to reps).map { p =>
      if (p > 1) {
        graft.queries.MarcOps.clearGateCaches()
        graft.queries.StoreOps.clearGateCaches()
      }
      battery.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // untimed: let ContextCleaner drop dead checkpoint/broadcast
        // blocks so one query's residue doesn't skew the next
        System.gc()
        name -> dt
      }.toMap
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val names = battery.map(_._1)
    val med = names.map(n => n -> median(passes.map(_(n))))
    val qs = med.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = names.map { n =>
      val xs = passes.map(_(n))
      s"\"$n\":{\"min\":${xs.min},\"max\":${xs.max}}"
    }.mkString("{", ",", "}")
    val total = if (med.nonEmpty) med.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
