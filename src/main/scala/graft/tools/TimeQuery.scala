package graft.tools

import org.apache.spark.sql.SparkSession

/** Local iteration helper: time named SparkEntry queries against a
  * data dir (reps with median), without the full Bench battery.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <q1,q2,...> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply((reps - 1) / 2)
      println(f"TIME $n%s median=$med%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
