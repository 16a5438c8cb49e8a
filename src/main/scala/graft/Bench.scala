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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed: let ContextCleaner drop dead checkpoint/broadcast
      // blocks so one query's residue doesn't skew the next
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
