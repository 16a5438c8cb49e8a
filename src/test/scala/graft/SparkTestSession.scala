package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark suites. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // store tables are bucket-partitioned dirs (64 buckets > the
      // 32-path default): list them on the driver instead of paying a
      // Spark job per table read
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
