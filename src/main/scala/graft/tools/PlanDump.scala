package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print the executed plan of one catalog query.
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(s"== $name executed plan ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
