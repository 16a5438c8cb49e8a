package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-13 deliverable helper: write `.explain("formatted")` output
  * for named catalog queries to plans/<round>/<query>_<suffix>.txt.
  * The query is EXECUTED first (count action) so AQE's final plan —
  * the one the optimization claims are about — is what gets captured
  * alongside the formatted initial plan.
  *
  * Usage: runMain graft.tools.PlanSnap <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      df.count() // materialize so the executed (AQE-final) plan exists
      val executed = df.queryExecution.executedPlan.toString
      val body =
        s"""== $n — explain("formatted") (initial plan, $suffix) ==
           |$formatted
           |== $n — executed plan after run (AQE final) ==
           |$executed
           |""".stripMargin
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        body.getBytes("UTF-8"))
      println(s"PLANSNAP wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
