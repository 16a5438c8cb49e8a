package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/tmp/graft_scaled_x30")
    import graft.queries.MarcOps
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val raw = time("buildMarcBibs no-persist count") {
      MarcOps.buildMarcBibs(spark, dir).count()
    }
    println(s"rows=$raw")
    val bibs = MarcOps.marcBibs(spark, dir) // persists
    time("persist materialize count")(println(bibs.count()))
    time("q24 getters over cached")(println(MarcOps.q24MarcBuild(spark, dir).count()))
    time("q24 again")(println(MarcOps.q24MarcBuild(spark, dir).count()))
    spark.stop()
  }
}
