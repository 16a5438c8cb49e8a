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
    val dir = "/root/testdata/sf0.1"
    import graft.queries.VectorOps
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    time("all.count")(println(all.count()))
    val (members, reps) = VectorOps.repCollapse(all)
    time("reps.count")(println(reps.count()))
    time("members.count")(println(members.count()))
    val bands = VectorOps.bandExplode(reps, 0.30)
    time("bands.count")(println(bands.count()))
    time("bandCandidates(reps)")(println(VectorOps.bandCandidates(reps, 0.30).count()))
    time("q44 full")(println(VectorOps.q44EmbedNearDup(spark, dir).count()))
    time("q104 full")(println(VectorOps.q104SemDedup(spark, dir).count()))
    spark.stop()
  }
}
