package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage walls for q183_real_vec_semdedup (round-9 verdict #2: the
  * battery read 5.81 s -> 8.57 s round-over-round and the verdict
  * asked for attribution). Times each semDedup stage on the FULL
  * 2000-vector realistic corpus and on the round-8 1000-vector subset
  * q183 used to gate, so corpus growth and plan regression separate
  * cleanly. Run fresh-JVM:
  *   runMain graft.tools.ProfileSemDedup [reps]
  * Emits one stamped JSON line (BENCH_profile_q183.json).
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n: Long) =
      graft.queries.RealVec.vecs(spark).where(col("vec_id") < n)
        .select(col("vec_id"), col("v"))

    def timeIt(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    def stage(name: String)(f: => Long): Unit = {
      val walls = (1 to reps).map(_ => timeIt(f))
      val best = walls.map(_._1).sorted.apply(1 min (walls.size - 1))
      out(name) = (best, walls.head._2)
      println(f"STAGE $name%-28s ${best}%7.3f s  rows=${walls.head._2}")
    }

    for (n <- Seq(1000L, 2000L)) {
      println(s"== corpus n=$n ==")
      val vecs = corpus(n).localCheckpoint(true)
      val tau = 0.30
      // full query wall (end-to-end, the gated shape)
      stage(s"n${n}_full_semdedup") {
        graft.queries.VectorOps.semDedup(
          vecs.withColumn("label", lit("x")).select(col("vec_id"), col("label"), col("v")), tau)
          .count()
      }
      // stages (each re-derives its prefix — attribution, not additivity)
      val st = graft.queries.VectorOps.semDedupStages(vecs, tau)
      stage(s"n${n}_assign_g")(st.g.count())
      stage(s"n${n}_banded_edges")(st.edges.count())
      stage(s"n${n}_cc") {
        graft.queries.TextOps.connectedComponents(
          st.edges.localCheckpoint(true)).count()
      }
      // candidate volume BEFORE verify: how many pairs does banding
      // admit at this weak tau (vs C(n,2) and vs true edges)?
      val g2 = st.g.localCheckpoint(true)
      stage(s"n${n}_band_candidates") {
        val bands = graft.queries.VectorOps.bandExplode(g2, tau, Seq("centroid_id"))
        bands.as("x").join(bands.as("y"),
            col("x.centroid_id") === col("y.centroid_id") &&
              col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id"), col("y.vec_id")).distinct().count()
      }
    }

    def j(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = "{\"metric\":\"profile_q183\",\"reps\":" + reps + ",\"stages\":{" +
      out.map { case (k, (w, r)) => s""""$k":{"wall":${j(w)},"rows":$r}""" }.mkString(",") +
      "}" + GitStamp.jsonField + "}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_profile_q183.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
