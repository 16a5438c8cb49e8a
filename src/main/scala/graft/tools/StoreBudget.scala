package graft.tools

import graft.queries.StoreOps
import graft.spark.{MarcRow, MarcSchema}
import graft.store.MarcStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The shared FIXED-COST budget of the store-family walls (round-11
  * verdict #7): q36/q55/q62/q102 all move together with host speed
  * because each is a handful of commit lifecycles whose cost is
  * dominated by per-commit fixed work (plan compilation + job launch
  * + staging write), not data volume. This tool measures that budget
  * once per round so "qN regressed" questions are answered by a
  * committed profile instead of re-litigated:
  *
  *  - runs the exact gate lifecycles (q36's commit/update/delete +
  *    restore; q62's three commits + cascade; q102's merge) with
  *    MarcStore phase profiling on,
  *  - emits per-op wall/jobs plus the per-phase breakdown
  *    (stats_agg / auth_validate / changes_collect / staging_write /
  *    history_stage / write_live ... — nested phases appear under
  *    their own labels), aggregated by label,
  *  - derives `per_commit_fixed_s` = the cheapest plain commit's wall
  *    (everything above that on a store query is lifecycle count or
  *    genuine data cost).
  *
  * Usage: sbt "runMain graft.tools.StoreBudget [sfDir] [out.json]"
  * Writes BENCH_store_profile.json (GitStamp'd) by default.
  */
object StoreBudget {

  private val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2020-01-01T00:00:00Z"))
  private val ts2 = java.sql.Timestamp.from(java.time.Instant.parse("2020-02-01T00:00:00Z"))
  private val ts3 = java.sql.Timestamp.from(java.time.Instant.parse("2020-03-01T00:00:00Z"))
  private val ts4 = java.sql.Timestamp.from(java.time.Instant.parse("2020-04-01T00:00:00Z"))

  final case class Op(name: String, wall: Double, jobs: Int,
      phases: Seq[(String, Double, Int)])

  def main(args: Array[String]): Unit = {
    run(args)
    SparkSession.getActiveSession.foreach(_.stop())
  }

  /** RoundArtifacts entry point: leaves the shared session running.
    * Returns guard failures (empty = green). */
  def run(args: Array[String]): Seq[String] = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("BENCH_store_profile.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // store tables are bucket-partitioned dirs: list on the driver
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceTeardownNoise()
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
    import MarcSchema.marcRowEncoder

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    MarcStore.forceProfile = true
    // Phase attribution is EXACT (r12): the concurrent history staging
    // tags its jobs with MarcStore.historyJobGroup (so no phase counts
    // another's jobs) and history_stage's wall is the await remainder
    // beyond the bucket staging — phases partition the commit timeline,
    // so per-op phase walls sum to <= the op wall (guarded below).

    val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
    try {
    def op(name: String)(f: => Unit): Unit = {
      MarcStore.profileLog.clear()
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      val phases = scala.jdk.CollectionConverters
        .IteratorHasAsScala(MarcStore.profileLog.iterator()).asScala.toSeq
      ops += Op(name, wall, jobs.get() - j0, phases)
      println(f"STOREBUDGET $name%-20s $wall%7.2f s  jobs=${jobs.get() - j0}")
    }

    def tmp(prefix: String) =
      java.nio.file.Files.createTempDirectory(prefix).toString

    // ---- the q36/q55 lifecycle shapes on one store
    val s1 = new MarcStore(spark, tmp("budget36"), numBuckets = StoreOps.gateBuckets)
    op("commit_fresh") {
      s1.commit(StoreOps.batch(spark, sfDir, 97L, "").as[MarcRow], user = "alice", now = ts1)
    }
    op("commit_update") {
      s1.commit(StoreOps.batch(spark, sfDir, 194L, "X-").as[MarcRow], user = "bob", now = ts2)
    }
    op("delete_predicate") {
      s1.delete("bib", pmod(col("_id"), lit(388L)) === 0, user = "bob", now = ts3)
    }
    val restoreId = graft.queries.Tables.orders(spark, sfDir)
      .where(col("o_orderkey") % 388 === 0)
      .agg(min("o_orderkey")).head().getLong(0)
    op("restore") { s1.restore("bib", restoreId, user = "carol") }

    // ---- the q62/q102 cascade + merge shapes
    val s2 = new MarcStore(spark, tmp("budget62"), numBuckets = StoreOps.gateBuckets)
    op("q62_commit_auths") {
      s2.commit(StoreOps.profAuthBatch(spark, sfDir).as[MarcRow], user = "alice", now = ts1)
    }
    op("q62_commit_bibs") {
      s2.commit(StoreOps.profBibBatch(spark, sfDir).as[MarcRow], user = "bob", now = ts2)
    }
    op("q62_cascade_commit") {
      s2.commit(StoreOps.profChangedAuth(spark, sfDir).as[MarcRow], user = "editor", now = ts3)
    }
    op("q102_merge") { s2.merge(gaining = 1000L, losing = 500L, user = "editor2", now = ts4) }
    } finally {
      // never leave global profiling on for the rest of the JVM (the
      // RoundArtifacts chain runs the whole battery after this)
      MarcStore.forceProfile = false
      MarcStore.profileLog.clear()
    }

    // the cheapest plain commit = the per-commit fixed cost: the other
    // walls are (lifecycle count) x (this) + genuine data cost
    val plain = ops.filter(o => Set("commit_fresh", "commit_update", "q62_commit_auths")(o.name))
    val fixed = plain.map(_.wall).min

    def phaseJson(phases: Seq[(String, Double, Int)]): String = {
      val agg = phases.groupBy(_._1).toSeq.sortBy(-_._2.map(_._2).sum)
      agg.map { case (l, ps) =>
        f""""$l":{"wall":${ps.map(_._2).sum}%.3f,"jobs":${ps.map(_._3).sum}}"""
      }.mkString(",")
    }
    val opsJson = ops.map(o =>
      f""""${o.name}":{"wall":${o.wall}%.3f,"jobs":${o.jobs},"phases":{${phaseJson(o.phases)}}}""")
      .mkString(",")
    val json = f"""{"metric":"store_profile","sf":"$sfDir",""" +
      f""""per_commit_fixed_s":$fixed%.3f,"ops":{$opsJson}${GitStamp.jsonField}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(s"[storebudget] wrote $out (per_commit_fixed_s=$fixed)")
    val guards = scala.collection.mutable.ArrayBuffer.empty[String]
    // sanity guard: a fixed cost past 60 s means the budget itself is
    // broken (wrong SF dir, pathological host) — fail the regen loudly
    if (fixed > 60.0) guards += f"store_profile: per_commit_fixed_s=$fixed%.1f exceeds 60 s"
    // attribution guard (r12): phases partition the commit timeline,
    // so they must sum to <= the op wall at each nesting level —
    // touched_collect/staging_write/history_stage are write_live's
    // children, everything else is top-level. 5% slack for timer skew.
    val nested = Set("touched_collect", "staging_write", "history_stage")
    for (o <- ops) {
      val topSum = o.phases.filterNot(p => nested(p._1)).map(_._2).sum
      val inSum = o.phases.filter(p => nested(p._1)).map(_._2).sum
      val wl = o.phases.filter(_._1 == "write_live").map(_._2).sum
      if (topSum > o.wall * 1.05)
        guards += f"store_profile ${o.name}: top-level phases sum $topSum%.2f > wall ${o.wall}%.2f"
      if (inSum > wl * 1.05 + 0.05)
        guards += f"store_profile ${o.name}: write_live children sum $inSum%.2f > write_live $wl%.2f"
    }
    guards.toSeq
  }
}
