package graft.tools

import graft.queries.StoreOps
import org.apache.spark.sql.SparkSession

/** Phase-level timing for the store-lifecycle gate queries (q36/q62):
  * runs each query once against a warm session and prints per-query
  * wall time plus Spark job counts, so write-path overhead (job
  * launches, staging writes) is attributable rather than guessed at.
  *
  * Usage: sbt "runMain graft.tools.ProfileStore /root/testdata/sf0.1"
  */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // store tables are bucket-partitioned dirs (64 buckets > the
      // 32-path default): list them on the driver instead of paying a
      // Spark job per table read
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $label%-24s ${dt}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }

    // q62 phase breakdown: same lifecycle, explicit timers per commit
    {
      import graft.spark.{MarcRow, MarcSchema}
      import graft.store.MarcStore
      import org.apache.spark.sql.functions._
      import MarcSchema.marcRowEncoder
      val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2020-01-01T00:00:00Z"))
      val ts2 = java.sql.Timestamp.from(java.time.Instant.parse("2020-02-01T00:00:00Z"))
      val ts3 = java.sql.Timestamp.from(java.time.Instant.parse("2020-03-01T00:00:00Z"))
      val base = java.nio.file.Files.createTempDirectory("graft_prof62").toString
      val store = new MarcStore(spark, base, numBuckets = graft.queries.StoreOps.gateBuckets)
      val authDf = graft.queries.StoreOps.profAuthBatch(spark, dir)
      val bibDf = graft.queries.StoreOps.profBibBatch(spark, dir)
      val changed = graft.queries.StoreOps.profChangedAuth(spark, dir)
      time("q62.commit_auth") { store.commit(authDf.as[MarcRow], user = "alice", now = ts1) }
      time("q62.commit_bibs") { store.commit(bibDf.as[MarcRow], user = "bob", now = ts2) }
      time("q62.commit_changed") { store.commit(changed.as[MarcRow], user = "editor", now = ts3) }
      time("q62.final_read") {
        val counts = store.readHistory("bib").groupBy(col("_id").as("c_id"))
          .agg(count(lit(1)).as("n_versions"))
        store.read("bib").toDF().join(counts, col("_id") === col("c_id")).count()
      }
    }
    // q102 phase breakdown: the merge itself (two re-commit legs + a
    // guarded delete) is the battery's most expensive single call —
    // per-phase walls + job counts make the fixed cost attributable
    {
      import graft.spark.{MarcRow, MarcSchema}
      import graft.store.MarcStore
      import MarcSchema.marcRowEncoder
      val ts1 = java.sql.Timestamp.from(java.time.Instant.parse("2020-01-01T00:00:00Z"))
      val ts2 = java.sql.Timestamp.from(java.time.Instant.parse("2020-02-01T00:00:00Z"))
      val ts3 = java.sql.Timestamp.from(java.time.Instant.parse("2020-03-01T00:00:00Z"))
      val ts4 = java.sql.Timestamp.from(java.time.Instant.parse("2020-04-01T00:00:00Z"))
      val base = java.nio.file.Files.createTempDirectory("graft_prof102").toString
      val store = new MarcStore(spark, base, numBuckets = graft.queries.StoreOps.gateBuckets)
      time("q102.commit_auth") { store.commit(graft.queries.StoreOps.profAuthBatch(spark, dir).as[MarcRow], user = "alice", now = ts1) }
      time("q102.commit_bibs") { store.commit(graft.queries.StoreOps.profBibBatch(spark, dir).as[MarcRow], user = "bob", now = ts2) }
      time("q102.commit_changed") { store.commit(graft.queries.StoreOps.profChangedAuth(spark, dir).as[MarcRow], user = "editor", now = ts3) }
      time("q102.merge") { store.merge(gaining = 1000L, losing = 500L, user = "editor2", now = ts4) }
    }
    time("q62_cascade") { StoreOps.q62Cascade(spark, dir).count() }
    time("q36_store_commit") { StoreOps.q36StoreCommit(spark, dir).count() }
    time("q49_store_query") { StoreOps.q49StoreQuery(spark, dir).count() }
    time("q55_restore") { StoreOps.q55Restore(spark, dir).count() }
    time("q40_file_import") { StoreOps.q40FileImport(spark, dir).count() }
    time("q84_file_commit") { StoreOps.q84FileCommit(spark, dir).count() }
    spark.stop()
  }
}
